"""Dependency-free reader for xprof ``*.xplane.pb`` traces.

``jax.profiler.trace`` writes XSpace protobufs, but this image has neither
tensorboard nor the tensorflow profiler plugin to open them — so this is a
minimal protobuf wire-format decoder for exactly the fields the perf loop
needs: per-op self times from a device plane's "XLA Ops" line. Used by
``benchmarks/trace_top_ops.py`` to publish the top time sinks of a train
step (PERF_NOTES.md); the reference has no profiling story at all
(SURVEY.md §5.1).

Schema (tsl/profiler/protobuf/xplane.proto, field numbers in comments):

- XSpace.planes = 1 (repeated XPlane)
- XPlane: id=1, name=2, lines=3 (XLine), event_metadata=4
  (map<int64, XEventMetadata>), stat_metadata=5, stats=6
- XLine: id=1, name=2, timestamp_ns=3, events=4 (XEvent)
- XEvent: metadata_id=1, offset_ps=2, duration_ps=3, stats=4
- XEventMetadata: id=1, name=2, display_name=4
- map entries: key=1, value=2
"""

from typing import Dict, Iterator, List, Tuple


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a message's wire bytes.

    Length-delimited values are returned as bytes; varints as int; fixed
    32/64-bit as raw little-endian bytes (nothing here needs them decoded).
    """
    pos = 0
    end = len(buf)
    while pos < end:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 0x7
        if wire == 0:
            value, pos = _read_varint(buf, pos)
        elif wire == 1:
            value, pos = buf[pos : pos + 8], pos + 8
        elif wire == 2:
            length, pos = _read_varint(buf, pos)
            value, pos = buf[pos : pos + length], pos + length
        elif wire == 5:
            value, pos = buf[pos : pos + 4], pos + 4
        else:  # groups (3/4) don't occur in xplane
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, value


def _event_metadata_names(plane: bytes) -> Dict[int, str]:
    names: Dict[int, str] = {}
    for field, _, value in _fields(plane):
        if field != 4:  # event_metadata map entry
            continue
        key_id = None
        meta_name = None
        for f2, _, v2 in _fields(value):
            if f2 == 1:
                key_id = v2
            elif f2 == 2:
                for f3, _, v3 in _fields(v2):
                    if f3 == 2:  # XEventMetadata.name
                        meta_name = v3.decode("utf-8", "replace")
        if key_id is not None and meta_name is not None:
            names[key_id] = meta_name
    return names


def _plane_name(plane: bytes) -> str:
    for field, _, value in _fields(plane):
        if field == 2:
            return value.decode("utf-8", "replace")
    return ""


def _line_name(line: bytes) -> str:
    for field, _, value in _fields(line):
        if field == 2:
            return value.decode("utf-8", "replace")
    return ""


def planes(xspace: bytes) -> List[Tuple[str, bytes]]:
    """(name, raw_bytes) of every XPlane in an XSpace."""
    return [
        (_plane_name(value), value)
        for field, _, value in _fields(xspace)
        if field == 1
    ]


def op_durations(
    xspace: bytes,
    plane_substring: str = "/device:TPU",
    line_substring: str = "XLA Ops",
) -> Dict[str, Tuple[float, int]]:
    """Aggregate event durations by op name.

    Returns ``{op_name: (total_duration_ps, occurrences)}`` summed over all
    matching planes/lines. The line filter is an EXACT name match ("" =
    every line): substring matching would silently merge "XLA Ops" with
    "Async XLA Ops", whose event durations are overlap occupancy, not
    serialized device time — mixing them misattributes async weight
    prefetches as the top sink (observed on the first round-3 trace)."""
    totals: Dict[str, Tuple[float, int]] = {}
    for name, plane in planes(xspace):
        if plane_substring not in name:
            continue
        meta = _event_metadata_names(plane)
        for field, _, line in _fields(plane):
            if field != 3:
                continue
            if line_substring and line_substring != _line_name(line):
                continue
            for f2, _, event in _fields(line):
                if f2 != 4:
                    continue
                mid = 0
                dur = 0
                for f3, _, v3 in _fields(event):
                    if f3 == 1:
                        mid = v3
                    elif f3 == 3:
                        dur = v3
                op = meta.get(mid, f"<metadata {mid}>")
                t, n = totals.get(op, (0.0, 0))
                totals[op] = (t + dur, n + 1)
    return totals


def top_ops(
    xspace_path: str,
    k: int = 10,
    plane_substring: str = "/device:TPU",
    line_substring: str = "XLA Ops",
) -> List[Tuple[str, float, int]]:
    """Top-k ops by total self time: ``[(name, total_ms, count), ...]``."""
    with open(xspace_path, "rb") as f:
        data = f.read()
    totals = op_durations(data, plane_substring, line_substring)
    ranked = sorted(totals.items(), key=lambda kv: -kv[1][0])
    return [(name, t / 1e9, n) for name, (t, n) in ranked[:k]]
