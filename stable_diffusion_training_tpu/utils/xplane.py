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

import re
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


_OPCODE_RE = re.compile(r" = (?:\([^=]*?\) )?([a-z][a-z0-9-]*)\(")


def opcode_of(name: str) -> str:
    """Extract the HLO opcode from '%id = [tuple-shape ]opcode(operands)'.

    Single-output instructions put the (un-parenthesized) shape between
    '=' and the opcode, which this regex can't bridge — those return '?'
    and are categorized by their op-name family instead."""
    m = _OPCODE_RE.search(name)
    return m.group(1) if m else "?"


def family_of(name: str) -> str:
    """Op-name family: the HLO id with trailing .N / digits stripped."""
    opid = name.split(" = ", 1)[0].lstrip("%")
    return re.sub(r"[.\d]+$", "", opid)


def categorize(name: str) -> str:
    """Bucket a full HLO instruction string into a coarse perf category.

    Single-output instructions put an un-parenthesized shape between '='
    and the opcode, which ``opcode_of`` can't bridge — for those, fall
    back to the op-name FAMILY (HLO names derive from the opcode or the
    producing op): e.g. ``%copy.104 = bf16[...] copy(...)`` has opcode
    '?' but family 'copy'."""
    opid = name.split(" = ", 1)[0].lstrip("%")
    op = opcode_of(name)
    if op == "?":
        fam = family_of(name)
        if fam in ("copy", "copy-start", "copy-done", "transpose",
                   "bitcast"):
            op = fam
        elif fam.endswith("fusion") or fam == "fusion":
            op = "fusion"
        elif fam.startswith("convolution") or fam.startswith("conv"):
            op = "convolution"
        elif "attn" in fam or "flash" in fam:
            op = "custom-call"
        elif fam in ("all-reduce", "all-gather", "reduce-scatter",
                     "collective-permute", "all-to-all"):
            op = fam
    if op in ("copy", "copy-start", "copy-done", "transpose", "bitcast"):
        return "copy/relayout"
    if op == "custom-call":
        if "lion" in name.lower() or "s8[" in name:
            return "lion custom-call"
        if "attn" in opid or "flash" in name.lower():
            return "flash custom-call"
        return "other custom-call"
    if op == "convolution" or opid.startswith("convolution"):
        return "convolution"
    if op == "fusion":
        return "fusion"
    if op in ("all-reduce", "all-gather", "reduce-scatter",
              "collective-permute", "all-to-all"):
        return "collective"
    return "other"


def category_report(xspace_path: str, steps: int, wall_ms: float = None,
                    top_families: int = 3) -> str:
    """Render the per-category serialized-time table for a traced run.

    ``steps`` = how many identical steps the trace window covered. A
    ``while`` op's self time includes its body (also counted individually),
    so loopy programs can report a serialized total above wall time —
    compare category deltas there, not the grand total."""
    with open(xspace_path, "rb") as f:
        data = f.read()
    lines_out = []
    for line_name, label in (("XLA Ops", "serialized (XLA Ops line)"),
                             ("Async XLA Ops", "async occupancy (overlaps)")):
        totals = op_durations(data, "/device:TPU", line_name)
        if not totals:
            lines_out.append(f"[{label}] no events")
            continue
        cats: Dict[str, Tuple[float, int]] = {}
        for name, (ps, n) in totals.items():
            c = categorize(name)
            t, cnt = cats.get(c, (0.0, 0))
            cats[c] = (t + ps, cnt + n)
        grand = sum(t for t, _ in cats.values()) / 1e9 / steps
        wall = f" (wall {wall_ms:.1f} ms/step)" if wall_ms else ""
        lines_out.append(f"\n[{label}] total {grand:.1f} ms/step{wall}:")
        for c, (ps, n) in sorted(cats.items(), key=lambda kv: -kv[1][0]):
            ms = ps / 1e9 / steps
            lines_out.append(
                f"  {ms:8.1f} ms/step  {100 * ms / max(grand, 1e-9):5.1f}%  "
                f"x{n // steps:<6d} {c}"
            )
        for big, _ in sorted(cats.items(), key=lambda kv: -kv[1][0])[:top_families]:
            fams: Dict[str, Tuple[float, int]] = {}
            sample: Dict[str, Tuple[str, float]] = {}
            for nm, (ps, n) in totals.items():
                if categorize(nm) != big:
                    continue
                f2 = family_of(nm)
                t, cnt = fams.get(f2, (0.0, 0))
                fams[f2] = (t + ps, cnt + n)
                if f2 not in sample or ps > sample[f2][1]:
                    sample[f2] = (nm, ps)
            lines_out.append(f"  top families in '{big}':")
            for f2, (ps, n) in sorted(fams.items(), key=lambda kv: -kv[1][0])[:6]:
                nm = sample[f2][0]
                short = nm if len(nm) <= 120 else nm[:117] + "..."
                lines_out.append(
                    f"    {ps/1e9/steps:8.2f} ms/step x{n//steps:<6d} {f2}"
                    f"  e.g. {short}"
                )
    return "\n".join(lines_out)
