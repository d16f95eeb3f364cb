"""Round-trip test for the dependency-free xplane trace reader: build an
XSpace protobuf by hand (tb_events' wire-format encoders), decode with
utils.xplane, check op aggregation."""

import numpy as np

from stable_diffusion_training_tpu.utils.tb_events import _int64, _ld
from stable_diffusion_training_tpu.utils import xplane


def _event(meta_id, offset_ps, dur_ps):
    return _int64(1, meta_id) + _int64(2, offset_ps) + _int64(3, dur_ps)


def _event_metadata(meta_id, name):
    return _int64(1, meta_id) + _ld(2, name.encode())


def _map_entry(key, value_bytes):
    return _int64(1, key) + _ld(2, value_bytes)


def _line(name, events):
    out = _ld(2, name.encode())
    for e in events:
        out += _ld(4, e)
    return out


def _plane(name, lines, metas):
    out = _ld(2, name.encode())
    for ln in lines:
        out += _ld(3, ln)
    for mid, mname in metas:
        out += _ld(4, _map_entry(mid, _event_metadata(mid, mname)))
    return out


def _xspace(planes):
    return b"".join(_ld(1, p) for p in planes)


def test_top_ops_aggregates_by_name(tmp_path):
    metas = [(1, "fusion.123"), (2, "convolution.7"), (3, "all-reduce.1")]
    ops_line = _line(
        "XLA Ops",
        [
            _event(1, 0, 5_000_000),     # 5 us
            _event(1, 10, 7_000_000),    # same op again
            _event(2, 20, 30_000_000),   # 30 us
            _event(3, 50, 1_000_000),
        ],
    )
    steps_line = _line("Steps", [_event(2, 0, 99_000_000_000)])  # ignored
    plane = _plane("/device:TPU:0", [ops_line, steps_line], metas)
    host_plane = _plane("/host:CPU", [ops_line], metas)  # ignored
    path = tmp_path / "t.xplane.pb"
    path.write_bytes(_xspace([plane, host_plane]))

    top = xplane.top_ops(str(path), k=2)
    assert top[0][0] == "convolution.7"
    np.testing.assert_allclose(top[0][1], 0.030)  # ms
    assert top[0][2] == 1
    assert top[1][0] == "fusion.123"
    np.testing.assert_allclose(top[1][1], 0.012)
    assert top[1][2] == 2


def test_empty_line_filter_matches_all(tmp_path):
    metas = [(1, "op_a")]
    plane = _plane(
        "/device:TPU:0", [_line("Whatever", [_event(1, 0, 2_000_000)])], metas
    )
    path = tmp_path / "t.xplane.pb"
    path.write_bytes(_xspace([plane]))
    assert xplane.top_ops(str(path), line_substring="") == [
        ("op_a", 0.002, 1)
    ]
    # the default filter (exact match) excludes the non-matching line name
    assert xplane.top_ops(str(path)) == []
    # exact matching: a line named "Async XLA Ops" must NOT match "XLA Ops"


def test_exact_line_match_excludes_async_variant(tmp_path):
    metas = [(1, "op_a")]
    plane = _plane(
        "/device:TPU:0",
        [
            _line("XLA Ops", [_event(1, 0, 2_000_000)]),
            _line("Async XLA Ops", [_event(1, 0, 50_000_000)]),
        ],
        metas,
    )
    path = tmp_path / "t.xplane.pb"
    path.write_bytes(_xspace([plane]))
    assert xplane.top_ops(str(path)) == [("op_a", 0.002, 1)]


def test_opcode_family_categorize():
    full = ("%copy.104 = bf16[16,4096]{1,0:T(8,128)} "
            "copy(bf16[16,4096]{0,1} %reshape.3)")
    assert xplane.opcode_of(full) == "?"  # un-parenthesized shape: by family
    assert xplane.family_of(full) == "copy"
    assert xplane.categorize(full) == "copy/relayout"

    tup = ("%attn1.28 = (bf16[120,4096,40]{2,1,0}, bf16[120,4096,40]{2,1,0}) "
           "custom-call(bf16[120,4096,40]{2,1,0} %bitcast.1)")
    assert xplane.opcode_of(tup) == "custom-call"
    assert xplane.categorize(tup) == "flash custom-call"

    lion = ("%custom-call.9 = (bf16[230400,128]{1,0}, s8[230400,128]{1,0}) "
            "custom-call(bf16[230400,128]{1,0} %p0)")
    assert xplane.categorize(lion) == "lion custom-call"

    fus = ("%multiply_reduce_fusion.3 = (bf16[]{:T(256)}, bf16[3,3,640,640]"
           "{3,2,1,0}) fusion(bf16[6,96,96,640]{3,0,2,1} %custom-call.2)")
    # operand text contains 'custom-call' but the OPCODE is fusion
    assert xplane.opcode_of(fus) == "fusion"
    assert xplane.categorize(fus) == "fusion"


def test_category_report_renders(tmp_path):
    metas = [
        (1, "%fusion.1 = (f32[8,32]{1,0}) fusion(f32[8,32]{1,0} %p0)"),
        (2, "%attn1.2 = (bf16[8,64,40]{2,1,0}) custom-call(bf16[8,64,40] %x)"),
    ]
    ops_line = _line("XLA Ops", [_event(1, 0, 6_000_000),
                                 _event(2, 10, 3_000_000)])
    plane = _plane("/device:TPU:0", [ops_line], metas)
    path = tmp_path / "r.xplane.pb"
    path.write_bytes(_xspace([plane]))
    report = xplane.category_report(str(path), steps=3, wall_ms=12.5)
    assert "serialized (XLA Ops line)" in report
    assert "fusion" in report and "flash custom-call" in report
    assert "wall 12.5 ms/step" in report
