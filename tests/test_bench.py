"""Unit tests for bench.py's config-leg ladder machinery (no TPU needed:
``run_leg`` is monkeypatched; only the pure dispatch logic is exercised).

The ladder entries mirror the BASELINE config recipes
(/root/reference/training.py has no benchmark harness — BASELINE.md defines
the five configs); config-3's head entry carries the FF-remat override that
won the 768² remat ladder (PERF_NOTES round 4).
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench  # noqa: E402


def _fake_run_leg(calls, fail_batches=()):
    def run_leg(family, batch, res, steps, reference_style, **kw):
        calls.append((family, batch, res, kw))
        if batch in fail_batches:
            raise RuntimeError("simulated compile failure")
        return {
            "images_per_sec_per_chip": 10.0 / batch,
            "p50_step_time_s": 0.1 * batch,
            "mfu": 0.4,
        }
    return run_leg


def test_extra_leg_tuple_entry_passes_overrides(monkeypatch):
    calls = []
    monkeypatch.setattr(bench, "run_leg", _fake_run_leg(calls))
    monkeypatch.setitem(
        bench.EXTRA_LEGS, "t",
        dict(family="sd21", res=768,
             batches=((8, dict(ff_remat=True)), 6)),
    )
    rec = bench.run_extra_leg("t", steps=2)
    assert len(calls) == 1
    fam, b, res, kw = calls[0]
    assert (fam, b, res) == ("sd21", 8, 768)
    assert kw.get("ff_remat") is True
    assert rec["batch_size"] == 8
    assert rec["value"] == pytest.approx(10.0 / 8)
    # truthy overrides ride along in the record so the artifact says
    # which variant produced the number
    assert rec.get("ff_remat") is True


def test_extra_leg_falls_back_past_failed_head(monkeypatch, capsys):
    calls = []
    monkeypatch.setattr(
        bench, "run_leg", _fake_run_leg(calls, fail_batches=(8,))
    )
    monkeypatch.setitem(
        bench.EXTRA_LEGS, "t",
        dict(family="sd21", res=768,
             batches=((8, dict(ff_remat=True)), 6)),
    )
    rec = bench.run_extra_leg("t", steps=2)
    assert [c[1] for c in calls] == [8, 6]
    # fallback entry is the plain (non-remat) leg
    assert calls[1][3].get("ff_remat") is None
    assert rec["batch_size"] == 6
    assert "ff_remat" not in rec
    assert "failed at batch 8" in capsys.readouterr().out


def test_extra_leg_exhausted_ladder_reports_null(monkeypatch):
    monkeypatch.setattr(
        bench, "run_leg", _fake_run_leg([], fail_batches=(4, 2))
    )
    monkeypatch.setitem(
        bench.EXTRA_LEGS, "t",
        dict(family="sd15", res=512, batches=(4, 2)),
    )
    rec = bench.run_extra_leg("t", steps=2)
    assert rec["value"] is None
    assert rec["error"] == "no batch size fit"


def test_config3_default_ladder_head_is_ff_remat_b8():
    head = bench.EXTRA_LEGS["3"]["batches"][0]
    assert head[0] == 8 and head[1] == {"ff_remat": True}
