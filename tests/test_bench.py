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
    monkeypatch.setenv("BENCH_SUBPROC", "0")  # keep the monkeypatch visible
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
    monkeypatch.setenv("BENCH_SUBPROC", "0")
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
    monkeypatch.setenv("BENCH_SUBPROC", "0")
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


# --- child-process leg machinery (added after the 2026-08-19 capture: one
# oversized SDXL compile crashed the relay helper and poisoned every later
# in-process attempt, so each attempt now gets its own process) ---


class _FakeProc:
    def __init__(self, stdout, returncode=0):
        self.stdout, self.returncode = stdout, returncode


def test_leg_in_child_parses_result_and_reemits_noise(monkeypatch, capsys):
    import subprocess

    monkeypatch.setattr(
        subprocess, "run",
        lambda *a, **k: _FakeProc(
            "# compile cache unavailable: OSError\n"
            "LEG_TPU_INIT_OK\n"
            'LEG_RESULT {"images_per_sec_per_chip": 3.5}\n'
        ),
    )
    result, err, init_ok = bench._leg_in_child({"kind": "leg"}, 60)
    assert result == {"images_per_sec_per_chip": 3.5}
    assert err is None and init_ok
    # non-protocol child stdout is re-emitted on stderr, not swallowed
    assert "compile cache unavailable" in capsys.readouterr().err


def test_leg_in_child_reports_crash_after_init(monkeypatch):
    import subprocess

    monkeypatch.setattr(
        subprocess, "run",
        lambda *a, **k: _FakeProc("LEG_TPU_INIT_OK\n", returncode=1),
    )
    result, err, init_ok = bench._leg_in_child({}, 60)
    assert result is None and init_ok and "exit 1" in err


def test_attempt_leg_falls_back_inproc_only_before_tpu_init(monkeypatch):
    # child died before claiming the chip -> in-process retry + latch (the
    # platform serializes chip claims, so later children would wedge)
    monkeypatch.setattr(bench, "_FORCE_INPROC", False)
    monkeypatch.setattr(
        bench, "_leg_in_child", lambda spec, t: (None, "child exit 1", False)
    )
    monkeypatch.setattr(bench, "run_leg", lambda **kw: {"ok": True})
    assert bench._attempt_leg({"family": "sd15"}, 60, "t") == {"ok": True}
    assert bench._FORCE_INPROC is True
    monkeypatch.setattr(bench, "_FORCE_INPROC", False)

    # child claimed the chip then crashed -> genuine leg failure, raise so
    # the caller's batch ladder moves on (NO in-process retry of a compile
    # that just killed the helper)
    monkeypatch.setattr(
        bench, "_leg_in_child", lambda spec, t: (None, "child exit 1", True)
    )
    with pytest.raises(RuntimeError):
        bench._attempt_leg({"family": "sd15"}, 60, "t")
    assert bench._FORCE_INPROC is False


def test_attempt_leg_timeout_never_retries_inproc(monkeypatch):
    monkeypatch.setattr(bench, "_FORCE_INPROC", False)
    monkeypatch.setattr(
        bench, "_leg_in_child",
        lambda spec, t: (None, "timeout after 60s", False),
    )
    monkeypatch.setattr(
        bench, "run_leg",
        lambda **kw: pytest.fail("in-process retry after timeout"),
    )
    with pytest.raises(RuntimeError):
        bench._attempt_leg({"family": "sd15"}, 60, "t")


def test_run_extra_leg_deadline_caps_attempt_timeout(monkeypatch):
    seen = []
    monkeypatch.setenv("BENCH_MIN_LEG_S", "100")
    monkeypatch.setenv("BENCH_ATTEMPT_TIMEOUT_S", "1800")

    def fake_attempt(spec, timeout_s, label):
        seen.append(timeout_s)
        raise RuntimeError("fail to walk the ladder")

    monkeypatch.setattr(bench, "_attempt_leg", fake_attempt)
    monkeypatch.setitem(
        bench.EXTRA_LEGS, "t",
        dict(family="sd15", res=512, batches=(4, 2)),
    )
    import time as _time

    bench.run_extra_leg("t", steps=2, deadline=_time.monotonic() + 500)
    assert len(seen) == 2
    # remaining budget (~500s) caps the 1800s attempt cap; the 100s floor
    # keeps a late attempt from being spawned with a useless tiny timeout
    assert 300 <= seen[0] <= 500
    assert all(100 <= t <= 500 for t in seen)


def test_one_leg_argv_dispatch_parses_spec(monkeypatch):
    # _one_leg_main claims the device before dispatch; stub the jax bits so
    # this stays a pure protocol test
    ran = {}
    monkeypatch.setattr(bench, "_init_compile_cache", lambda: None)
    monkeypatch.setattr(
        bench, "_run_leg_raw", lambda spec: ran.setdefault("spec", spec)
        or {"images_per_sec_per_chip": 1.0},
    )
    import json as _json

    bench._one_leg_main(_json.dumps({"family": "sd15", "batch": 2}))
    assert ran["spec"] == {"family": "sd15", "batch": 2}


def test_compiler_options_from_env(monkeypatch):
    # unset -> None (compile() must see compiler_options=None, not {})
    monkeypatch.delenv("BENCH_COMPILER_OPTIONS", raising=False)
    assert bench._compiler_options_from_env() is None
    # values stringified: PJRT env overrides are string->string
    monkeypatch.setenv(
        "BENCH_COMPILER_OPTIONS",
        '{"xla_tpu_scoped_vmem_limit_kib": 32768}',
    )
    assert bench._compiler_options_from_env() == {
        "xla_tpu_scoped_vmem_limit_kib": "32768"
    }
    # non-object JSON is a config error, not a silent no-op
    monkeypatch.setenv("BENCH_COMPILER_OPTIONS", '["not", "a", "dict"]')
    with pytest.raises(ValueError):
        bench._compiler_options_from_env()
