"""End-to-end orchestration test: ``trainer.main`` with an in-memory loader —
save-probe, loss.csv, chunked checkpoints with rotation, JSON state resume
(the reference's ``python training.py`` behavior, SURVEY.md §2.1)."""

import json
import os

import jax
import numpy as np
import pytest

from stable_diffusion_training_tpu.train import trainer
from stable_diffusion_training_tpu.utils.json_io import read_json_file


def make_config_dict(tmp_path, **overrides):
    cfg = {
        "model_path": "tiny",
        "test_save_path": str(tmp_path / "ckpt" / "test"),
        "batch_size": 8,
        "learning_rate": 1e-06,
        "unet_learning_rate": 1e-06,
        "text_encoder_learning_rate": 2.5e-07,
        "lr_scheduler": "constant",
        "adam_to_lion_scale_factor": 7.0,
        "compilation_cache_path": str(tmp_path / "jax_cache"),
        "keep_compiled_fn_in_cache": False,
        "text_encoder_context_window": 77,
        "context_window_concatenation_count": 3,
        "beta_scheduler": "zero_snr_scaled_linear",
        "prediction_type": "v_prediction",
        "aot_compile": True,
        "strip_bos_eos_token": True,
        "offset_noise_magnitude": 0.0,
        "min_snr_gamma_magnitude": 0.0,
        "perturbation_noise_magnitude": 0.0,
        "excluded_layer_pattern_from_weight_decay": ["bias", "scale", "embedding"],
        "excluded_layer_from_quantization": ["bias", "scale", "embedding"],
        "quantize_unet_state": True,
        "quantize_text_encoder_state": True,
        "accumulate_unet_ema": False,
        "accumulate_text_encoder_ema": False,
        "ema_rate": 0.0,
        "quant_block_size": 16,
        "image_area_root": [64],
        "minimum_axis_length": [64],
        "master_seed": 0,
        "chunk_number": 0,
        "chunk_limit": 2,
        "ramdisk_path": str(tmp_path / "ramdisk"),
        "repo": {},
        "token": None,
        "repeat_batch": 2,
        "numb_of_prefetched_batch": 1,
        "numb_of_dataloader_worker_thread": 2,
        "queue_get_timeout": 5,
        "DEBUG": False,
        "chunk_steps": 0,
        "keep_trained_model_buffer": 1,
        "loss_logging_interval": 2,
        "loss_csv": str(tmp_path / "loss.csv"),
        "model_family": "tiny",
        "mixed_precision": "float32",
    }
    cfg.update(overrides)
    return cfg


def _run_trainer(config_path):
    """trainer.main in a FRESH subprocess (see tests/trainer_child.py) —
    XLA:CPU segfaults loading/compiling executables late in a long-lived
    process, and these e2e tests assert only on on-disk artifacts."""
    import subprocess
    import sys

    child = os.path.join(os.path.dirname(__file__), "trainer_child.py")
    env = dict(os.environ)
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append("--xla_force_host_platform_device_count=8")
    env["XLA_FLAGS"] = " ".join(flags)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run([sys.executable, child, config_path], env=env)
    assert proc.returncode == 0, f"trainer child exited rc={proc.returncode}"


@pytest.mark.slow
def test_trainer_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    base = str(tmp_path / "ckpt" / "run")
    cfg = make_config_dict(tmp_path, model_path="tiny")
    # first checkpoint names derive from model_path@chunk; use a writable base
    cfg["model_path"] = base + "@0"
    config_path = str(tmp_path / "model_properties.json")
    with open(config_path, "w") as f:
        json.dump(cfg, f)

    # model_path doesn't exist as a checkpoint dir -> trainer would try to
    # load it; point load at the tiny family by pre-seeding model_family and
    # a non-dir model_path. load_models falls back to model_family.
    _run_trainer(config_path)

    # JSON state mutated for resume
    final = read_json_file(config_path)
    assert final["chunk_number"] == 2
    assert final["chunk_steps"] == 2
    assert final["master_seed"] == 1
    assert final["model_path"] == f"{base}@1"

    # backup written
    assert os.path.exists(str(tmp_path / "backup_model_properties.json"))

    # loss.csv written with reference header
    with open(cfg["loss_csv"]) as f:
        raw_lines = f.read().splitlines()
    assert raw_lines[0] == "steps, step_size, loss, time, chunk, seed"
    # reference quirk: rows are written newline-prefixed, so filter blanks
    rows = [l for l in raw_lines[1:] if l]
    assert rows
    loss_val = float(rows[0].split(",")[2])
    assert np.isfinite(loss_val)

    # rotation: chunk_steps=1 checkpoint kept; @0 deleted
    # (buffer=1 -> delete @{steps-1})
    assert os.path.isdir(f"{base}@1")
    assert not os.path.isdir(f"{base}@0")

    # save probe cleaned up
    assert not os.path.exists(cfg["test_save_path"])

    # checkpoint is a valid diffusers-format dir that loads back
    from stable_diffusion_training_tpu.train import load_models
    from stable_diffusion_training_tpu.train.config import (
        training_config_from_dict,
    )

    final["model_path"] = f"{base}@1"
    models = load_models(training_config_from_dict(final))
    assert models["unet"]["unet_params"]


def _chunk1_losses(loss_csv_path):
    """Loss values from loss.csv rows whose chunk column is 1."""
    with open(loss_csv_path) as f:
        rows = [l for l in f.read().splitlines()[1:] if l]
    return [float(r.split(",")[2]) for r in rows if int(r.split(",")[4]) == 1]


@pytest.mark.slow
def test_trainer_full_state_resume_matches_uninterrupted(tmp_path, monkeypatch):
    """Kill-and-restart parity: a run interrupted after chunk 0 and resumed in
    a fresh ``main()`` invocation (fresh process state, optimizer/EMA/RNG
    restored from the checkpoint's ``train_state`` subfolder) produces
    bit-identical chunk-1 losses and final weights to an uninterrupted
    2-chunk run — the recovery gap the reference left open
    (``/root/reference/training.py:301-315``, SURVEY.md §5.4)."""
    monkeypatch.chdir(tmp_path)
    cache = str(tmp_path / "jax_cache_shared")

    def _cfg(tag, **overrides):
        base = str(tmp_path / tag / "run")
        cfg = make_config_dict(
            tmp_path,
            model_path=base + "@0",
            test_save_path=str(tmp_path / tag / "probe"),
            loss_csv=str(tmp_path / f"loss_{tag}.csv"),
            compilation_cache_path=cache,
            keep_compiled_fn_in_cache=True,
            accumulate_unet_ema=True,
            accumulate_text_encoder_ema=True,
            ema_rate=0.999,
            keep_trained_model_buffer=5,  # keep @0 around for inspection
            **overrides,
        )
        path = str(tmp_path / f"props_{tag}.json")
        with open(path, "w") as f:
            json.dump(cfg, f)
        return base, path

    # run A: uninterrupted, both chunks in one process lifetime
    base_a, path_a = _cfg("a", chunk_limit=2)
    _run_trainer(path_a)

    # run B: "killed" after chunk 0 (main returns), then resumed by a second
    # invocation that reloads params from the chunk checkpoint and restores
    # the full training state
    base_b, path_b = _cfg("b", chunk_limit=1)
    _run_trainer(path_b)
    assert os.path.isdir(f"{base_b}@0/{trainer.TRAIN_STATE_SUBDIR}")
    _run_trainer(path_b)

    # chunk-1 losses logged by B's resumed run match A's second chunk exactly
    losses_a = _chunk1_losses(str(tmp_path / "loss_a.csv"))
    losses_b = _chunk1_losses(str(tmp_path / "loss_b.csv"))
    assert losses_a and losses_a == losses_b

    # final checkpoints are bit-identical (params + EMA)
    from stable_diffusion_training_tpu.models import hf_io

    for sub in ("", "-EMA"):
        pa = hf_io.load_unet_params(f"{base_a}{sub}@1/unet", None)
        pb = hf_io.load_unet_params(f"{base_b}{sub}@1/unet", None)
        flat_a = jax.tree_util.tree_leaves(pa)
        flat_b = jax.tree_util.tree_leaves(pb)
        assert len(flat_a) == len(flat_b)
        for xa, xb in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_metrics_writer_tensorboard(tmp_path):
    """Opt-in TensorBoard scalars (the reference shipped tb deps but never
    wrote summaries, SURVEY.md §5.5)."""
    from stable_diffusion_training_tpu.utils.metrics import MetricsWriter

    inactive = MetricsWriter(None)
    assert not inactive.active
    inactive.scalar("x", 1.0, 0)  # no-op, no import

    w = MetricsWriter(str(tmp_path / "tb"))
    assert w.active
    w.scalar("train/loss", 0.5, 1)
    w.flush()
    w.close()
    files = list((tmp_path / "tb").glob("events.out.tfevents.*"))
    assert files and files[0].stat().st_size > 0


@pytest.mark.slow
def test_trainer_eval_sampling(tmp_path, monkeypatch):
    """Opt-in in-loop DDIM eval sampling (BASELINE config 2: "DDIM eval
    sampling every N steps"): PNGs appear under eval_sample_dir at the
    configured interval, without perturbing the training state flow."""
    monkeypatch.chdir(tmp_path)
    base = str(tmp_path / "ckpt" / "run")
    eval_dir = str(tmp_path / "eval_samples")
    prompt_ids = np.zeros((1, 77), np.int32)
    prompt_ids[0, :5] = [3, 17, 42, 7, 2]
    cfg = make_config_dict(
        tmp_path,
        model_path=base + "@0",
        chunk_limit=1,
        eval_sample_interval=2,
        eval_sample_prompt_ids=prompt_ids.tolist(),
        eval_num_inference_steps=2,
        eval_sample_resolution=64,
        eval_sample_dir=eval_dir,
    )
    config_path = str(tmp_path / "model_properties.json")
    with open(config_path, "w") as f:
        json.dump(cfg, f)

    _run_trainer(config_path)

    step_dirs = sorted(os.listdir(eval_dir))
    assert step_dirs, "no eval sample directories written"
    pngs = os.listdir(os.path.join(eval_dir, step_dirs[0]))
    assert any(p.endswith(".png") for p in pngs)
    from PIL import Image

    im = Image.open(os.path.join(eval_dir, step_dirs[0], pngs[0]))
    assert im.size == (64, 64)


class TestPrefetchToDevice:
    """Depth-k H2D prefetch stream semantics (VERDICT round-2 weak #6):
    None (queue-timeout) entries pass through without stalling the batches
    already in flight; at most `total` grabs; end_of_batch terminates."""

    class _FakeLoader:
        def __init__(self, items):
            self.items = list(items)
            self.grabs = 0

        def grab_next_batch(self):
            self.grabs += 1
            return self.items.pop(0) if self.items else "end_of_batch"

    @staticmethod
    def _batch():
        return {
            "pixel_values": np.zeros((8, 3, 8, 8), np.float32),
            "input_ids": np.zeros((24, 77), np.int32),
            "attention_mask": np.ones((24, 77), np.int32),
        }

    def _run(self, items, total, depth):
        from stable_diffusion_training_tpu.core import mesh as mesh_lib
        from stable_diffusion_training_tpu.train.trainer import (
            _prefetch_to_device,
        )

        loader = self._FakeLoader(items)
        mesh = mesh_lib.get_default_mesh()
        out = list(_prefetch_to_device(loader, total, 77, mesh, depth=depth))
        return loader, out

    def test_depth2_passes_none_through_in_order(self):
        items = [self._batch(), None, self._batch(), self._batch(),
                 "end_of_batch"]
        loader, out = self._run(items, total=5, depth=2)
        kinds = [
            "batch" if isinstance(o, dict) else ("none" if o is None else o)
            for o in out
        ]
        assert kinds == ["batch", "none", "batch", "batch", "end_of_batch"]
        assert loader.grabs == 5

    def test_never_grabs_past_total(self):
        items = [self._batch()] * 10
        loader, out = self._run(items, total=3, depth=4)
        assert len(out) == 3
        assert loader.grabs == 3

    def test_stops_after_end_of_batch(self):
        items = [self._batch(), "end_of_batch"]
        loader, out = self._run(items, total=10, depth=3)
        assert len(out) == 2
        assert out[-1] == "end_of_batch"
        assert loader.grabs == 2

    def test_batches_are_reshaped_and_on_device(self):
        _, out = self._run([self._batch(), "end_of_batch"], total=2, depth=1)
        b = out[0]
        assert b["input_ids"].shape == (24, 77)
        assert hasattr(b["pixel_values"], "sharding")
