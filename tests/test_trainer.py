"""End-to-end orchestration test: ``trainer.main`` with an in-memory loader —
save-probe, loss.csv, chunked checkpoints with rotation, JSON state resume
(the reference's ``python training.py`` behavior, SURVEY.md §2.1)."""

import json
import os

import numpy as np
import pytest

from stable_diffusion_training_tpu.data import InMemoryDataLoader
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
    loader = InMemoryDataLoader.synthetic(
        4, 8, [(64, 64)], concat_count=3, vocab_size=1000, seed=0
    )

    trainer.main(config_dict_path=config_path, dataloader=loader, tokenizer=None)

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
