"""Checkpointing: diffusers-format export + Orbax full-state save/resume.

``save_model`` reproduces ``/root/reference/training_utils.py:986-1025``: a
diffusers pipeline directory (unet/vae/text_encoder/tokenizer/scheduler +
model_index.json) whose scheduler is ALWAYS serialized as DDIM
scaled_linear/v_prediction regardless of the training scheduler (the
reference's comment says its vendored DDPM "doesn't work" for pipeline save).
Weights are written as torch-layout safetensors, so the directory loads in
PyTorch diffusers and back into this framework.

The Orbax path fixes the reference's recovery gap (SURVEY.md §5.4): the
reference never checkpoints optimizer state (quantized momenta), EMA buffers,
or the RNG — every chunk-resume silently reset them. ``save_train_state`` /
``restore_train_state`` capture the full training state.
"""

import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import DDIMScheduler
from ..models import hf_io


def _to_numpy_f32(tree):
    """Host-transfer params, widening bf16 (no numpy dtype) to f32."""

    def _leaf(x):
        x = jax.device_get(x)
        if hasattr(x, "dtype") and x.dtype == jnp.bfloat16:
            return np.asarray(x, dtype=np.float32)
        return np.asarray(x)

    return jax.tree_util.tree_map(_leaf, tree)


_MODEL_INDEX = {
    "_class_name": "FlaxStableDiffusionPipeline",
    "_diffusers_version": "0.21.4",
    "feature_extractor": [None, None],
    "safety_checker": [None, None],
    "scheduler": ["diffusers", "FlaxDDIMScheduler"],
    "text_encoder": ["transformers", "FlaxCLIPTextModel"],
    "tokenizer": ["transformers", "CLIPTokenizer"],
    "unet": ["diffusers", "FlaxUNet2DConditionModel"],
    "vae": ["diffusers", "FlaxAutoencoderKL"],
}


def _write_text_encoder_config(text_encoder, directory: str) -> None:
    cfg = dict(text_encoder.config.to_dict())
    cfg.update(
        {
            "architectures": ["CLIPTextModel"],
            "model_type": "clip_text_model",
            "torch_dtype": "float32",
        }
    )
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2, sort_keys=True)


def save_model(
    model_object_dict: dict,
    tokenizer_object: Any,
    unet_params: dict,
    text_encoder_params: dict,
    vae_params: dict,
    output_dir: str,
) -> None:
    """Serialize a trained pipeline in diffusers layout
    (reference signature, ``training_utils.py:986-1025``)."""
    os.makedirs(output_dir, exist_ok=True)

    # the reference always embeds DDIM scaled_linear/v_prediction (L997-1004)
    noise_scheduler = DDIMScheduler(
        beta_start=0.00085,
        beta_end=0.012,
        beta_schedule="scaled_linear",
        num_train_timesteps=1000,
        prediction_type="v_prediction",
    )
    noise_scheduler.save_config(os.path.join(output_dir, "scheduler"))

    unet = model_object_dict["unet"]
    vae = model_object_dict["vae"]
    text_encoder = model_object_dict["text_encoder"]

    unet_dir = os.path.join(output_dir, "unet")
    unet.save_config(unet_dir)
    hf_io.save_unet_params(_to_numpy_f32(unet_params), unet_dir)

    vae_dir = os.path.join(output_dir, "vae")
    vae.save_config(vae_dir)
    hf_io.save_vae_params(_to_numpy_f32(vae_params), vae_dir)

    te_dir = os.path.join(output_dir, "text_encoder")
    _write_text_encoder_config(text_encoder, te_dir)
    hf_io.save_text_encoder_params(_to_numpy_f32(text_encoder_params), te_dir)

    if tokenizer_object is not None:
        tokenizer_object.save_pretrained(os.path.join(output_dir, "tokenizer"))

    with open(os.path.join(output_dir, "model_index.json"), "w") as f:
        json.dump(_MODEL_INDEX, f, indent=2, sort_keys=True)


# --- Orbax full training state ------------------------------------------------


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_train_state(
    directory: str,
    unet_state: Any,
    text_encoder_state: Any,
    unet_ema_params: Optional[dict],
    text_encoder_ema_params: Optional[dict],
    train_rng: jax.Array,
    step_metadata: Optional[Dict[str, Any]] = None,
) -> None:
    """Full-state checkpoint: params + optimizer (incl. quantized momentum
    blocks) + EMA + RNG, restorable mid-run."""
    directory = os.path.abspath(directory)
    payload = {
        "unet_state": unet_state,
        "text_encoder_state": text_encoder_state,
        "unet_ema_params": unet_ema_params if unet_ema_params is not None else {},
        "text_encoder_ema_params": (
            text_encoder_ema_params if text_encoder_ema_params is not None else {}
        ),
        "train_rng": train_rng,
    }
    # single-process: hand orbax HOST arrays — its own device->host path
    # compiles a lax.slice program per leaf (replica_slices.
    # transfer_arrays_to_host), a compile storm of hundreds of tiny XLA
    # programs on every checkpoint; a plain device_get copies without
    # compiling anything. Multi-process keeps orbax's distributed path
    # (device_get cannot assemble non-addressable shards).
    if jax.process_count() == 1:
        payload = jax.tree_util.tree_map(
            lambda leaf: jax.device_get(leaf)
            if hasattr(leaf, "addressable_shards")
            else leaf,
            payload,
        )
    _checkpointer().save(directory, payload, force=True)
    if step_metadata is not None:
        with open(os.path.join(directory, "metadata.json"), "w") as f:
            json.dump(step_metadata, f, indent=2)


def restore_train_state(directory: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Restore a full-state checkpoint onto a matching state template
    (shapes/shardings from a freshly-built state).

    Checkpoints written before the dense momentum layout (codes stored
    block-TRANSPOSED, see ``optim.lion8bit``) restore through a legacy
    template and are migrated in place — a pure relayout, values exact."""
    directory = os.path.abspath(directory)
    from ..optim.lion8bit import (
        _is_dense,
        momentum_dense_retile,
        momentum_to_canonical_layout,
    )

    restored = _checkpointer().restore(
        directory, item=jax.tree_util.tree_map(lambda x: x, template)
    )

    def _is_mu(node):
        # quantized momentum specifically: (int8 codes, float scales) —
        # a bare len-2 check would also catch optax sub-state tuples
        # (e.g. (SomeState, EmptyState)) whose members have no .shape
        return (
            isinstance(node, tuple)
            and len(node) == 2
            and all(hasattr(x, "shape") and hasattr(x, "dtype") for x in node)
            and np.dtype(node[0].dtype) == np.int8
        )

    def _migrate(node, like):
        # orbax returns the STORED shapes silently when they differ from
        # the template's; a legacy-layout momentum leaf shows up here with
        # mismatched shapes and is relayouted in place (values exact)
        if not (_is_mu(node) and _is_mu(like)):
            return node
        if all(n.shape == t.shape for n, t in zip(node, like)):
            return node
        canonical = momentum_to_canonical_layout(node)
        if (
            any(c.shape != t.shape for c, t in zip(canonical, like))
            and _is_dense(*canonical)
            and _is_dense(*like)
            and canonical[0].shape == like[0].shape
        ):
            # dense either side with matching codes: only the scales tile
            # grouping differs (dense_fsdp_factor changed between the run
            # that wrote the checkpoint and this one) — pure re-tile
            canonical = momentum_dense_retile(canonical, like[1].shape[1])
        if any(c.shape != t.shape for c, t in zip(canonical, like)):
            raise ValueError(
                "checkpoint momentum leaf has shapes "
                f"{[tuple(n.shape) for n in node]} which neither match the "
                f"state template {[tuple(t.shape) for t in like]} nor "
                "migrate to it via the canonical relayout"
            )
        return tuple(
            jax.device_put(jnp.asarray(c), t.sharding)
            if hasattr(t, "sharding")
            else jnp.asarray(c)
            for c, t in zip(canonical, like)
        )

    return jax.tree_util.tree_map(_migrate, restored, template, is_leaf=_is_mu)
