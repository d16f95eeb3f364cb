"""AOT multi-resolution compiler: one XLA program per aspect-ratio bucket.

Behavior parity with ``dp_compile_all_unique_resolution`` at
``/root/reference/training_utils.py:765-983``: persistent compilation cache,
the same bucket sweep (``calculate_resolution_array`` per (area, min-axis)
tier), dummy CPU batches ``pixel_values (B,3,res0,res1) f32`` +
``(B*concat, 77) i32`` ids/mask, donated state args, DP batch sharding,
lowering on the main thread with ``.compile()`` overlapped on worker threads,
and a result dict keyed by the ``pixel_values`` shape tuple (the training
loop dispatches on ``batch["pixel_values"].shape`` —
``/root/reference/training.py:221``).

TPU-native: shardings come from the caller's mesh (replicated or FSDP states,
DP batch axis) instead of a module-global mesh.
"""

import gc
from threading import Thread
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..core import mesh as mesh_lib
from ..data.buckets import calculate_resolution_array
from ..utils.timing import TimingContextManager
from .config import TrainingConfig
from .train_step import train_step


def initialize_compilation_cache(path: str) -> None:
    """Enable JAX's persistent XLA compilation cache
    (reference ``cc.initialize_cache``, ``training_utils.py:775-776``)."""
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def all_unique_resolutions(training_config: TrainingConfig) -> np.ndarray:
    buckets = []
    rounding = getattr(training_config, "bucket_rounding", 64)
    for area_root, min_axis in zip(
        training_config.image_area_root, training_config.minimum_axis_length
    ):
        buckets.append(
            calculate_resolution_array(
                max_res_area=area_root**2,
                bucket_lower_bound_res=min_axis,
                rounding=rounding,
            )
        )
    # multi-tier configs can repeat shapes across tiers; each unique shape
    # needs exactly one compiled program
    return np.unique(np.concatenate(buckets), axis=0)


def batch_dispatch_key(batch: Dict[str, Any]) -> tuple:
    """Shape key used to pick the compiled program for a batch: the
    ``pixel_values`` shape (reference ``training.py:221``), or the
    ``latent_moments`` shape on the offline-latent-cache path."""
    if "pixel_values" in batch:
        return tuple(batch["pixel_values"].shape)
    return tuple(batch["latent_moments"].shape)


def dp_compile_all_unique_resolution(
    unet_state: Any,
    text_encoder_state: Any,
    unet_ema_params: Optional[dict],
    text_encoder_ema_params: Optional[dict],
    frozen_vae: Any,
    frozen_schedulers: Any,
    training_config: TrainingConfig,
    mesh: Optional[Mesh] = None,
) -> Dict[tuple, jax.stages.Compiled]:
    """Compile ``train_step`` for every bucket; returns
    ``{pixel_values_shape: Compiled}``."""
    mesh = mesh or mesh_lib.get_default_mesh()
    if training_config.keep_compiled_fn_in_cache:
        # reference gates this on TPU (training_utils.py:775-776); the
        # persistent cache also works for the CPU backend, so enable it
        # everywhere — CI re-runs then skip recompiles too
        initialize_compilation_cache(training_config.compilation_cache_path)

    all_possible_resolution = all_unique_resolutions(training_config)

    # sharding trees: state layouts are taken from how the caller placed them
    # (replicated by default, FSDP when enabled) so AOT matches runtime
    def _current_sharding(tree):
        return jax.tree_util.tree_map(
            lambda leaf: (
                leaf.sharding
                if hasattr(leaf, "sharding")
                else NamedSharding(mesh, PartitionSpec())
            ),
            tree,
        )

    replicated = lambda tree: jax.tree_util.tree_map(  # noqa: E731
        lambda _: NamedSharding(mesh, PartitionSpec()), tree
    )
    batch_spec = NamedSharding(mesh, PartitionSpec("data_parallel", None))

    unet_sh = _current_sharding(unet_state)
    text_sh = _current_sharding(text_encoder_state)
    unet_ema_sh = (
        _current_sharding(unet_ema_params)
        if training_config.accumulate_unet_ema
        else None
    )
    text_ema_sh = (
        _current_sharding(text_encoder_ema_params)
        if training_config.accumulate_text_encoder_ema
        else None
    )
    vae_sh = replicated(frozen_vae)
    sched_sh = replicated(frozen_schedulers)

    # geometry for latent-cache / SDXL dummy batches, read off the placed
    # model objects (frozen VAE pytree carries the model; the UNet TrainState
    # apply_fn is a bound method of the UNet model)
    vae_model = frozen_vae.call
    vae_factor = 2 ** (len(vae_model.config.block_out_channels) - 1)
    latent_channels = vae_model.config.latent_channels
    unet_model = getattr(unet_state.apply_fn, "__self__", None)

    def _create_lowered_hlo(bucket_resolution: np.ndarray):
        dummy_rngs = jax.random.PRNGKey(2)
        with jax.default_device(jax.devices("cpu")[0]):
            if training_config.use_latent_cache:
                # the loader serves VAE posterior moments (2x latent chans)
                # at latent resolution instead of pixels
                batch = {
                    "latent_moments": jnp.zeros(
                        shape=(
                            training_config.batch_size,
                            2 * latent_channels,
                            int(bucket_resolution[0]) // vae_factor,
                            int(bucket_resolution[1]) // vae_factor,
                        ),
                        dtype=jnp.float32,
                    ),
                }
            else:
                batch = {
                    "pixel_values": jnp.zeros(
                        shape=(
                            training_config.batch_size,
                            3,
                            int(bucket_resolution[0]),
                            int(bucket_resolution[1]),
                        ),
                        dtype=jnp.float32,
                    ),
                }
            batch["input_ids"] = jnp.zeros(
                shape=(
                    training_config.batch_size
                    * training_config.context_window_concatenation_count,
                    training_config.text_encoder_context_window,
                ),
                dtype=jnp.int32,
            )
            batch["attention_mask"] = jnp.zeros_like(batch["input_ids"])
            if training_config.cached_text_context:
                # frozen-tower precomputed context: tokens follow the same
                # BOS/EOS-strip window math as the in-step encode; width is
                # the UNet's cross-attention dim by construction
                from ..utils.context import context_token_count

                tokens = context_token_count(
                    training_config.text_encoder_context_window,
                    training_config.context_window_concatenation_count,
                    training_config.strip_bos_eos_token,
                )
                batch["encoder_hidden_states"] = jnp.zeros(
                    (
                        training_config.batch_size,
                        tokens,
                        unet_model.config.cross_attention_dim,
                    ),
                    jnp.float32,
                )
            if training_config.sdxl_micro_conditioning:
                cfg = unet_model.config
                # 6 ids for the base model, 5 for the refiner (aesthetic
                # score replaces the target size) — config.sdxl_time_ids_count
                n_ids = training_config.sdxl_time_ids_count
                pooled_dim = (
                    cfg.projection_class_embeddings_input_dim
                    - n_ids * cfg.addition_time_embed_dim
                )
                batch["pooled_text_embeds"] = jnp.zeros(
                    (training_config.batch_size, pooled_dim), jnp.float32
                )
                batch["time_ids"] = jnp.zeros(
                    (training_config.batch_size, n_ids), jnp.float32
                )
        image_shape = batch_dispatch_key(batch)
        batch = jax.tree_util.tree_map(
            lambda leaf: jax.device_put(leaf, device=batch_spec), batch
        )

        p_train_step = jax.jit(
            train_step,
            donate_argnums=(0, 1, 2, 3),
            in_shardings=(
                unet_sh,
                text_sh,
                unet_ema_sh,
                text_ema_sh,
                jax.tree_util.tree_map(lambda _: batch_spec, batch),
                None,  # rng — let the compiler place it
                vae_sh,
                sched_sh,
            ),
            # args 8..16 = (strip_bos_eos_token, offset_noise_magnitude,
            # min_snr_gamma_magnitude, perturbation_noise_magnitude, ema_rate,
            # text_context_window, grad_accumulation_steps,
            # train_text_encoder, vae_encode_chunk)
            # — positional because pjit with in_shardings rejects kwargs
            static_argnums=(8, 9, 10, 11, 12, 13, 14, 15, 16),
            out_shardings=(
                unet_sh,
                text_sh,
                unet_ema_sh,
                text_ema_sh,
                {"loss": NamedSharding(mesh, PartitionSpec())},
                None,
            ),
        )

        with TimingContextManager(f"lowering {bucket_resolution}"):
            lowered_hlo = p_train_step.lower(
                unet_state,
                text_encoder_state,
                unet_ema_params,
                text_encoder_ema_params,
                batch,
                dummy_rngs,
                frozen_vae,
                frozen_schedulers,
                training_config.strip_bos_eos_token,
                training_config.offset_noise_magnitude,
                training_config.min_snr_gamma_magnitude,
                training_config.perturbation_noise_magnitude,
                training_config.ema_rate,
                training_config.text_encoder_context_window,
                training_config.grad_accumulation_steps,
                training_config.train_text_encoder,
                training_config.vae_encode_chunk,
            )
        del batch
        gc.collect()
        return lowered_hlo, image_shape

    compiled_train_step: Dict[tuple, jax.stages.Compiled] = {}

    def _compile_unique_res_train_step(hlo, resolution):
        # each thread writes a distinct key; dict writes are GIL-atomic
        compiled_train_step[resolution] = hlo.compile()

    with TimingContextManager("lowering all res"):
        threads = []
        for bucket_resolution in all_possible_resolution:
            lowered = _create_lowered_hlo(bucket_resolution)
            thread = Thread(target=_compile_unique_res_train_step, args=lowered)
            threads.append(thread)
            thread.start()
        for thread in threads:
            thread.join()

    return compiled_train_step
