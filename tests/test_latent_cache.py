"""Latent-cache path: cached-moments training equals on-the-fly VAE encode
(same rng -> identical loss), frozen text encoder support."""

import jax
import numpy as np
import pytest

from stable_diffusion_training_tpu.data import InMemoryDataLoader
from stable_diffusion_training_tpu.data.latent_cache import (
    precompute_latent_cache,
)
from stable_diffusion_training_tpu.train import train_step

from test_train import clone, make_config


@pytest.fixture(scope="module")
def tiny_states():
    from stable_diffusion_training_tpu.train import on_device_model_training_state

    cfg = make_config()
    return cfg, on_device_model_training_state(cfg)


def _jit_step():
    return jax.jit(
        train_step,
        donate_argnums=(0, 1, 2, 3),
        static_argnames=(
            "strip_bos_eos_token", "offset_noise_magnitude",
            "min_snr_gamma_magnitude", "perturbation_noise_magnitude",
            "ema_rate", "train_text_encoder",
        ),
    )


_STATIC = dict(
    strip_bos_eos_token=True,
    offset_noise_magnitude=0.0,
    min_snr_gamma_magnitude=0.0,
    perturbation_noise_magnitude=0.0,
    ema_rate=0.0,
)


@pytest.mark.slow  # online-vs-cached fused-step compiles
def test_cached_latents_match_online_vae(tiny_states, tmp_path):
    _, states = tiny_states
    objs = states[6]
    fvae = states[4]

    pixel_loader = InMemoryDataLoader.synthetic(
        2, 8, [(32, 32)], concat_count=3, vocab_size=1000, seed=0
    )
    cached = precompute_latent_cache(
        pixel_loader, objs["vae"], fvae.params, str(tmp_path / "cache")
    )
    assert cached._bulk_batch_count == 2

    pixel_loader.dispatch_worker()
    cached.dispatch_worker()
    pixel_batch = pixel_loader.grab_next_batch()
    cached_batch = cached.grab_next_batch()
    assert "latent_moments" in cached_batch
    assert cached_batch["latent_moments"].shape == (8, 8, 16, 16)

    rng = jax.random.PRNGKey(5)
    step = _jit_step()
    u1, t1, _, _, fv, fs, _ = clone(states)
    out_pixels = step(u1, t1, None, None, pixel_batch, rng, fv, fs, **_STATIC)
    u2, t2, _, _, _, _, _ = clone(states)
    out_cached = step(u2, t2, None, None, cached_batch, rng, fv, fs, **_STATIC)

    np.testing.assert_allclose(
        float(out_pixels[4]["loss"]), float(out_cached[4]["loss"]), rtol=1e-5
    )


def test_frozen_text_encoder(tiny_states):
    _, states = tiny_states
    unet_state, te_state, _, _, fvae, fsched, _ = clone(states)
    from stable_diffusion_training_tpu.data.memory import synthetic_batch

    batch = synthetic_batch(8, (32, 32), concat_count=3, vocab_size=1000)
    step = _jit_step()
    out = step(
        unet_state, te_state, None, None, batch, jax.random.PRNGKey(0),
        fvae, fsched, train_text_encoder=False, **_STATIC,
    )
    assert np.isfinite(float(out[4]["loss"]))
    # text encoder untouched: params identical, step counter unchanged
    for a, b in zip(
        jax.tree.leaves(states[1].params), jax.tree.leaves(out[1].params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(out[1].step) == int(states[1].step)
    # unet did update
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(states[0].params), jax.tree.leaves(out[0].params)
        )
    )
    assert changed
