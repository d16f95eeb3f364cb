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


def test_precomputed_context_matches_in_step_encode(tiny_states):
    """compute_encoder_hidden_states reproduces the in-step encode
    (77-token windows + BOS/EOS-strip concat; equal up to jit-vs-eager
    fusion rounding), so the frozen-TE precomputed-context path trains on
    the same conditioning."""
    from stable_diffusion_training_tpu.data.latent_cache import (
        compute_encoder_hidden_states,
    )
    from stable_diffusion_training_tpu.data.memory import synthetic_batch

    _, states = tiny_states
    te_state = states[1]
    objs = states[6]
    batch = synthetic_batch(4, (32, 32), concat_count=3, vocab_size=1000)

    ctx = compute_encoder_hidden_states(
        objs["text_encoder"], te_state.params, batch["input_ids"],
        concat_count=3, strip_bos_eos_token=True,
    )
    assert ctx.shape == (4, 75 * 3 + 2, 32)  # 227-token concat, TE dim 32

    # replicate the in-step formula directly
    hidden = objs["text_encoder"](
        batch["input_ids"], params=te_state.params
    )[0]
    h = np.asarray(hidden).reshape(4, 3, 77, -1)
    ref = np.concatenate(
        [h[:, 0, :-1, :], h[:, 1:-1, 1:-1, :].reshape(4, -1, h.shape[-1]),
         h[:, -1, 1:, :]],
        axis=1,
    )
    # jitted vs eager XLA:CPU fusion differs in the last float32 bit
    np.testing.assert_allclose(ctx, ref, atol=3e-6, rtol=1e-6)


def test_dual_tower_context_and_sdxl_scale_step(tmp_path):
    """SDXL-at-real-scale training path: the dual-tower 2048-style context
    (here 32+32=64) is precomputed with FROZEN towers and fed via
    batch['encoder_hidden_states'] — the in-step encode cannot produce it
    (it only carries the trainable first tower). The fused step runs with
    train_text_encoder=False and updates the UNet."""
    import jax.numpy as jnp

    from stable_diffusion_training_tpu.data.latent_cache import (
        cache_batches_to_dir,
        compute_encoder_hidden_states,
    )
    from stable_diffusion_training_tpu.data.latent_cache import (
        CachedLatentLoader,
    )
    from stable_diffusion_training_tpu.data.memory import synthetic_batch
    from stable_diffusion_training_tpu.models import (
        CLIPTextModel,
        CLIPTextModelWithProjection,
        configs,
    )
    from stable_diffusion_training_tpu.train import (
        on_device_model_training_state,
    )

    te1 = CLIPTextModel(**configs.TINY_CLIP)
    te2 = CLIPTextModelWithProjection(**configs.TINY_CLIP_PROJ)
    rng = jax.random.PRNGKey(0)
    p1 = te1.init(rng)
    p2 = te2.init(jax.random.PRNGKey(1))

    batch = synthetic_batch(2, (32, 32), concat_count=3, vocab_size=1000)
    ctx = compute_encoder_hidden_states(
        te1, p1, batch["input_ids"], concat_count=3,
        text_encoder_2=te2, te2_params=p2, penultimate=True,
    )
    assert ctx.shape == (2, 227, 64)  # feature concat of both towers
    # each half matches its single-tower computation
    half1 = compute_encoder_hidden_states(
        te1, p1, batch["input_ids"], concat_count=3, penultimate=True
    )
    np.testing.assert_array_equal(ctx[..., :32], half1)

    # a UNet with cross_attention_dim = the dual-tower width trains from
    # the cached context (micro-conds included) with frozen text encoders
    cfg = make_config(model_family="tiny_sdxl")
    unet_state, te_state, _, _, fvae, fsched, objs = clone(
        on_device_model_training_state(cfg)
    )
    # tiny_sdxl cross_attention_dim=32 -> use TE1-only context here; the
    # dual-tower assertion above already covers the feature concat
    cached_paths = cache_batches_to_dir(
        [batch], objs["vae"], fvae.params, str(tmp_path / "ctx_cache"),
        text_encoder_2=te2, te2_params=p2,
        text_encoder=objs["text_encoder"], te_params=te_state.params,
        concat_count=3,
    )
    loader = CachedLatentLoader(str(tmp_path / "ctx_cache"))
    loader.dispatch_worker()
    cached_batch = loader.grab_next_batch()
    assert "encoder_hidden_states" in cached_batch
    assert "pooled_text_embeds" in cached_batch
    assert cached_batch["encoder_hidden_states"].shape[-1] == 64  # dual
    # tiny_sdxl's UNet is 32-wide cross-attention; feed it the TE1 half
    # (real SDXL uses the full 2048 concat with a 2048-wide UNet)
    cached_batch["encoder_hidden_states"] = (
        cached_batch["encoder_hidden_states"][..., :32]
    )

    step = _jit_step()
    out = step(
        unet_state, te_state, None, None, cached_batch, jax.random.PRNGKey(2),
        fvae, fsched, train_text_encoder=False, **_STATIC,
    )
    assert np.isfinite(float(out[4]["loss"]))


def test_context_token_count_matches_helper_output():
    """The AOT static token count must equal what concat_context_windows
    actually produces — including the degenerate concat_count=1 case where
    the reference strip formula duplicates the single window."""
    import jax.numpy as jnp

    from stable_diffusion_training_tpu.utils.context import (
        concat_context_windows,
        context_token_count,
    )

    for concat in (1, 2, 3, 5):
        for strip in (True, False):
            h = jnp.zeros((2, concat, 77, 4))
            out = concat_context_windows(h, strip)
            assert out.shape[1] == context_token_count(77, concat, strip), (
                concat, strip, out.shape,
            )


def test_cached_context_requires_frozen_te():
    """cached_text_context with a trainable text encoder would silently
    weight-decay the unused TE; the config rejects it loudly."""
    with pytest.raises(ValueError, match="train_text_encoder"):
        make_config(cached_text_context=True, train_text_encoder=True)
    cfg = make_config(cached_text_context=True, train_text_encoder=False)
    assert cfg.cached_text_context


def test_dual_tower_separate_ids_for_tower_2():
    """input_ids_2 routes a separately-tokenized prompt to the second tower
    (canonical SDXL pads per tower); result differs from reusing ids_1 and
    the first-tower half is unaffected."""
    from stable_diffusion_training_tpu.data.latent_cache import (
        compute_encoder_hidden_states,
    )
    from stable_diffusion_training_tpu.models import (
        CLIPTextModel,
        CLIPTextModelWithProjection,
        configs,
    )

    te1 = CLIPTextModel(**configs.TINY_CLIP)
    te2 = CLIPTextModelWithProjection(**configs.TINY_CLIP_PROJ)
    p1 = te1.init(jax.random.PRNGKey(0))
    p2 = te2.init(jax.random.PRNGKey(1))
    rng = np.random.RandomState(0)
    ids1 = rng.randint(0, 1000, (6, 77)).astype(np.int32)
    ids2 = rng.randint(0, 1000, (6, 77)).astype(np.int32)

    shared = compute_encoder_hidden_states(
        te1, p1, ids1, concat_count=3, text_encoder_2=te2, te2_params=p2
    )
    separate = compute_encoder_hidden_states(
        te1, p1, ids1, concat_count=3, text_encoder_2=te2, te2_params=p2,
        input_ids_2=ids2,
    )
    np.testing.assert_array_equal(shared[..., :32], separate[..., :32])
    assert not np.allclose(shared[..., 32:], separate[..., 32:])


def test_encode_chunked_matches_whole_batch():
    """chunk=1 lax.map precompute == whole-batch encode (bitwise on CPU)."""
    import numpy as np

    from stable_diffusion_training_tpu.data.latent_cache import (
        encode_batch_to_moments,
    )
    from stable_diffusion_training_tpu.models import AutoencoderKL, configs

    vae = AutoencoderKL(
        **configs.MODEL_FAMILIES["tiny"]["vae"], data_format="NHWC"
    )
    import jax

    params = vae.init(jax.random.PRNGKey(0))
    px = np.random.RandomState(0).randn(2, 3, 64, 64).astype(np.float32)
    whole = encode_batch_to_moments(vae, params, px, chunk=None)
    per = encode_batch_to_moments(vae, params, px, chunk=1)
    np.testing.assert_array_equal(whole, per)
