"""Polyphase stride-2 conv decomposition vs the fused stride-2 conv.

Covers ops/conv.py: exact tap mapping for both padding forms used in the
framework (asymmetric = VAE encoder downsample, symmetric = UNet
downsample), f32 and bf16, non-square spatial dims and Cin != Cout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_training_tpu.ops.conv import (
    polyphase_stride2_conv,
    stride2_conv_reference,
)


def _rand(shape, seed, dtype=np.float32):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape, dtype=np.float32)
    ).astype(dtype)


@pytest.mark.parametrize("asymmetric", [True, False])
@pytest.mark.parametrize(
    "shape,cout", [((2, 8, 12, 4), 6), ((1, 64, 64, 8), 8)]
)
def test_polyphase_matches_stride2_f32(asymmetric, shape, cout):
    x = _rand(shape, 0)
    k = _rand((3, 3, shape[-1], cout), 1)
    ref = stride2_conv_reference(x, k, asymmetric)
    poly = polyphase_stride2_conv(x, k, asymmetric)
    assert ref.shape == poly.shape == (
        shape[0], shape[1] // 2, shape[2] // 2, cout
    )
    np.testing.assert_allclose(
        np.asarray(poly), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("asymmetric", [True, False])
def test_polyphase_matches_stride2_bf16(asymmetric):
    x = _rand((2, 16, 16, 8), 2, jnp.bfloat16)
    k = _rand((3, 3, 8, 8), 3, jnp.bfloat16)
    ref = stride2_conv_reference(x, k, asymmetric)
    poly = polyphase_stride2_conv(x, k, asymmetric)
    assert poly.dtype == x.dtype
    # both forms accumulate the 9-tap reduction in f32; the only difference
    # is the split into four f32 partials, which stays within one bf16 ulp
    np.testing.assert_allclose(
        np.asarray(poly, np.float32),
        np.asarray(ref, np.float32),
        rtol=1.6e-2,
        atol=1e-3,
    )


def test_polyphase_edge_rows_hit_padding():
    """The boundary taps (the whole point of the padding mapping) are
    exercised: with ones input and ones kernel, interior outputs see all 9
    taps while the padded edge sees fewer — check the exact tap counts."""
    x = jnp.ones((1, 6, 6, 1))
    k = jnp.ones((3, 3, 1, 1))
    for asym in (True, False):
        y = np.asarray(polyphase_stride2_conv(x, k, asym))[0, :, :, 0]
        ref = np.asarray(stride2_conv_reference(x, k, asym))[0, :, :, 0]
        np.testing.assert_array_equal(y, ref)
        if asym:
            # last row/col lose the di=2 taps (bottom/right zero pad)
            assert y[0, 0] == 9 and y[-1, -1] == 4
        else:
            # first row/col lose the di=0 taps (top/left zero pad)
            assert y[1, 1] == 9 and y[0, 0] == 4


def test_polyphase_rejects_bad_shapes():
    with pytest.raises(ValueError):
        polyphase_stride2_conv(
            jnp.ones((1, 7, 8, 2)), jnp.ones((3, 3, 2, 2))
        )
    with pytest.raises(ValueError):
        polyphase_stride2_conv(
            jnp.ones((1, 8, 8, 2)), jnp.ones((5, 5, 2, 2))
        )


def test_polyphase_jits_and_grads():
    """The decomposition sits inside the jitted train step's VAE encode;
    make sure it traces under jit and is differentiable (the VAE is frozen
    in training, but the pipeline may reuse the op)."""
    x = _rand((1, 8, 8, 4), 4)
    k = _rand((3, 3, 4, 4), 5)

    f = jax.jit(lambda x, k: jnp.sum(polyphase_stride2_conv(x, k)))
    g_poly = jax.grad(f, argnums=(0, 1))(x, k)
    g_ref = jax.grad(
        lambda x, k: jnp.sum(stride2_conv_reference(x, k)), argnums=(0, 1)
    )(x, k)
    for a, b in zip(g_poly, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )


def test_vae_encoder_polyphase_matches_default():
    """Same params, polyphase on vs off: identical param tree, allclose
    moments (the flag only changes how the stride-2 taps are scheduled)."""
    from stable_diffusion_training_tpu.models import AutoencoderKL

    from stable_diffusion_training_tpu.models import configs

    kw = dict(configs.MODEL_FAMILIES["tiny"]["vae"], data_format="NHWC")
    vae = AutoencoderKL(**kw)
    vae_poly = AutoencoderKL(polyphase_downsample=True, **kw)
    params = vae.init(jax.random.PRNGKey(0), resolution=16)
    chex = jax.tree_util.tree_structure(params)
    assert chex == jax.tree_util.tree_structure(
        vae_poly.init(jax.random.PRNGKey(0), resolution=16)
    )
    x = _rand((2, 16, 16, 3), 7)
    m_ref = vae.encode(x, params).latent_dist
    m_poly = vae_poly.encode(x, params).latent_dist
    np.testing.assert_allclose(
        np.asarray(m_poly.mean), np.asarray(m_ref.mean), rtol=2e-4, atol=2e-5
    )
    # config JSON round-trips without leaking the runtime-only flag
    assert "polyphase_downsample" not in vae_poly.config
