"""Flash attention parity vs the jnp reference (fwd and grads), interpret
mode on CPU — the numerics contract for the TPU kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_training_tpu.ops.attention import dot_product_attention
from stable_diffusion_training_tpu.ops.flash_attention import flash_attention


def _rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype=dtype)


def _make_qkv(sq, sk, h=2, d=32, b=2, seed=0, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    return (
        _rand((b, sq, h, d), k1, dtype),
        _rand((b, sk, h, d), k2, dtype),
        _rand((b, sk, h, d), k3, dtype),
    )


CASES = [
    pytest.param(256, 256, id="self-256"),
    pytest.param(256, 77, id="cross-77"),      # CLIP window
    pytest.param(256, 227, id="cross-227"),    # 3x77 stripped context
    pytest.param(200, 200, id="ragged-200"),   # non-128-multiple seq
    pytest.param(640, 640, id="multiblock"),   # > one 512 block
]


@pytest.mark.parametrize("sq,sk", CASES)
def test_forward_matches_reference(sq, sk):
    q, k, v = _make_qkv(sq, sk)
    ref = dot_product_attention(q, k, v)
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("sq,sk", [(256, 256), (256, 77), (200, 200)])
def test_grads_match_reference(sq, sk):
    q, k, v = _make_qkv(sq, sk, seed=3)

    def loss_ref(q, k, v):
        return (dot_product_attention(q, k, v) ** 2).mean()

    def loss_flash(q, k, v):
        return (
            flash_attention(q, k, v, block_q=128, block_k=128, interpret=True) ** 2
        ).mean()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_flash):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


def test_custom_scale():
    q, k, v = _make_qkv(128, 128, seed=5)
    ref = dot_product_attention(q, k, v, scale=0.5)
    out = flash_attention(q, k, v, scale=0.5, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_bf16_io():
    q, k, v = _make_qkv(128, 128, seed=7, dtype=jnp.bfloat16)
    ref = dot_product_attention(q, k, v)
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


def test_attention_dispatcher_falls_back_on_mask():
    from stable_diffusion_training_tpu.ops.attention import attention

    q, k, v = _make_qkv(64, 64, seed=9)
    mask = jnp.zeros((2, 2, 64, 64))
    out = attention(q, k, v, mask=mask, backend="flash")  # mask -> xla fallback
    ref = dot_product_attention(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
