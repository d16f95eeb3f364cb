"""Fused Pallas Lion kernel parity vs the jnp/optax implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_training_tpu.ops.lion_kernel import (
    fused_lion8bit_update,
    fused_lion8bit_update_transposed,
)
from stable_diffusion_training_tpu.optim.lion8bit import scale_by_lion_8bit


def _reference_leaf_update(g, codes, scales, b1, b2, block_size):
    """Drive the optax transform on a single all-quantized leaf."""
    tx = scale_by_lion_8bit(
        b1=b1, b2=b2, block_size=block_size, excluded_layer_mask=True
    )
    params = {"w": jnp.zeros(g.shape, jnp.float32)}
    state = tx.init(params)
    # state layout is block-transposed (bs, nb); this helper speaks the
    # reference's (nb, bs) frame, so transpose on the way in and out
    state = state._replace(mu_quant={"w": (codes.T, scales.T)})
    upd, new_state = tx.update({"w": g}, state)
    new_codes, new_scales = new_state.mu_quant["w"]
    return upd["w"], new_codes.T, new_scales.T


@pytest.mark.parametrize("layout", ["narrow", "wide", "transposed"])
@pytest.mark.parametrize("block_size", [16, 64, 128])
@pytest.mark.parametrize("n", [2048, 2000 * 16])
def test_fused_matches_optax(block_size, n, layout):
    if layout == "wide" and block_size >= 128:
        with pytest.raises(ValueError):
            fused_lion8bit_update(
                jnp.zeros((block_size,)),
                jnp.zeros((1, block_size), jnp.int8),
                jnp.ones((1, 1)),
                interpret=True,
                layout="wide",
            )
        return
    if n % block_size:
        n = (n // block_size) * block_size
    rng = np.random.RandomState(0)
    g = jnp.asarray(rng.randn(n).astype(np.float32) * 1e-3)
    mu = jnp.asarray(rng.randn(n).astype(np.float32) * 1e-4)

    # build a valid quantized momentum from mu
    blocks = mu.reshape(-1, block_size)
    absmax = jnp.max(jnp.abs(blocks), axis=-1, keepdims=True)
    scales = 1 / jnp.where(absmax <= 0, 1.0, absmax)
    from stable_diffusion_training_tpu.ops.lion_kernel import _quantize

    codes = _quantize(blocks * scales)

    ref_upd, ref_codes, ref_scales = _reference_leaf_update(
        g, codes, scales, 0.9, 0.99, block_size
    )
    if layout == "transposed":
        out_upd, ct, st = fused_lion8bit_update_transposed(
            g, codes.T, scales.T, b1=0.9, b2=0.99, interpret=True
        )
        out_codes, out_scales = ct.T, st.T
    else:
        out_upd, out_codes, out_scales = fused_lion8bit_update(
            g, codes, scales, b1=0.9, b2=0.99, interpret=True, layout=layout
        )

    np.testing.assert_array_equal(np.asarray(out_upd), np.asarray(ref_upd))
    np.testing.assert_array_equal(np.asarray(out_codes), np.asarray(ref_codes))
    np.testing.assert_allclose(
        np.asarray(out_scales), np.asarray(ref_scales), rtol=1e-6
    )


def test_zero_block_guard():
    """All-zero momentum blocks must round-trip without div-by-zero."""
    n, bs = 256, 16
    g = jnp.zeros((n,), jnp.float32)
    codes = jnp.full((n // bs, bs), 3, jnp.int8)  # quantized zero is code 3
    scales = jnp.ones((n // bs, 1), jnp.float32)
    upd, new_codes, new_scales = fused_lion8bit_update(
        g, codes, scales, interpret=True
    )
    assert bool(jnp.isfinite(new_scales).all())
    assert bool(jnp.isfinite(upd).all())
    # same guard through the canonical transposed layout
    upd_t, _, new_scales_t = fused_lion8bit_update_transposed(
        g, codes.T, scales.T, interpret=True
    )
    assert bool(jnp.isfinite(new_scales_t).all())
    np.testing.assert_array_equal(np.asarray(upd_t), np.asarray(upd))


def test_transform_pallas_matches_jnp_path():
    """scale_by_lion_8bit(use_pallas=True) == (use_pallas=False) end-to-end."""
    import optax

    rng = np.random.RandomState(1)
    params = {
        "a": jnp.asarray(rng.randn(8, 32).astype(np.float32)),
        "b": jnp.asarray(rng.randn(64).astype(np.float32)),
    }
    mask = {"a": True, "b": False}  # quantize a, dense momentum for b
    g = jax.tree.map(lambda x: jnp.asarray(rng.randn(*x.shape).astype(np.float32) * 1e-3), params)

    tx_j = scale_by_lion_8bit(block_size=16, excluded_layer_mask=mask, use_pallas=False)
    tx_p = scale_by_lion_8bit(block_size=16, excluded_layer_mask=mask, use_pallas=True)
    s_j = tx_j.init(params)
    s_p = tx_p.init(params)
    for _ in range(3):
        u_j, s_j = tx_j.update(g, s_j)
        u_p, s_p = tx_p.update(g, s_p)
    for a, b in zip(jax.tree.leaves(u_j), jax.tree.leaves(u_p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(s_j.mu_quant["a"][0]), np.asarray(s_p.mu_quant["a"][0])
    )
    np.testing.assert_allclose(
        np.asarray(s_j.mu_quant["a"][1]), np.asarray(s_p.mu_quant["a"][1]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(s_j.mu_quant["b"]), np.asarray(s_p.mu_quant["b"]), atol=1e-7
    )


@pytest.mark.parametrize("n_blocks", [13, 257])  # 13 % 8 != 0 -> row padding
def test_wide_layout_ragged_block_count(n_blocks):
    """The opt-in full-lane (N/128, 128) layout; block counts that
    don't fill a whole 128-lane row must pad and slice back exactly."""
    bs = 16
    n = n_blocks * bs
    rng = np.random.RandomState(1)
    g = jnp.asarray(rng.randn(n).astype(np.float32) * 1e-3)
    mu = jnp.asarray(rng.randn(n).astype(np.float32) * 1e-4)
    blocks = mu.reshape(-1, bs)
    absmax = jnp.max(jnp.abs(blocks), axis=-1, keepdims=True)
    scales = 1 / jnp.where(absmax <= 0, 1.0, absmax)
    from stable_diffusion_training_tpu.ops.lion_kernel import _quantize

    codes = _quantize(blocks * scales)

    ref_upd, ref_codes, ref_scales = _reference_leaf_update(
        g, codes, scales, 0.9, 0.99, bs
    )
    out_upd, out_codes, out_scales = fused_lion8bit_update(
        g, codes, scales, b1=0.9, b2=0.99, interpret=True, rows_per_tile=8,
        layout="wide",
    )
    assert out_codes.shape == (n_blocks, bs)
    assert out_scales.shape == (n_blocks, 1)
    np.testing.assert_array_equal(np.asarray(out_upd), np.asarray(ref_upd))
    np.testing.assert_array_equal(np.asarray(out_codes), np.asarray(ref_codes))
    np.testing.assert_allclose(
        np.asarray(out_scales), np.asarray(ref_scales), rtol=1e-6
    )


@pytest.mark.parametrize("block_size", [8, 16])
@pytest.mark.parametrize("n", [2048, 29 * 1024])
def test_dense_layout_matches_optax(block_size, n):
    """The DENSE layout (codes = the grad's own (N/128, 128) bitcast view,
    scales (128/bs, N/128) j-interleaved) is bitwise-equal to the
    transposed/jnp paths: block membership is the same flat blocking, the
    roll-tree absmax is an exact max, and the one-hot MXU pick/expand are
    exact f32 selections."""
    from stable_diffusion_training_tpu.ops.lion_kernel import (
        _quantize,
        dense_layout_ok,
        fused_lion8bit_update_dense,
    )
    from stable_diffusion_training_tpu.optim.lion8bit import (
        _scales_dense_to_flat,
        _scales_flat_to_dense,
    )

    assert dense_layout_ok(n, block_size)
    rng = np.random.RandomState(0)
    g = jnp.asarray(rng.randn(n).astype(np.float32) * 1e-3)
    mu = jnp.asarray(rng.randn(n).astype(np.float32) * 1e-4)
    blocks = mu.reshape(-1, block_size)
    absmax = jnp.max(jnp.abs(blocks), axis=-1, keepdims=True)
    scales = 1 / jnp.where(absmax <= 0, 1.0, absmax)
    codes = _quantize(blocks * scales)

    ref_upd, ref_codes, ref_scales = _reference_leaf_update(
        g, codes, scales, 0.9, 0.99, block_size
    )

    gpr = 128 // block_size
    x = n // 128
    codes_d = codes.reshape(-1, 128)
    # r=8 forces a multi-tile grid even at these test sizes
    scales_d = _scales_flat_to_dense(scales.reshape(-1), x, gpr, r=8)
    out_upd, out_codes, out_scales = fused_lion8bit_update_dense(
        g, codes_d, scales_d, b1=0.9, b2=0.99, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out_upd), np.asarray(ref_upd))
    np.testing.assert_array_equal(
        np.asarray(out_codes.reshape(-1, block_size)), np.asarray(ref_codes)
    )
    np.testing.assert_allclose(
        np.asarray(_scales_dense_to_flat(out_scales, x)).reshape(-1, 1),
        np.asarray(ref_scales),
        rtol=1e-6,
    )


def test_transform_dense_leaf_pallas_matches_jnp():
    """End-to-end transform with a dense-eligible leaf (size % 1024 == 0):
    init must produce the dense layout and both paths must agree bitwise."""
    from stable_diffusion_training_tpu.optim.lion8bit import (
        momentum_to_reference_layout,
    )

    rng = np.random.RandomState(2)
    params = {
        "dense": jnp.asarray(rng.randn(32, 64).astype(np.float32)),  # 2048
        "odd": jnp.asarray(rng.randn(10, 16).astype(np.float32)),    # 160
    }
    g = jax.tree.map(
        lambda x: jnp.asarray(rng.randn(*x.shape).astype(np.float32) * 1e-3),
        params,
    )
    tx_j = scale_by_lion_8bit(
        block_size=16, excluded_layer_mask=True, use_pallas=False
    )
    tx_p = scale_by_lion_8bit(
        block_size=16, excluded_layer_mask=True, use_pallas=True
    )
    s_j = tx_j.init(params)
    s_p = tx_p.init(params)
    # dense-eligible leaf gets the dense storage; the other stays transposed
    assert s_j.mu_quant["dense"][0].shape == (16, 128)
    assert s_j.mu_quant["dense"][1].shape == (8, 16)
    assert s_j.mu_quant["odd"][0].shape == (16, 10)
    for _ in range(3):
        u_j, s_j = tx_j.update(g, s_j)
        u_p, s_p = tx_p.update(g, s_p)
    for a, b in zip(jax.tree.leaves(u_j), jax.tree.leaves(u_p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for k in params:
        cj, sj = momentum_to_reference_layout(s_j.mu_quant[k])
        cp, sp = momentum_to_reference_layout(s_p.mu_quant[k])
        np.testing.assert_array_equal(np.asarray(cj), np.asarray(cp))
        np.testing.assert_allclose(np.asarray(sj), np.asarray(sp), rtol=1e-6)


def test_dense_zero_block_guard():
    """All-zero blocks through the dense kernel engage the scale-1 guard."""
    from stable_diffusion_training_tpu.ops.lion_kernel import (
        fused_lion8bit_update_dense,
    )

    n = 2048
    g = jnp.zeros((n,), jnp.float32)
    codes_d = jnp.full((n // 128, 128), 3, jnp.int8)  # quantized zero
    scales_d = jnp.ones((8 * 2, 8), jnp.float32)  # tile-grouped, r=8
    upd, new_codes, new_scales = fused_lion8bit_update_dense(
        g, codes_d, scales_d, interpret=True
    )
    assert bool(jnp.isfinite(new_scales).all())
    assert bool(jnp.isfinite(upd).all())
    # matches the transposed layout bit-for-bit on the same state
    nb = n // 16
    upd_t, _, _ = fused_lion8bit_update_transposed(
        g, jnp.full((16, nb), 3, jnp.int8), jnp.ones((1, nb), jnp.float32),
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(upd), np.asarray(upd_t))


class TestFastCompander:
    """compander="fast": reassociated Lion math (folded 127^-5 constant,
    reciprocal-multiply dequant, shared-lerp). Pallas and jnp must agree
    bitwise WITHIN the fast mode (same op sequence both paths); fast vs
    exact differs only at rounding level (codes within one step, sign
    flips only where the Lion direction is at a rounding boundary)."""

    def _tree(self, seed=3):
        rng = np.random.RandomState(seed)
        params = {
            "dense": jnp.asarray(rng.randn(32, 64).astype(np.float32)),  # 2048
            "odd": jnp.asarray(rng.randn(10, 16).astype(np.float32)),    # 160
            "plain": jnp.asarray(rng.randn(24).astype(np.float32)),
        }
        mask = {"dense": True, "odd": True, "plain": False}
        g = jax.tree.map(
            lambda x: jnp.asarray(
                rng.randn(*x.shape).astype(np.float32) * 1e-3
            ),
            params,
        )
        return params, mask, g

    def test_fast_pallas_matches_fast_jnp_bitwise(self):
        params, mask, g = self._tree()
        tx_j = scale_by_lion_8bit(
            block_size=16, excluded_layer_mask=mask, use_pallas=False,
            compander="fast",
        )
        tx_p = scale_by_lion_8bit(
            block_size=16, excluded_layer_mask=mask, use_pallas=True,
            compander="fast",
        )
        s_j, s_p = tx_j.init(params), tx_p.init(params)
        for _ in range(3):
            u_j, s_j = tx_j.update(g, s_j)
            u_p, s_p = tx_p.update(g, s_p)
        for a, b in zip(jax.tree.leaves(u_j), jax.tree.leaves(u_p)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for k in ("dense", "odd"):
            np.testing.assert_array_equal(
                np.asarray(s_j.mu_quant[k][0]), np.asarray(s_p.mu_quant[k][0])
            )
            np.testing.assert_allclose(
                np.asarray(s_j.mu_quant[k][1]),
                np.asarray(s_p.mu_quant[k][1]),
                rtol=1e-6,
            )

    def test_fast_bucketed_matches_unbucketed(self):
        """Small-leaf bucketing composes with the fast compander bitwise."""
        params, mask, g = self._tree(seed=4)
        tx_a = scale_by_lion_8bit(
            block_size=16, excluded_layer_mask=mask, use_pallas=True,
            compander="fast", bucket_max_nb=0,
        )
        tx_b = scale_by_lion_8bit(
            block_size=16, excluded_layer_mask=mask, use_pallas=True,
            compander="fast", bucket_max_nb=65536,
        )
        s_a, s_b = tx_a.init(params), tx_b.init(params)
        for _ in range(2):
            u_a, s_a = tx_a.update(g, s_a)
            u_b, s_b = tx_b.update(g, s_b)
        for a, b in zip(jax.tree.leaves(u_a), jax.tree.leaves(u_b)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_fast_close_to_exact(self):
        """fast vs exact: update signs flip only at rounding boundaries
        (none on generic random data) and requantized codes move by at
        most one step."""
        params, mask, g = self._tree(seed=5)
        tx_e = scale_by_lion_8bit(
            block_size=16, excluded_layer_mask=mask, use_pallas=False,
            compander="exact",
        )
        tx_f = scale_by_lion_8bit(
            block_size=16, excluded_layer_mask=mask, use_pallas=False,
            compander="fast",
        )
        s_e, s_f = tx_e.init(params), tx_f.init(params)
        for _ in range(5):
            u_e, s_e = tx_e.update(g, s_e)
            u_f, s_f = tx_f.update(g, s_f)
        for a, b in zip(jax.tree.leaves(u_e), jax.tree.leaves(u_f)):
            a, b = np.asarray(a), np.asarray(b)
            flip_frac = float(np.mean(a != b))
            assert flip_frac <= 1e-3, flip_frac
        for k in ("dense", "odd"):
            ce = np.asarray(s_e.mu_quant[k][0], np.int32)
            cf = np.asarray(s_f.mu_quant[k][0], np.int32)
            assert int(np.max(np.abs(ce - cf))) <= 1

    def test_unknown_compander_raises(self):
        with pytest.raises(ValueError, match="compander"):
            scale_by_lion_8bit(compander="approximate")
        from stable_diffusion_training_tpu.ops.lion_kernel import (
            fused_lion8bit_update_dense,
        )
        with pytest.raises(ValueError, match="compander"):
            fused_lion8bit_update_dense(
                jnp.zeros((2048,)),
                jnp.zeros((16, 128), jnp.int8),
                jnp.ones((16, 8), jnp.float32),
                interpret=True,
                compander="approximate",
            )
