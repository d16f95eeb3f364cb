"""8-bit Lion tests: quantizer round-trip, zero-crossing, equivalence with
optax.lion when quantization is off (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from stable_diffusion_training_tpu.optim import (
    create_mask,
    lion_8bit,
    scale_by_lion_8bit,
)


def _all_false_mask(tree):
    return jax.tree_util.tree_map(lambda _: False, tree)


def _all_true_mask(tree):
    return jax.tree_util.tree_map(lambda _: True, tree)


def test_unquantized_matches_optax_lion():
    """With quantization disabled on all leaves, the transform must follow
    optax.lion's update direction exactly (same b1/b2 interpolation + sign)."""
    params = {"w": jnp.linspace(-1, 1, 32).reshape(4, 8), "b": jnp.ones((8,))}
    grads = {"w": jnp.linspace(1, -1, 32).reshape(4, 8), "b": -jnp.ones((8,))}

    ours = scale_by_lion_8bit(excluded_layer_mask=_all_false_mask(params))
    ref = optax.scale_by_lion(b1=0.9, b2=0.99)

    s_ours = ours.init(params)
    s_ref = ref.init(params)
    for _ in range(3):
        u_ours, s_ours = ours.update(grads, s_ours)
        u_ref, s_ref = ref.update(grads, s_ref)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(u_ours[k]), np.asarray(u_ref[k]), atol=1e-6
        )


def test_quantizer_roundtrip_accuracy():
    """Reference-numerics check: zero momentum encodes to code 3 (the
    zero-crossing offset shifts 0 into the positive compander branch) and
    dequantizes back to ~3.6e-9 — effectively zero for bf16/f32 training."""
    tx = scale_by_lion_8bit(block_size=16, excluded_layer_mask=True)
    x = jnp.linspace(-1, 1, 16 * 8)
    params = {"w": x}
    state = tx.init(params)
    codes, scales = state.mu_quant["w"]
    assert codes.dtype == jnp.int8
    # block-transposed layout: block dim on sublanes, block index on lanes
    assert codes.shape == (16, 8)
    assert scales.shape == (1, 8)
    # zero momentum -> code 3 everywhere (reference lion_quant.py:49-59 math)
    assert int(jnp.min(codes)) == 3 and int(jnp.max(codes)) == 3


def test_zero_crossing():
    """Dequantized zero-momentum must be < 4e-9 in magnitude (the documented
    zero-crossing property of the 3.7398995e-09 offset)."""
    from stable_diffusion_training_tpu.optim.lion8bit import _ZERO_CROSSING_OFFSET

    code3 = (jnp.int8(3) / 127) ** 5 - _ZERO_CROSSING_OFFSET
    assert abs(float(code3)) < 4e-9


def test_roundtrip_error_bound():
    """Full-range round-trip error of the compander stays under 2% absolute
    for post-scaling values in [-1, 1]."""
    tx = scale_by_lion_8bit(block_size=64, excluded_layer_mask=_all_true_mask({"w": 0}))
    ref = optax.scale_by_lion(b1=0.0, b2=0.0)  # b2=0: momentum = grad exactly
    x = {"w": jnp.linspace(-0.9, 0.9, 128)}
    ours = scale_by_lion_8bit(
        b1=0.0, b2=0.0, block_size=64, excluded_layer_mask=_all_true_mask(x)
    )
    s = ours.init(jax.tree_util.tree_map(jnp.zeros_like, x))
    _, s = ours.update(x, s)  # momentum := x, quantized
    codes, scales = s.mu_quant["w"]
    deq = ((codes.astype(jnp.float32) / 127) ** 5 - 3.7398995e-09) / scales
    # codes are block-transposed (bs, nb): transpose back before flattening
    np.testing.assert_allclose(
        np.asarray(deq.T.reshape(-1)), np.asarray(x["w"]), atol=0.02
    )
    del tx, ref


def test_quantized_momentum_tracks_dense():
    """Quantized-momentum Lion should approximate dense Lion closely over a
    few steps with well-scaled gradients."""
    key = jax.random.PRNGKey(0)
    params = {"w": jax.random.normal(key, (64,)) * 0.1}
    ours = scale_by_lion_8bit(block_size=16, excluded_layer_mask=_all_true_mask(params))
    ref = optax.scale_by_lion(b1=0.9, b2=0.99)
    s_ours, s_ref = ours.init(params), ref.init(params)
    agree = 0
    total = 0
    for i in range(5):
        g = {"w": jax.random.normal(jax.random.PRNGKey(i + 1), (64,)) * 0.1}
        u_ours, s_ours = ours.update(g, s_ours)
        u_ref, s_ref = ref.update(g, s_ref)
        agree += int(jnp.sum(jnp.sign(u_ours["w"]) == jnp.sign(u_ref["w"])))
        total += 64
    assert agree / total > 0.95  # sign agreement despite 8-bit momentum


def test_block_size_divisibility_requirement():
    """Non-divisible parameter sizes must fail loudly (reference behavior:
    reshape error; excluded layers carry dense momentum instead)."""
    tx = scale_by_lion_8bit(block_size=16, excluded_layer_mask=True)
    with pytest.raises(Exception):
        tx.init({"w": jnp.zeros((10,))})


def test_full_lion_8bit_chain_applies_weight_decay_and_lr():
    params = {"w": jnp.ones((16,)), "bias": jnp.ones((16,))}
    wd_mask = create_mask(params, ["bias"])
    quant_mask = create_mask(params, ["bias"])
    opt = lion_8bit(
        learning_rate=1e-2,
        weight_decay=0.1,
        mask=wd_mask,
        excluded_layer_mask=quant_mask,
        block_size=16,
    )
    state = opt.init(params)
    grads = {"w": jnp.full((16,), 0.5), "bias": jnp.full((16,), 0.5)}
    updates, _ = opt.update(grads, state, params)
    # w: -(lr * (sign + wd*param)) = -(0.01 * (1 + 0.1)) = -0.011
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.011, rtol=1e-5)
    # bias: no weight decay -> -(0.01 * 1)
    np.testing.assert_allclose(np.asarray(updates["bias"]), -0.01, rtol=1e-5)


def test_create_mask_path_matching():
    tree = {
        "down": {"bias": jnp.zeros(2), "kernel": jnp.zeros(2)},
        "time_embedding": {"dense": {"kernel": jnp.zeros(2)}},
    }
    mask = create_mask(tree, ["bias", "time_embedding"])
    assert mask["down"]["bias"] is False
    assert mask["down"]["kernel"] is True
    assert mask["time_embedding"]["dense"]["kernel"] is False


def test_small_leaf_bucketing_bitwise():
    """Bucketed transposed leaves (one packed kernel dispatch for many
    small leaves) update bitwise-identically to per-leaf dispatches AND to
    the jnp path — block membership per leaf is unchanged by the concat."""
    import numpy as np

    from stable_diffusion_training_tpu.optim.lion8bit import scale_by_lion_8bit

    rs = np.random.RandomState(5)
    # mixed tree: several small transposed leaves (sizes % 1024 != 0),
    # several dense leaves with DIFFERENT canonical tile heights (the
    # dense pack regroups scales at the packed width and back per leaf),
    # and an excluded (unquantized) leaf
    params = {
        "a": jnp.asarray(rs.randn(3, 3, 4, 8).astype(np.float32)),   # 288
        "b": jnp.asarray(rs.randn(10, 16).astype(np.float32)),       # 160
        "c": jnp.asarray(rs.randn(48).astype(np.float32)),           # 48
        "dense": jnp.asarray(rs.randn(8, 128).astype(np.float32)),   # x=8
        "dense2": jnp.asarray(rs.randn(32, 96).astype(np.float32)),  # x=24
        "dense3": jnp.asarray(rs.randn(2048).astype(np.float32)),    # x=16
        "skip": jnp.asarray(rs.randn(5).astype(np.float32)),
    }
    mask = {"a": True, "b": True, "c": True, "dense": True,
            "dense2": True, "dense3": True, "skip": False}
    g1 = jax.tree_util.tree_map(
        lambda x: jnp.asarray(rs.randn(*x.shape).astype(np.float32)), params
    )
    g2 = jax.tree_util.tree_map(
        lambda x: jnp.asarray(rs.randn(*x.shape).astype(np.float32)), params
    )

    def run(**kw):
        tx = scale_by_lion_8bit(
            block_size=16, excluded_layer_mask=mask, **kw
        )
        s = tx.init(params)
        u1, s = tx.update(g1, s)
        u2, s = tx.update(g2, s)
        return u1, u2, s

    u1b, u2b, sb = run(use_pallas=True, bucket_max_nb=65536)
    u1p, u2p, sp = run(use_pallas=True, bucket_max_nb=0)
    for a, b in zip(jax.tree_util.tree_leaves((u1b, u2b, sb.mu_quant)),
                    jax.tree_util.tree_leaves((u1p, u2p, sp.mu_quant))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestReferenceMomentumLayout:
    """momentum_layout="reference" — the strict-faithful benchmark anchor
    (VERDICT round-4 item 4): every quantized leaf stored in the reference's
    own (n_blocks, block_size) codes + (n_blocks, 1) scales order
    (/root/reference/lion_quant.py:66-92), jnp path + exact compander only.
    Block membership and math are identical to the auto layouts, so update
    values must agree with the default jnp path."""

    def _setup(self):
        rs = np.random.RandomState(7)
        params = {
            "dense": jnp.asarray(rs.randn(32, 64).astype(np.float32)),
            "odd": jnp.asarray(rs.randn(10, 16).astype(np.float32)),
        }
        mask = {"dense": True, "odd": True}
        g1 = jax.tree_util.tree_map(
            lambda x: jnp.asarray(rs.randn(*x.shape).astype(np.float32)),
            params,
        )
        g2 = jax.tree_util.tree_map(
            lambda x: jnp.asarray(rs.randn(*x.shape).astype(np.float32)),
            params,
        )
        return params, mask, g1, g2

    def test_reference_layout_shapes(self):
        params, mask, _, _ = self._setup()
        tx = scale_by_lion_8bit(
            block_size=16, excluded_layer_mask=mask,
            momentum_layout="reference",
        )
        s = tx.init(params)
        codes, scales = s.mu_quant["dense"]
        assert codes.shape == (2048 // 16, 16)
        assert scales.shape == (2048 // 16, 1)
        codes, scales = s.mu_quant["odd"]
        assert codes.shape == (160 // 16, 16)
        assert scales.shape == (160 // 16, 1)

    def test_reference_layout_values_match_auto(self):
        params, mask, g1, g2 = self._setup()

        def run(**kw):
            tx = scale_by_lion_8bit(
                block_size=16, excluded_layer_mask=mask, use_pallas=False,
                **kw,
            )
            s = tx.init(params)
            u1, s = tx.update(g1, s)
            u2, s = tx.update(g2, s)
            return u1, u2, s

        u1r, u2r, sr = run(momentum_layout="reference")
        u1a, u2a, sa = run()
        for k in params:
            np.testing.assert_array_equal(np.asarray(u1r[k]), np.asarray(u1a[k]))
            np.testing.assert_array_equal(np.asarray(u2r[k]), np.asarray(u2a[k]))
            # same momentum values through the reference-view relayout
            from stable_diffusion_training_tpu.optim.lion8bit import (
                momentum_to_reference_layout,
            )

            cr, sr_ = momentum_to_reference_layout(sr.mu_quant[k])
            ca, sa_ = momentum_to_reference_layout(sa.mu_quant[k])
            np.testing.assert_array_equal(np.asarray(cr), np.asarray(ca))
            np.testing.assert_allclose(
                np.asarray(sr_), np.asarray(sa_), rtol=1e-6
            )

    def test_reference_layout_guards(self):
        with pytest.raises(ValueError, match="strict-faithful"):
            scale_by_lion_8bit(momentum_layout="reference", use_pallas=True)
        with pytest.raises(ValueError, match="strict-faithful"):
            scale_by_lion_8bit(momentum_layout="reference", compander="fast")
        with pytest.raises(ValueError, match="momentum_layout"):
            scale_by_lion_8bit(momentum_layout="narrow")

    def test_fast_compander_rejects_narrow_momentum_state(self):
        """A narrow (n_blocks, block_size) momentum leaf reaching the fast
        compander's dequantize must fail loudly: the transposed-branch
        fallthrough would silently scramble every momentum value.
        Construction guards + restore migration normally prevent this; the
        raise is the backstop for un-migrated states handed in directly."""
        params = {"w": jnp.ones((4, 32), jnp.float32)}
        narrow_state = scale_by_lion_8bit(
            excluded_layer_mask=True, momentum_layout="reference"
        ).init(params)
        fast_tx = scale_by_lion_8bit(excluded_layer_mask=True,
                                     compander="fast")
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        with pytest.raises(ValueError, match="narrow"):
            fast_tx.update(grads, narrow_state, params)
