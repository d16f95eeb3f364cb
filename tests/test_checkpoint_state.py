"""Orbax full-state checkpoint round-trip: params + quantized optimizer
momentum + EMA + RNG (fixes the reference's resume gap, SURVEY.md §5.4)."""

import jax
import jax.numpy as jnp
import numpy as np

from stable_diffusion_training_tpu.train.checkpoint import (
    restore_train_state,
    save_train_state,
)


def test_full_state_roundtrip(tmp_path):
    from flax.training import train_state

    from stable_diffusion_training_tpu.optim import create_mask, lion_8bit

    params = {
        "dense": {"kernel": jnp.ones((4, 16)) * 0.5, "bias": jnp.zeros((16,))}
    }
    mask = create_mask(params, ["bias"])
    tx = lion_8bit(1e-2, block_size=16, excluded_layer_mask=mask, mask=mask)
    state = train_state.TrainState.create(
        apply_fn=lambda *a, **k: None, params=params, tx=tx
    )
    # advance one step so momentum is non-trivial
    g = jax.tree.map(jnp.ones_like, params)
    state = state.apply_gradients(grads=g)
    ema = jax.tree.map(lambda x: x * 2.0, params)
    rng = jax.random.PRNGKey(7)

    ckpt_dir = str(tmp_path / "full_state")
    save_train_state(
        ckpt_dir, state, state, ema, None, rng,
        step_metadata={"chunk_steps": 3},
    )

    template = {
        "unet_state": state,
        "text_encoder_state": state,
        "unet_ema_params": ema,
        "text_encoder_ema_params": {},
        "train_rng": rng,
    }
    restored = restore_train_state(ckpt_dir, template)

    for a, b in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(restored["unet_state"].params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # quantized momentum codes restored exactly
    lion_state = state.opt_state[0]
    restored_lion = restored["unet_state"].opt_state[0]
    np.testing.assert_array_equal(
        np.asarray(lion_state.mu_quant["dense"]["kernel"][0]),
        np.asarray(restored_lion.mu_quant["dense"]["kernel"][0]),
    )
    np.testing.assert_array_equal(
        np.asarray(restored["train_rng"]), np.asarray(rng)
    )
    for a, b in zip(
        jax.tree.leaves(ema), jax.tree.leaves(restored["unet_ema_params"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_legacy_transposed_momentum_checkpoint_migrates(tmp_path):
    """A full-state checkpoint written with the legacy block-TRANSPOSED
    momentum layout restores into the canonical (dense-where-eligible)
    template via the migration fallback — values exact."""
    from flax.training import train_state

    from stable_diffusion_training_tpu.optim import lion_8bit
    from stable_diffusion_training_tpu.optim.lion8bit import (
        _is_dense,
        momentum_to_reference_layout,
    )

    params = {"w": jnp.asarray(np.linspace(-1, 1, 2048, dtype=np.float32)
                               .reshape(32, 64))}
    tx = lion_8bit(1e-2, block_size=16, excluded_layer_mask=True)
    state = train_state.TrainState.create(
        apply_fn=lambda *a, **k: None, params=params, tx=tx
    )
    # varied grads so codes/scales differ across blocks (a uniform tree
    # would make any relayout bug invisible to the value comparison)
    g = {"w": jnp.asarray(
        np.random.RandomState(3).randn(32, 64).astype(np.float32)
    )}
    state = state.apply_gradients(grads=g)
    lion_state = state.opt_state[0]
    codes_d, scales_d = lion_state.mu_quant["w"]
    assert _is_dense(codes_d, scales_d)

    # write a checkpoint whose momentum is in the LEGACY transposed layout
    ref_codes, ref_scales = momentum_to_reference_layout((codes_d, scales_d))
    legacy_mu = (jnp.transpose(ref_codes), jnp.transpose(ref_scales))
    legacy_state = state.replace(
        opt_state=(
            lion_state._replace(mu_quant={"w": legacy_mu}),
        ) + state.opt_state[1:]
    )
    rng = jax.random.PRNGKey(0)
    ckpt_dir = str(tmp_path / "legacy_state")
    save_train_state(ckpt_dir, legacy_state, legacy_state, {}, None, rng)

    template = {
        "unet_state": state,
        "text_encoder_state": state,
        "unet_ema_params": {},
        "text_encoder_ema_params": {},
        "train_rng": rng,
    }
    restored = restore_train_state(ckpt_dir, template)
    r_codes, r_scales = restored["unet_state"].opt_state[0].mu_quant["w"]
    np.testing.assert_array_equal(np.asarray(r_codes), np.asarray(codes_d))
    np.testing.assert_array_equal(np.asarray(r_scales), np.asarray(scales_d))


def test_legacy_narrow_momentum_checkpoint_migrates(tmp_path):
    """A full-state checkpoint written with the ORIGINAL narrow
    reference-order momentum storage — codes ``(n_blocks, block_size)``,
    scales ``(n_blocks, 1)`` — restores into the canonical dense template.

    Regression test for the ``_is_dense`` misclassification (scales
    ``(nb, 1)`` has ``shape[0] != 1`` and was treated as dense, so
    ``momentum_to_canonical_layout`` returned it unmigrated and restore
    raised ValueError, making pre-dense-era checkpoints unrestorable)."""
    from flax.training import train_state

    from stable_diffusion_training_tpu.optim import lion_8bit
    from stable_diffusion_training_tpu.optim.lion8bit import (
        _is_dense,
        momentum_to_reference_layout,
    )

    params = {"w": jnp.asarray(np.linspace(-1, 1, 2048, dtype=np.float32)
                               .reshape(32, 64))}
    tx = lion_8bit(1e-2, block_size=16, excluded_layer_mask=True)
    state = train_state.TrainState.create(
        apply_fn=lambda *a, **k: None, params=params, tx=tx
    )
    g = {"w": jnp.asarray(
        np.random.RandomState(9).randn(32, 64).astype(np.float32)
    )}
    state = state.apply_gradients(grads=g)
    lion_state = state.opt_state[0]
    codes_d, scales_d = lion_state.mu_quant["w"]
    assert _is_dense(codes_d, scales_d)

    # the reference view IS the narrow storage: (nb, bs) codes, (nb, 1) scales
    narrow_mu = momentum_to_reference_layout((codes_d, scales_d))
    assert narrow_mu[0].shape == (128, 16) and narrow_mu[1].shape == (128, 1)
    assert not _is_dense(*narrow_mu)  # the old check called this dense
    legacy_state = state.replace(
        opt_state=(
            lion_state._replace(mu_quant={"w": narrow_mu}),
        ) + state.opt_state[1:]
    )
    rng = jax.random.PRNGKey(0)
    ckpt_dir = str(tmp_path / "narrow_state")
    save_train_state(ckpt_dir, legacy_state, legacy_state, {}, None, rng)

    template = {
        "unet_state": state,
        "text_encoder_state": state,
        "unet_ema_params": {},
        "text_encoder_ema_params": {},
        "train_rng": rng,
    }
    restored = restore_train_state(ckpt_dir, template)
    r_codes, r_scales = restored["unet_state"].opt_state[0].mu_quant["w"]
    np.testing.assert_array_equal(np.asarray(r_codes), np.asarray(codes_d))
    np.testing.assert_array_equal(np.asarray(r_scales), np.asarray(scales_d))


def test_narrow_momentum_migrates_to_transposed_when_not_dense_eligible():
    """Narrow leaves whose size is not a multiple of 1024 migrate to the
    block-TRANSPOSED canonical layout, values exact."""
    from stable_diffusion_training_tpu.optim.lion8bit import (
        _dense_ok,
        _momentum_layout,
        momentum_to_canonical_layout,
        momentum_to_reference_layout,
    )

    nb, bs = 32, 16  # 512 elements: not dense-eligible
    assert not _dense_ok(nb * bs, bs)
    rs = np.random.RandomState(11)
    narrow = (
        jnp.asarray(rs.randint(-127, 128, size=(nb, bs), dtype=np.int8)),
        jnp.asarray(rs.rand(nb, 1).astype(np.float32) + 0.5),
    )
    canon = momentum_to_canonical_layout(narrow)
    assert _momentum_layout(*canon) == "transposed"
    assert canon[0].shape == (bs, nb) and canon[1].shape == (1, nb)
    back_codes, back_scales = momentum_to_reference_layout(canon)
    np.testing.assert_array_equal(np.asarray(back_codes), np.asarray(narrow[0]))
    np.testing.assert_array_equal(np.asarray(back_scales), np.asarray(narrow[1]))


def test_single_block_narrow_leaf_disambiguates_and_migrates():
    """A one-block leaf has (1, 1) scales in BOTH non-dense layouts; the
    codes shape disambiguates (narrow (1, bs) vs transposed (bs, 1)) so
    legacy narrow checkpoints with block_size-sized leaves still migrate."""
    from stable_diffusion_training_tpu.optim.lion8bit import (
        _momentum_layout,
        momentum_to_canonical_layout,
        momentum_to_reference_layout,
    )

    rs = np.random.RandomState(2)
    codes_n = jnp.asarray(rs.randint(-127, 128, size=(1, 16), dtype=np.int8))
    scales_n = jnp.asarray(rs.rand(1, 1).astype(np.float32) + 0.5)
    assert _momentum_layout(codes_n, scales_n) == "narrow"
    canon = momentum_to_canonical_layout((codes_n, scales_n))
    assert _momentum_layout(*canon) == "transposed"
    assert canon[0].shape == (16, 1) and canon[1].shape == (1, 1)
    back_c, back_s = momentum_to_reference_layout(canon)
    # reference view of a transposed 1-block leaf is the narrow storage
    np.testing.assert_array_equal(np.asarray(back_c), np.asarray(codes_n))
    np.testing.assert_array_equal(np.asarray(back_s), np.asarray(scales_n))
    # a genuine transposed (bs, 1) leaf keeps its classification
    assert _momentum_layout(jnp.transpose(codes_n), scales_n) == "transposed"


def test_dense_retile_migration_across_fsdp_factor(tmp_path):
    """A checkpoint written with FSDP-aligned scales tiles
    (dense_fsdp_factor > 1) restores onto a canonical (factor-1) template
    and vice versa — the dense->dense re-tile path, values exact."""
    from flax.training import train_state

    from stable_diffusion_training_tpu.optim import lion_8bit

    params = {"w": jnp.asarray(np.linspace(-1, 1, 2048 * 4, dtype=np.float32)
                               .reshape(64, 128))}
    g = {"w": jnp.asarray(
        np.random.RandomState(13).randn(64, 128).astype(np.float32)
    )}

    def build(factor):
        tx = lion_8bit(1e-2, block_size=16, excluded_layer_mask=True,
                       dense_fsdp_factor=factor)
        st = train_state.TrainState.create(
            apply_fn=lambda *a, **k: None, params=params, tx=tx
        )
        return st.apply_gradients(grads=g)

    st_fsdp = build(4)   # x=64 -> r=16 tiles (64/4)
    st_plain = build(1)  # x=64 -> r=64 tiles
    mu_f = st_fsdp.opt_state[0].mu_quant["w"]
    mu_p = st_plain.opt_state[0].mu_quant["w"]
    assert mu_f[1].shape != mu_p[1].shape  # genuinely different groupings

    ckpt_dir = str(tmp_path / "fsdp_state")
    rng = jax.random.PRNGKey(0)
    save_train_state(ckpt_dir, st_fsdp, st_fsdp, {}, None, rng)
    restored = restore_train_state(ckpt_dir, {
        "unet_state": st_plain,
        "text_encoder_state": st_plain,
        "unet_ema_params": {},
        "text_encoder_ema_params": {},
        "train_rng": rng,
    })
    r_codes, r_scales = restored["unet_state"].opt_state[0].mu_quant["w"]
    np.testing.assert_array_equal(np.asarray(r_codes), np.asarray(mu_p[0]))
    np.testing.assert_array_equal(np.asarray(r_scales), np.asarray(mu_p[1]))
