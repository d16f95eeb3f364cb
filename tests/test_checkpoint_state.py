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
