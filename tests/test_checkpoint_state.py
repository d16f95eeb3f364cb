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
