"""Golden fp32 regression: the full train step (all noise options + EMA +
8-bit Lion) on fixed seeds must reproduce a recorded loss trajectory.

This is the framework's analogue of BASELINE config 1 ("single training
step, fp32, CPU"): any change to the rng split tree, noise math, scheduler
tables, BOS/EOS stripping, model numerics, or optimizer chain shifts these
values and fails loudly. Values recorded on jax 0.9.0 / CPU."""

import jax
import numpy as np
import pytest

from stable_diffusion_training_tpu.data.memory import synthetic_batch
from stable_diffusion_training_tpu.train import (
    on_device_model_training_state,
    train_step,
)
from test_train import clone, make_config

GOLDEN_LOSSES = [0.19721004, 0.36241397, 0.26471099]


@pytest.mark.slow
def test_fp32_train_step_golden_trajectory():
    cfg = make_config()
    states = on_device_model_training_state(cfg)
    u, t, ue, te, fv, fs, _ = clone(states)

    rng = jax.random.PRNGKey(42)
    batch = synthetic_batch(8, (32, 32), concat_count=3, vocab_size=1000, seed=7)
    step = jax.jit(
        train_step,
        donate_argnums=(0, 1, 2, 3),
        static_argnames=(
            "strip_bos_eos_token", "offset_noise_magnitude",
            "min_snr_gamma_magnitude", "perturbation_noise_magnitude",
            "ema_rate",
        ),
    )
    losses = []
    for _ in range(len(GOLDEN_LOSSES)):
        u, t, ue, te, m, rng = step(
            u, t, ue, te, batch, rng, fv, fs,
            strip_bos_eos_token=True,
            offset_noise_magnitude=0.1,
            min_snr_gamma_magnitude=5.0,
            perturbation_noise_magnitude=0.1,
            ema_rate=0.999,
        )
        losses.append(float(m["loss"]))
    np.testing.assert_allclose(losses, GOLDEN_LOSSES, rtol=2e-5)


@pytest.mark.slow
def test_fast_compander_loss_curve_matches_exact():
    """Training equivalence of compander="fast" (opt-in reassociated Lion
    dequant, NOT bitwise vs exact): a multi-step loss curve on the tiny
    model must track the exact compander's curve closely. The per-element
    momentum difference is pure rounding (ulps, bounded by the ±1-code
    closeness test in test_lion_kernel); across steps it can drift sign
    updates only where a Lion direction sits exactly on a rounding
    boundary, so the loss trajectories stay within noise of each other."""
    losses = {}
    for compander in ("exact", "fast"):
        cfg = make_config(lion_compander=compander)
        states = on_device_model_training_state(cfg)
        u, t, ue, te, fv, fs, _ = clone(states)
        rng = jax.random.PRNGKey(42)
        batch = synthetic_batch(
            8, (32, 32), concat_count=3, vocab_size=1000, seed=7
        )
        step = jax.jit(
            train_step,
            donate_argnums=(0, 1, 2, 3),
            static_argnames=(
                "strip_bos_eos_token", "offset_noise_magnitude",
                "min_snr_gamma_magnitude", "perturbation_noise_magnitude",
                "ema_rate",
            ),
        )
        curve = []
        for _ in range(6):
            u, t, ue, te, m, rng = step(
                u, t, ue, te, batch, rng, fv, fs,
                strip_bos_eos_token=True,
                offset_noise_magnitude=0.1,
                min_snr_gamma_magnitude=5.0,
                perturbation_noise_magnitude=0.1,
                ema_rate=0.999,
            )
            curve.append(float(m["loss"]))
        losses[compander] = curve
    np.testing.assert_allclose(losses["fast"], losses["exact"], rtol=1e-3)
    # both descend the same way: first-step losses are computed from
    # identical initial params, so they must agree to float noise
    assert abs(losses["fast"][0] - losses["exact"][0]) < 1e-6
