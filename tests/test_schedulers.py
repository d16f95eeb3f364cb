"""Scheduler unit tests: beta schedules, zero-terminal-SNR, add_noise /
get_velocity / step against analytic formulas (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_training_tpu.diffusion import (
    CommonSchedulerState,
    DDIMScheduler,
    DDPMScheduler,
    add_noise,
    get_velocity,
    make_beta_schedule,
    rescale_zero_terminal_snr,
)

SD_BETA_KW = dict(beta_start=0.00085, beta_end=0.012, num_train_timesteps=1000)


def test_linear_schedule_endpoints():
    betas = make_beta_schedule("linear", 1000, 0.0001, 0.02)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 0.0001, rtol=1e-6)
    np.testing.assert_allclose(betas[-1], 0.02, rtol=1e-6)


def test_scaled_linear_schedule():
    betas = make_beta_schedule("scaled_linear", 1000, 0.00085, 0.012)
    expected = (
        np.linspace(0.00085**0.5, 0.012**0.5, 1000, dtype=np.float32) ** 2
    )
    np.testing.assert_allclose(np.asarray(betas), expected, rtol=1e-6)


def test_squaredcos_matches_scalar_loop():
    import math

    betas = make_beta_schedule("squaredcos_cap_v2", 50, 0.0, 0.0)

    def alpha_bar(t):
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    expected = [
        min(1 - alpha_bar((i + 1) / 50) / alpha_bar(i / 50), 0.999) for i in range(50)
    ]
    np.testing.assert_allclose(np.asarray(betas), expected, rtol=1e-6)


def test_zero_terminal_snr():
    """After rescale, the last alphas_cumprod must be ~0 (zero SNR) and the
    first sqrt(alphas_cumprod) preserved (arXiv 2305.08891 Algorithm 1)."""
    betas = make_beta_schedule("scaled_linear", 1000, 0.00085, 0.012)
    rescaled = rescale_zero_terminal_snr(betas)
    ac_orig = jnp.cumprod(1 - betas)
    ac_new = jnp.cumprod(1 - rescaled)
    assert float(ac_new[-1]) == pytest.approx(0.0, abs=1e-10)
    np.testing.assert_allclose(
        float(jnp.sqrt(ac_new[0])), float(jnp.sqrt(ac_orig[0])), rtol=1e-5
    )


def test_zero_snr_schedule_name():
    betas = make_beta_schedule("zero_snr_scaled_linear", 1000, 0.00085, 0.012)
    ac = jnp.cumprod(1 - betas)
    assert float(ac[-1]) == pytest.approx(0.0, abs=1e-10)


def test_add_noise_analytic():
    sched = DDPMScheduler(beta_schedule="scaled_linear", **SD_BETA_KW)
    state = sched.create_state()
    x0 = jnp.ones((2, 4, 8, 8))
    noise = jnp.full((2, 4, 8, 8), 0.5)
    t = jnp.array([10, 500])
    out = sched.add_noise(state, x0, noise, t)
    ac = state.common.alphas_cumprod
    for b, ti in enumerate([10, 500]):
        expected = float(ac[ti] ** 0.5 * 1.0 + (1 - ac[ti]) ** 0.5 * 0.5)
        np.testing.assert_allclose(np.asarray(out[b]), expected, rtol=1e-5)


def test_get_velocity_analytic():
    sched = DDPMScheduler(beta_schedule="scaled_linear", **SD_BETA_KW)
    state = sched.create_state()
    x0 = jnp.ones((1, 4, 8, 8))
    noise = jnp.full((1, 4, 8, 8), 2.0)
    t = jnp.array([100])
    v = sched.get_velocity(state, x0, noise, t)
    ac = float(state.common.alphas_cumprod[100])
    expected = ac**0.5 * 2.0 - (1 - ac) ** 0.5 * 1.0
    np.testing.assert_allclose(np.asarray(v), expected, rtol=1e-5)


def test_add_noise_roundtrip_snr():
    """x_t at t=0 should be nearly x0; at terminal zero-SNR step nearly noise."""
    sched = DDPMScheduler(
        beta_schedule="zero_snr_scaled_linear", prediction_type="v_prediction", **SD_BETA_KW
    )
    state = sched.create_state()
    x0 = jnp.ones((1, 4, 4, 4))
    noise = -jnp.ones((1, 4, 4, 4))
    early = sched.add_noise(state, x0, noise, jnp.array([0]))
    late = sched.add_noise(state, x0, noise, jnp.array([999]))
    assert float(jnp.mean(early)) > 0.9
    np.testing.assert_allclose(np.asarray(late), np.asarray(noise), atol=1e-4)


def test_ddpm_step_epsilon_reconstruction():
    """With model_output == true noise, pred x0 must equal true x0."""
    sched = DDPMScheduler(beta_schedule="scaled_linear", clip_sample=False, **SD_BETA_KW)
    state = sched.create_state()
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (1, 4, 8, 8)) * 0.1
    noise = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8, 8))
    t = 500
    xt = sched.add_noise(state, x0, noise, jnp.array([t]))
    out = sched.step(state, noise, t, xt, key=jax.random.PRNGKey(2))
    ac = state.common.alphas_cumprod
    # reconstruct mu_t manually (formula 7 of DDPM paper)
    pred_x0 = (xt - (1 - ac[t]) ** 0.5 * noise) / ac[t] ** 0.5
    np.testing.assert_allclose(np.asarray(pred_x0), np.asarray(x0), atol=1e-4)
    assert out.prev_sample.shape == xt.shape


def test_ddim_step_deterministic_full_denoise():
    """DDIM with eta=0: one giant step from t=999 with perfect eps prediction
    recovers x0 up to the alpha contraction."""
    sched = DDIMScheduler(
        beta_schedule="scaled_linear", set_alpha_to_one=True, **SD_BETA_KW
    )
    state = sched.create_state()
    state = sched.set_timesteps(state, num_inference_steps=1)
    x0 = jnp.ones((1, 4, 8, 8)) * 0.3
    noise = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8))
    t = int(state.timesteps[0])
    xt = sched.add_noise(state, x0, noise, jnp.array([t]))
    out = sched.step(state, noise, t, xt)
    np.testing.assert_allclose(np.asarray(out.prev_sample), np.asarray(x0), atol=1e-3)


def test_ddim_v_prediction_step():
    sched = DDIMScheduler(
        beta_schedule="scaled_linear", prediction_type="v_prediction", **SD_BETA_KW
    )
    state = sched.create_state()
    state = sched.set_timesteps(state, num_inference_steps=50)
    x0 = jnp.full((1, 4, 8, 8), 0.2)
    noise = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8))
    t = int(state.timesteps[0])
    xt = sched.add_noise(state, x0, noise, jnp.array([t]))
    v = sched.get_velocity(state, x0, noise, jnp.array([t]))
    out = sched.step(state, v, t, xt)
    # with the exact v target, pred_x0 == x0, so stepping moves toward x0
    ac = state.common.alphas_cumprod
    prev_t = t - 1000 // 50
    expected_x0_coeff = float(ac[prev_t] ** 0.5)
    assert out.prev_sample.shape == xt.shape
    pred_x0 = (
        float(ac[t]) ** 0.5 * xt - float(1 - ac[t]) ** 0.5 * v
    )
    np.testing.assert_allclose(np.asarray(pred_x0), np.asarray(x0), atol=1e-4)
    del expected_x0_coeff


def test_set_timesteps_spacing():
    sched = DDIMScheduler(steps_offset=1, **SD_BETA_KW, beta_schedule="scaled_linear")
    state = sched.create_state()
    state = sched.set_timesteps(state, 50)
    ts = np.asarray(state.timesteps)
    assert len(ts) == 50
    assert ts[0] == 981  # (49*20) + offset 1
    assert np.all(np.diff(ts) == -20)


def test_config_roundtrip(tmp_path):
    sched = DDPMScheduler(
        beta_schedule="zero_snr_scaled_linear",
        prediction_type="v_prediction",
        **SD_BETA_KW,
    )
    sched.save_pretrained(str(tmp_path / "scheduler"))
    loaded, state = DDPMScheduler.from_pretrained(str(tmp_path), subfolder="scheduler")
    assert loaded.config.beta_schedule == "zero_snr_scaled_linear"
    assert loaded.config.prediction_type == "v_prediction"
    assert loaded.config.num_train_timesteps == 1000
    np.testing.assert_allclose(
        np.asarray(state.common.betas),
        np.asarray(sched.create_state().common.betas),
    )


def test_scheduler_state_is_jittable():
    sched = DDPMScheduler(beta_schedule="scaled_linear", **SD_BETA_KW)
    state = sched.create_state()

    @jax.jit
    def fused(state, x0, noise, t):
        xt = add_noise(state.common, x0, noise, t)
        v = get_velocity(state.common, x0, noise, t)
        return xt, v

    xt, v = fused(state, jnp.ones((2, 4, 4, 4)), jnp.zeros((2, 4, 4, 4)), jnp.array([1, 2]))
    assert xt.shape == (2, 4, 4, 4)
    assert v.shape == (2, 4, 4, 4)
