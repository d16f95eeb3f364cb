"""Shared scheduler math: beta schedules, zero-terminal-SNR rescale, forward
diffusion (``add_noise``) and velocity targets.

Behavior parity with ``/root/reference/schedulers/scheduling_utils_flax.py``
(``CommonSchedulerState`` L266-313, ``rescale_betas`` L222-263,
``add_noise_common`` L332-337, ``get_velocity_common`` L340-343,
``betas_for_alpha_bar`` L193-219), re-designed as a flat set of pure functions
so the train step traces them into one fused XLA program.
"""

import math
from typing import Optional

import flax
import jax.numpy as jnp
import numpy as np


def betas_for_alpha_bar(
    num_diffusion_timesteps: int, max_beta: float = 0.999, dtype=jnp.float32
) -> jnp.ndarray:
    """Glide/squaredcos_cap_v2 cosine beta schedule.

    betas[i] = min(1 - alpha_bar((i+1)/N) / alpha_bar(i/N), max_beta) with
    alpha_bar(t) = cos^2((t + 0.008)/1.008 * pi/2). Computed vectorized in
    float64 on host (identical values to a scalar-math loop) then cast.
    """
    n = num_diffusion_timesteps
    t1 = np.arange(n, dtype=np.float64) / n
    t2 = np.arange(1, n + 1, dtype=np.float64) / n

    def alpha_bar(t):
        return np.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = np.minimum(1.0 - alpha_bar(t2) / alpha_bar(t1), max_beta)
    return jnp.asarray(betas, dtype=dtype)


def rescale_zero_terminal_snr(betas: jnp.ndarray) -> jnp.ndarray:
    """Rescale a beta schedule so the terminal timestep has exactly zero SNR.

    Algorithm 1 of "Common Diffusion Noise Schedules and Sample Steps are
    Flawed" (arXiv 2305.08891): shift sqrt(alpha_bar) down so its last entry is
    0, stretch so its first entry is preserved, then un-cumprod back to betas.
    Matches the reference's ``rescale_betas``
    (``scheduling_utils_flax.py:222-263``) op-for-op in fp32.
    """
    alphas = 1.0 - betas
    alphas_bar = jnp.cumprod(alphas, axis=0)
    alphas_bar_sqrt = jnp.sqrt(alphas_bar)

    first = alphas_bar_sqrt[0]
    last = alphas_bar_sqrt[-1]
    alphas_bar_sqrt = alphas_bar_sqrt - last
    alphas_bar_sqrt = alphas_bar_sqrt * first / (first - last)

    alphas_bar = alphas_bar_sqrt**2
    alphas = alphas_bar[1:] / alphas_bar[:-1]
    alphas = jnp.concatenate([alphas_bar[0:1], alphas])
    return 1.0 - alphas


def make_beta_schedule(
    beta_schedule: str,
    num_train_timesteps: int,
    beta_start: float,
    beta_end: float,
    trained_betas: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Build the beta array for a named schedule.

    Supported names match the reference (``scheduling_utils_flax.py:276-303``):
    ``linear``, ``scaled_linear``, ``zero_snr_scaled_linear`` (scaled_linear then
    zero-terminal-SNR rescale — the reference's main novelty), and
    ``squaredcos_cap_v2``; ``trained_betas`` overrides all.
    """
    if trained_betas is not None:
        return jnp.asarray(trained_betas, dtype=dtype)
    if beta_schedule == "linear":
        return jnp.linspace(beta_start, beta_end, num_train_timesteps, dtype=dtype)
    if beta_schedule == "scaled_linear":
        return (
            jnp.linspace(
                beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=dtype
            )
            ** 2
        )
    if beta_schedule == "zero_snr_scaled_linear":
        betas = (
            jnp.linspace(
                beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=dtype
            )
            ** 2
        )
        return rescale_zero_terminal_snr(betas)
    if beta_schedule == "squaredcos_cap_v2":
        return betas_for_alpha_bar(num_train_timesteps, dtype=dtype)
    raise NotImplementedError(f"beta_schedule {beta_schedule} is not implemented")


@flax.struct.dataclass
class CommonSchedulerState:
    """Per-run schedule tables shared by DDPM/DDIM (pytree, jit-traceable)."""

    alphas: jnp.ndarray
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray

    @classmethod
    def create(cls, scheduler) -> "CommonSchedulerState":
        cfg = scheduler.config
        betas = make_beta_schedule(
            beta_schedule=cfg.beta_schedule,
            num_train_timesteps=cfg.num_train_timesteps,
            beta_start=cfg.beta_start,
            beta_end=cfg.beta_end,
            trained_betas=cfg.trained_betas,
            dtype=scheduler.dtype,
        )
        alphas = 1.0 - betas
        return cls(alphas=alphas, betas=betas, alphas_cumprod=jnp.cumprod(alphas, axis=0))


def _left_broadcast(x: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Append trailing singleton dims so a per-sample vector broadcasts over
    sample dims (reference ``broadcast_to_shape_from_left``, L188-190)."""
    return x.reshape(x.shape + (1,) * (ndim - x.ndim))


def _gather_sqrt_alpha_prod(state: CommonSchedulerState, timesteps: jnp.ndarray, ndim: int):
    ac_t = state.alphas_cumprod[timesteps]
    sqrt_alpha_prod = _left_broadcast(jnp.ravel(ac_t**0.5), ndim)
    sqrt_one_minus = _left_broadcast(jnp.ravel((1 - ac_t) ** 0.5), ndim)
    return sqrt_alpha_prod, sqrt_one_minus


def add_noise(
    state: CommonSchedulerState,
    original_samples: jnp.ndarray,
    noise: jnp.ndarray,
    timesteps: jnp.ndarray,
) -> jnp.ndarray:
    """Forward diffusion: x_t = sqrt(abar_t) x_0 + sqrt(1-abar_t) eps."""
    sqrt_alpha_prod, sqrt_one_minus = _gather_sqrt_alpha_prod(
        state, timesteps, original_samples.ndim
    )
    return sqrt_alpha_prod * original_samples + sqrt_one_minus * noise


def get_velocity(
    state: CommonSchedulerState,
    sample: jnp.ndarray,
    noise: jnp.ndarray,
    timesteps: jnp.ndarray,
) -> jnp.ndarray:
    """v-prediction target: v = sqrt(abar_t) eps - sqrt(1-abar_t) x_0."""
    sqrt_alpha_prod, sqrt_one_minus = _gather_sqrt_alpha_prod(
        state, timesteps, sample.ndim
    )
    return sqrt_alpha_prod * noise - sqrt_one_minus * sample


def compute_snrs(alphas_cumprod: jnp.ndarray) -> jnp.ndarray:
    """Per-timestep signal-to-noise ratio abar/(1-abar)
    (reference ``training_utils.py:532-535``)."""
    return alphas_cumprod / (1 - alphas_cumprod)
