"""DDPM ancestral-sampling scheduler (training-side noising + sampling step).

Behavior parity with ``/root/reference/schedulers/scheduling_ddpm_flax.py``:
state layout (L36-47), ``create_state`` (L111-124), ``set_timesteps``
(L140-161), six variance types (L163-194), ``step`` with epsilon/sample/
v-prediction x0 reconstruction, sample clipping, and t>0-gated variance noise
(L196-279), plus the two training-path methods ``add_noise``/``get_velocity``
(L281-297). Re-designed around pure functions in ``diffusion.common``; the
class only holds the (hashable) config.
"""

from dataclasses import dataclass
from typing import Optional, Tuple, Union

import flax
import jax
import jax.numpy as jnp

from ..utils.configuration import ConfigurableMixin
from . import common
from .common import CommonSchedulerState


@flax.struct.dataclass
class DDPMSchedulerState:
    common: CommonSchedulerState
    init_noise_sigma: jnp.ndarray
    timesteps: jnp.ndarray
    num_inference_steps: Optional[int] = None

    @classmethod
    def create(cls, common, init_noise_sigma, timesteps):
        return cls(
            common=common, init_noise_sigma=init_noise_sigma, timesteps=timesteps
        )


@dataclass
class DDPMSchedulerOutput:
    prev_sample: jnp.ndarray
    state: DDPMSchedulerState


class DDPMScheduler(ConfigurableMixin):
    """Denoising Diffusion Probabilistic Models scheduler (arXiv 2006.11239)."""

    config_name = "scheduler_config.json"
    has_state = True

    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.0001,
        beta_end: float = 0.02,
        beta_schedule: str = "linear",
        trained_betas: Optional[jnp.ndarray] = None,
        variance_type: str = "fixed_small",
        clip_sample: bool = True,
        prediction_type: str = "epsilon",
        dtype: jnp.dtype = jnp.float32,
    ):
        self.dtype = dtype
        self._register_config(dict(locals()))

    @classmethod
    def from_pretrained(cls, pretrained_path: str, subfolder: Optional[str] = None, **kw):
        scheduler = cls.from_config(cls.load_config(pretrained_path, subfolder), **kw)
        return scheduler, scheduler.create_state()

    def create_state(
        self, common_state: Optional[CommonSchedulerState] = None
    ) -> DDPMSchedulerState:
        if common_state is None:
            common_state = CommonSchedulerState.create(self)
        return DDPMSchedulerState.create(
            common=common_state,
            init_noise_sigma=jnp.array(1.0, dtype=self.dtype),
            timesteps=jnp.arange(0, self.config.num_train_timesteps).round()[::-1],
        )

    def scale_model_input(
        self, state: DDPMSchedulerState, sample: jnp.ndarray, timestep=None
    ) -> jnp.ndarray:
        return sample

    def set_timesteps(
        self, state: DDPMSchedulerState, num_inference_steps: int, shape: Tuple = ()
    ) -> DDPMSchedulerState:
        step_ratio = self.config.num_train_timesteps // num_inference_steps
        timesteps = (jnp.arange(0, num_inference_steps) * step_ratio).round()[::-1]
        return state.replace(
            num_inference_steps=num_inference_steps, timesteps=timesteps
        )

    def _get_variance(
        self, state: DDPMSchedulerState, t, predicted_variance=None, variance_type=None
    ):
        alpha_prod_t = state.common.alphas_cumprod[t]
        alpha_prod_t_prev = jnp.where(
            t > 0,
            state.common.alphas_cumprod[t - 1],
            jnp.array(1.0, dtype=self.dtype),
        )
        # predicted variance beta-tilde_t, formulas (6)/(7) of arXiv 2006.11239
        variance = (1 - alpha_prod_t_prev) / (1 - alpha_prod_t) * state.common.betas[t]

        if variance_type is None:
            variance_type = self.config.variance_type

        if variance_type == "fixed_small":
            return jnp.clip(variance, min=1e-20)
        if variance_type == "fixed_small_log":
            return jnp.log(jnp.clip(variance, min=1e-20))
        if variance_type == "fixed_large":
            return state.common.betas[t]
        if variance_type == "fixed_large_log":
            return jnp.log(state.common.betas[t])
        if variance_type == "learned":
            return predicted_variance
        if variance_type == "learned_range":
            min_log = variance
            max_log = state.common.betas[t]
            frac = (predicted_variance + 1) / 2
            return frac * max_log + (1 - frac) * min_log
        raise NotImplementedError(f"variance_type {variance_type}")

    def step(
        self,
        state: DDPMSchedulerState,
        model_output: jnp.ndarray,
        timestep: int,
        sample: jnp.ndarray,
        key: Optional[jax.Array] = None,
        return_dict: bool = True,
    ) -> Union[DDPMSchedulerOutput, Tuple]:
        """One reverse (ancestral sampling) step x_t -> x_{t-1}."""
        t = timestep
        if key is None:
            key = jax.random.PRNGKey(0)

        if model_output.shape[1] == sample.shape[1] * 2 and self.config.variance_type in (
            "learned",
            "learned_range",
        ):
            model_output, predicted_variance = jnp.split(
                model_output, sample.shape[1], axis=1
            )
        else:
            predicted_variance = None

        alpha_prod_t = state.common.alphas_cumprod[t]
        alpha_prod_t_prev = jnp.where(
            t > 0,
            state.common.alphas_cumprod[t - 1],
            jnp.array(1.0, dtype=self.dtype),
        )
        beta_prod_t = 1 - alpha_prod_t
        beta_prod_t_prev = 1 - alpha_prod_t_prev

        # "predicted x_0", formula (15) of arXiv 2006.11239
        if self.config.prediction_type == "epsilon":
            pred_original_sample = (
                sample - beta_prod_t**0.5 * model_output
            ) / alpha_prod_t**0.5
        elif self.config.prediction_type == "sample":
            pred_original_sample = model_output
        elif self.config.prediction_type == "v_prediction":
            pred_original_sample = (
                alpha_prod_t**0.5 * sample - beta_prod_t**0.5 * model_output
            )
        else:
            raise ValueError(
                f"prediction_type {self.config.prediction_type} must be one of "
                "`epsilon`, `sample`, `v_prediction`"
            )

        if self.config.clip_sample:
            pred_original_sample = jnp.clip(pred_original_sample, -1, 1)

        # mu_t coefficients, formula (7)
        pred_original_sample_coeff = (
            alpha_prod_t_prev**0.5 * state.common.betas[t]
        ) / beta_prod_t
        current_sample_coeff = (
            state.common.alphas[t] ** 0.5 * beta_prod_t_prev / beta_prod_t
        )
        pred_prev_sample = (
            pred_original_sample_coeff * pred_original_sample
            + current_sample_coeff * sample
        )

        # variance noise, gated off at t == 0. The reference folds the key
        # once before drawing (``split(key, num=1)`` then normal with the
        # batched key, scheduling_ddpm_flax.py:267-272 — a legacy-jax idiom);
        # modern JAX rejects batched keys, so the equivalent single key
        # ``split(key, 1)[0]`` is used: identical bits, same stream.
        noise = jax.random.normal(
            jax.random.split(key, num=1)[0],
            shape=model_output.shape,
            dtype=self.dtype,
        )
        variance_noise = (
            self._get_variance(state, t, predicted_variance=predicted_variance) ** 0.5
        ) * noise
        variance = jnp.where(
            t > 0, variance_noise, jnp.zeros(model_output.shape, dtype=self.dtype)
        )
        pred_prev_sample = pred_prev_sample + variance

        if not return_dict:
            return (pred_prev_sample, state)
        return DDPMSchedulerOutput(prev_sample=pred_prev_sample, state=state)

    def add_noise(self, state, original_samples, noise, timesteps):
        return common.add_noise(state.common, original_samples, noise, timesteps)

    def get_velocity(self, state, sample, noise, timesteps):
        return common.get_velocity(state.common, sample, noise, timesteps)

    def __len__(self):
        return self.config.num_train_timesteps


# reference-compatible alias (`from schedulers import FlaxDDPMScheduler`)
FlaxDDPMScheduler = DDPMScheduler
