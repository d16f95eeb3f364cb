"""DDIM scheduler (deterministic / eta-stochastic sampling).

Behavior parity with ``/root/reference/schedulers/scheduling_ddim_flax.py``:
state with ``final_alpha_cumprod`` (L35-58), ``set_timesteps`` with
``steps_offset`` (L165-185), ``step`` implementing formulas (12)/(16) of
arXiv 2010.02502 with eta-variance (L199-284), and training-path
``add_noise``/``get_velocity`` (L286-302). This is also the scheduler
serialized into every exported checkpoint (reference
``training_utils.py:997-1004``).
"""

from dataclasses import dataclass
from typing import Optional, Tuple, Union

import flax
import jax.numpy as jnp

from ..utils.configuration import ConfigurableMixin
from . import common
from .common import CommonSchedulerState


@flax.struct.dataclass
class DDIMSchedulerState:
    common: CommonSchedulerState
    final_alpha_cumprod: jnp.ndarray
    init_noise_sigma: jnp.ndarray
    timesteps: jnp.ndarray
    num_inference_steps: Optional[int] = None

    @classmethod
    def create(cls, common, final_alpha_cumprod, init_noise_sigma, timesteps):
        return cls(
            common=common,
            final_alpha_cumprod=final_alpha_cumprod,
            init_noise_sigma=init_noise_sigma,
            timesteps=timesteps,
        )


@dataclass
class DDIMSchedulerOutput:
    prev_sample: jnp.ndarray
    state: DDIMSchedulerState


class DDIMScheduler(ConfigurableMixin):
    """Denoising Diffusion Implicit Models scheduler (arXiv 2010.02502)."""

    config_name = "scheduler_config.json"
    has_state = True

    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.0001,
        beta_end: float = 0.02,
        beta_schedule: str = "linear",
        trained_betas: Optional[jnp.ndarray] = None,
        set_alpha_to_one: bool = True,
        steps_offset: int = 0,
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
    ) -> DDIMSchedulerState:
        if common_state is None:
            common_state = CommonSchedulerState.create(self)
        final_alpha_cumprod = (
            jnp.array(1.0, dtype=self.dtype)
            if self.config.set_alpha_to_one
            else common_state.alphas_cumprod[0]
        )
        return DDIMSchedulerState.create(
            common=common_state,
            final_alpha_cumprod=final_alpha_cumprod,
            init_noise_sigma=jnp.array(1.0, dtype=self.dtype),
            timesteps=jnp.arange(0, self.config.num_train_timesteps).round()[::-1],
        )

    def scale_model_input(
        self, state: DDIMSchedulerState, sample: jnp.ndarray, timestep=None
    ) -> jnp.ndarray:
        return sample

    def set_timesteps(
        self, state: DDIMSchedulerState, num_inference_steps: int, shape: Tuple = ()
    ) -> DDIMSchedulerState:
        step_ratio = self.config.num_train_timesteps // num_inference_steps
        timesteps = (jnp.arange(0, num_inference_steps) * step_ratio).round()[
            ::-1
        ] + self.config.steps_offset
        return state.replace(
            num_inference_steps=num_inference_steps, timesteps=timesteps
        )

    def _get_variance(self, state: DDIMSchedulerState, timestep, prev_timestep):
        alpha_prod_t = state.common.alphas_cumprod[timestep]
        alpha_prod_t_prev = jnp.where(
            prev_timestep >= 0,
            state.common.alphas_cumprod[prev_timestep],
            state.final_alpha_cumprod,
        )
        beta_prod_t = 1 - alpha_prod_t
        beta_prod_t_prev = 1 - alpha_prod_t_prev
        return (beta_prod_t_prev / beta_prod_t) * (
            1 - alpha_prod_t / alpha_prod_t_prev
        )

    def step(
        self,
        state: DDIMSchedulerState,
        model_output: jnp.ndarray,
        timestep: int,
        sample: jnp.ndarray,
        eta: float = 0.0,
        return_dict: bool = True,
    ) -> Union[DDIMSchedulerOutput, Tuple]:
        """One DDIM reverse step x_t -> x_{t-prev} (formulas 12/16)."""
        if state.num_inference_steps is None:
            raise ValueError(
                "Number of inference steps is 'None'; run 'set_timesteps' first"
            )

        prev_timestep = (
            timestep - self.config.num_train_timesteps // state.num_inference_steps
        )
        alphas_cumprod = state.common.alphas_cumprod

        alpha_prod_t = alphas_cumprod[timestep]
        alpha_prod_t_prev = jnp.where(
            prev_timestep >= 0,
            alphas_cumprod[prev_timestep],
            state.final_alpha_cumprod,
        )
        beta_prod_t = 1 - alpha_prod_t

        if self.config.prediction_type == "epsilon":
            pred_original_sample = (
                sample - beta_prod_t**0.5 * model_output
            ) / alpha_prod_t**0.5
            pred_epsilon = model_output
        elif self.config.prediction_type == "sample":
            pred_original_sample = model_output
            pred_epsilon = (
                sample - alpha_prod_t**0.5 * pred_original_sample
            ) / beta_prod_t**0.5
        elif self.config.prediction_type == "v_prediction":
            pred_original_sample = (
                alpha_prod_t**0.5 * sample - beta_prod_t**0.5 * model_output
            )
            pred_epsilon = (
                alpha_prod_t**0.5 * model_output + beta_prod_t**0.5 * sample
            )
        else:
            raise ValueError(
                f"prediction_type {self.config.prediction_type} must be one of "
                "`epsilon`, `sample`, or `v_prediction`"
            )

        # sigma_t(eta), formula (16)
        variance = self._get_variance(state, timestep, prev_timestep)
        std_dev_t = eta * variance**0.5

        # "direction pointing to x_t", formula (12)
        pred_sample_direction = (
            1 - alpha_prod_t_prev - std_dev_t**2
        ) ** 0.5 * pred_epsilon
        prev_sample = (
            alpha_prod_t_prev**0.5 * pred_original_sample + pred_sample_direction
        )

        if not return_dict:
            return (prev_sample, state)
        return DDIMSchedulerOutput(prev_sample=prev_sample, state=state)

    def add_noise(self, state, original_samples, noise, timesteps):
        return common.add_noise(state.common, original_samples, noise, timesteps)

    def get_velocity(self, state, sample, noise, timesteps):
        return common.get_velocity(state.common, sample, noise, timesteps)

    def __len__(self):
        return self.config.num_train_timesteps


# reference-compatible alias
FlaxDDIMScheduler = DDIMScheduler
