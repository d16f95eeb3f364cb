"""Noise schedulers as pure jittable functions over flax.struct states.

Capability parity with the reference's vendored ``schedulers/`` package
(``/root/reference/schedulers/``): DDPM (training) and DDIM (sampling) with
``linear`` / ``scaled_linear`` / ``zero_snr_scaled_linear`` / ``squaredcos_cap_v2``
beta schedules, epsilon/sample/v-prediction, zero-terminal-SNR rescaling
(arXiv 2305.08891 Algorithm 1), and diffusers-format config round-tripping.

Unlike the reference, all scheduler math lives in pure functions
(``diffusion.common``) that fuse into the train step's single XLA program; the
classes are thin config/state holders kept for API compatibility.
"""

from .common import (
    CommonSchedulerState,
    add_noise,
    betas_for_alpha_bar,
    get_velocity,
    make_beta_schedule,
    rescale_zero_terminal_snr,
    compute_snrs,
)
from .ddim import DDIMScheduler, DDIMSchedulerState, FlaxDDIMScheduler
from .ddpm import DDPMScheduler, DDPMSchedulerState, FlaxDDPMScheduler

__all__ = [
    "CommonSchedulerState",
    "add_noise",
    "get_velocity",
    "betas_for_alpha_bar",
    "make_beta_schedule",
    "rescale_zero_terminal_snr",
    "compute_snrs",
    "DDPMScheduler",
    "DDPMSchedulerState",
    "FlaxDDPMScheduler",
    "DDIMScheduler",
    "DDIMSchedulerState",
    "FlaxDDIMScheduler",
]
