"""Training core: fused train step, state assembly, AOT bucket compiler,
checkpointing, and the chunked orchestration loop.

Capability parity with ``/root/reference/training_utils.py`` +
``/root/reference/training.py`` (SURVEY.md §2.1, §2.4, §2.7, §2.8, §2.10),
re-designed TPU-first: NHWC end-to-end inside the step, GSPMD shardings from a
named mesh, optional FSDP param sharding, Orbax full-state checkpoints
alongside diffusers-format export.
"""

from .config import TrainingConfig, training_config_from_dict
from .states import (
    FrozenModel,
    build_lr_schedule,
    load_models,
    create_frozen_states,
    create_lion_optimizer_states,
    on_device_model_training_state,
)
from .train_step import train_step
from .aot import dp_compile_all_unique_resolution
from .checkpoint import save_model

__all__ = [
    "TrainingConfig",
    "training_config_from_dict",
    "FrozenModel",
    "build_lr_schedule",
    "load_models",
    "create_frozen_states",
    "create_lion_optimizer_states",
    "on_device_model_training_state",
    "train_step",
    "dp_compile_all_unique_resolution",
    "save_model",
]
