"""Inference: CFG text-to-image pipeline (jit/GSPMD, no pmap)."""

from .stable_diffusion import (
    FlaxStableDiffusionPipeline,
    StableDiffusionPipeline,
    unshard,
)

__all__ = ["StableDiffusionPipeline", "FlaxStableDiffusionPipeline", "unshard"]
