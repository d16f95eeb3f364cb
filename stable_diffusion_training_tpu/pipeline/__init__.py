"""Inference: CFG text-to-image pipeline (jit/GSPMD, no pmap)."""

from .stable_diffusion import (
    FlaxStableDiffusionPipeline,
    StableDiffusionPipeline,
    unshard,
)
from .sdxl import FlaxStableDiffusionXLPipeline, StableDiffusionXLPipeline

__all__ = [
    "StableDiffusionPipeline",
    "FlaxStableDiffusionPipeline",
    "StableDiffusionXLPipeline",
    "FlaxStableDiffusionXLPipeline",
    "unshard",
]
