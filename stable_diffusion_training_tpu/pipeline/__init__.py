"""Inference: CFG text-to-image pipeline (jit/GSPMD, no pmap)."""

from .stable_diffusion import (
    FlaxStableDiffusionPipeline,
    StableDiffusionPipeline,
    unshard,
)
from .sdxl import FlaxStableDiffusionXLPipeline, StableDiffusionXLPipeline
from .sdxl_refiner import (
    FlaxStableDiffusionXLImg2ImgPipeline,
    StableDiffusionXLImg2ImgPipeline,
    prepare_image,
)

__all__ = [
    "StableDiffusionPipeline",
    "FlaxStableDiffusionPipeline",
    "StableDiffusionXLPipeline",
    "FlaxStableDiffusionXLPipeline",
    "StableDiffusionXLImg2ImgPipeline",
    "FlaxStableDiffusionXLImg2ImgPipeline",
    "prepare_image",
    "unshard",
]
