"""TPU-native model zoo: UNet2DCondition, AutoencoderKL, CLIP text encoder.

The reference imports these from HuggingFace ``diffusers==0.21.4`` /
``transformers`` Flax classes (``/root/reference/training_utils.py:7-14``,
SURVEY.md §1 L1). Here they are implemented from scratch, NHWC-native for TPU
convolutions, with a single pluggable attention primitive (``ops.attention``)
instead of the reference's key-chunk-patched diffusers attention, and
checkpoint converters to/from the diffusers on-disk format (``hf_io``).
"""

from .clip import CLIPTextConfig, CLIPTextModel, CLIPTextModelWithProjection
from .unet import UNet2DConditionModel
from .vae import AutoencoderKL, DiagonalGaussianDistribution
from . import configs

__all__ = [
    "CLIPTextConfig",
    "CLIPTextModel",
    "CLIPTextModelWithProjection",
    "UNet2DConditionModel",
    "AutoencoderKL",
    "DiagonalGaussianDistribution",
    "configs",
]
