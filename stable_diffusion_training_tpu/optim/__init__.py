"""Optimizers: 8-bit block-quantized Lion (optax-compatible).

Capability parity with ``/root/reference/lion_quant.py`` — Lion (arXiv
2302.06675) whose momentum is stored as blockwise int8 with a signed 5th-power
companding quantizer. The jnp implementation here defines the exact numerics;
``ops.lion_kernel`` provides a fused Pallas TPU path with identical math.
"""

from .lion8bit import (
    ScaleBy8bitLionState,
    lion_8bit,
    momentum_to_canonical_layout,
    momentum_to_reference_layout,
    scale_by_lion_8bit,
)
from .masks import create_mask

__all__ = [
    "ScaleBy8bitLionState",
    "lion_8bit",
    "momentum_to_canonical_layout",
    "momentum_to_reference_layout",
    "scale_by_lion_8bit",
    "create_mask",
]
