"""Polyphase decomposition of the stride-2 3x3 downsample convolution.

The round-4 per-kernel roofline audit (PERF_NOTES "roofline CORRECTION")
measured the two stride-2 VAE downsample+GroupNorm fusions at 2.9-3.1x
their roofline time (~23 ms/step of slack) while the step's stride-1 convs
run at ~96% of MXU spec — the stride-2 form itself is what falls off the
fast path. ``optimization_barrier`` fusion splits didn't help and an
equal-output space-to-depth rewrite pads the contraction 1152->2048
(+78% flops).

This module takes the third route: a stride-2 3x3 conv is exactly the sum
of FOUR stride-1 convs over the four input polyphase components, with
kernel taps split 4+2+2+1 = 9 — identical flop count, no contraction
padding, and every conv in the decomposition is the stride-1 form the MXU
demonstrably runs at spec. The extra cost is materializing the four phase
slices (one additional read+write pass over the input).

ON-CHIP VERDICT (round 5, ``benchmarks/downsample_poly_ab.py``): NEGATIVE
— the phase-slice extraction dominates, 1.5-2.8x slower than the fused
stride-2 form at every headline VAE shape. The isolated stride-2 conv is
fast; the audit's in-situ 2.9-3.1x gap is a fusion-context effect, not
the conv form. Kept as a documented negative result;
``vae_polyphase_downsample`` defaults to off (PERF_NOTES round-5).

Derivation (asymmetric ``((0,1),(0,1))`` padding — the VAE encoder's form,
``models/blocks.py:Downsample2D``; reference behavior per diffusers'
``FlaxDownsample2D``): ``y[i,j] = sum_{di,dj} x[2i+di, 2j+dj] w[di,dj]``
so tap ``di=0 -> phase0 row i``, ``di=1 -> phase1 row i``,
``di=2 -> phase0 row i+1`` — phase0 rows see a 2-tap ``[w0, w2]`` stride-1
conv (right-padded by one), phase1 rows a 1-tap ``[w1]``. Symmetric
``((1,1),(1,1))`` padding (the UNet downsample) shifts the mapping:
``di=0 -> phase1 row i-1``, ``di=1 -> phase0 row i``,
``di=2 -> phase1 row i`` — phase1 carries the left-padded 2-tap conv.

Partial outputs accumulate in float32 (``preferred_element_type``) and are
summed in float32 before the final cast, so the only rounding vs the fused
stride-2 conv (which accumulates all 9 taps in one f32 tree) is the split
of the reduction into four f32 partials — bf16-exact in practice on VAE
activations, allclose-tested in ``tests/test_models.py``.
"""

from typing import Sequence

import jax.numpy as jnp
from jax import lax

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def _conv(x, k, padding, accum_dtype):
    return lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=_DIMNUMS,
        preferred_element_type=accum_dtype,
    )


def polyphase_stride2_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    asymmetric_padding: bool = True,
    accum_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Stride-2 3x3 conv (NHWC x HWIO) as four stride-1 polyphase convs.

    Equivalent to ``lax.conv_general_dilated(x, kernel, (2, 2), pad)`` with
    ``pad = ((0,1),(0,1))`` (``asymmetric_padding=True``, the VAE encoder
    downsample) or ``((1,1),(1,1))`` (the UNet downsample). Requires even
    spatial dims (every SD/SDXL resolution is a multiple of 64).
    """
    kh, kw = kernel.shape[:2]
    if (kh, kw) != (3, 3):
        raise ValueError(f"polyphase decomposition expects a 3x3 kernel, got {(kh, kw)}")
    h, w = x.shape[1], x.shape[2]
    if h % 2 or w % 2:
        raise ValueError(f"even spatial dims required, got {(h, w)}")

    # phase extraction: one strided-slice pass; XLA emits these as a single
    # multi-output fusion reading x once
    x00 = x[:, 0::2, 0::2, :]
    x01 = x[:, 0::2, 1::2, :]
    x10 = x[:, 1::2, 0::2, :]
    x11 = x[:, 1::2, 1::2, :]

    two = (0, 2)  # kernel tap rows/cols carried by the 2-tap phase
    if asymmetric_padding:
        # phase0 carries taps {0,2} at indices (i, i+1): right/bottom pad 1
        p2 = (0, 1)
        y = _conv(x00, kernel[two, :][:, two], (p2, p2), accum_dtype)
        y += _conv(x01, kernel[two, :][:, 1:2], (p2, (0, 0)), accum_dtype)
        y += _conv(x10, kernel[1:2, :][:, two], ((0, 0), p2), accum_dtype)
        y += _conv(x11, kernel[1:2, :][:, 1:2], ((0, 0), (0, 0)), accum_dtype)
    else:
        # symmetric: phase1 carries taps {0,2} at indices (i-1, i): left pad 1
        p2 = (1, 0)
        y = _conv(x00, kernel[1:2, :][:, 1:2], ((0, 0), (0, 0)), accum_dtype)
        y += _conv(x01, kernel[1:2, :][:, two], ((0, 0), p2), accum_dtype)
        y += _conv(x10, kernel[two, :][:, 1:2], (p2, (0, 0)), accum_dtype)
        y += _conv(x11, kernel[two, :][:, two], (p2, p2), accum_dtype)
    return y.astype(x.dtype)


def stride2_conv_reference(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    asymmetric_padding: bool = True,
) -> jnp.ndarray:
    """The plain fused stride-2 conv (what ``nn.Conv`` lowers to)."""
    pad: Sequence = ((0, 1), (0, 1)) if asymmetric_padding else ((1, 1), (1, 1))
    return lax.conv_general_dilated(
        x, kernel, (2, 2), pad, dimension_numbers=_DIMNUMS
    ).astype(x.dtype)
