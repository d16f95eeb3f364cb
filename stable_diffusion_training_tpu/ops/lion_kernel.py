"""Fused 8-bit Lion momentum update as a Pallas TPU kernel.

One pass over the int8 momentum blocks: dequant -> lion update direction ->
new momentum -> blockwise requant (absmax scales), emitting the sign-update,
new codes, and new scales together — the north-star mapping of the
reference's tree of gather/scatter ops (``/root/reference/lion_quant.py``,
SURVEY.md §2.5). Numerics: same 5th-power compander and zero-crossing offset
as ``optim.lion8bit``'s jnp path; the kernel dequantizes and accumulates in
f32 while the jnp path uses ``mu_scale_dtype``, so bitwise equality holds for
the (default, and only config-used) f32 scale dtype — verified by parity
tests. Non-f32 ``mu_scale_dtype`` would differ in the low bits.

Layout: a flat parameter of N elements with quantization block size ``bs``
is viewed as ``(N/bs, bs)`` blocks. The kernel tiles rows of blocks; the last
dim equals the full block size so every tile is TPU-legal for any ``bs``.
For the config's ``bs=16`` the VPU lanes are underfilled — the XLA-fused jnp
path is often at parity there; this kernel is the dedicated fast path for
``bs >= 128`` and the single-pass HBM-traffic floor either way.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..optim.lion8bit import _ZERO_CROSSING_OFFSET

_DEFAULT_ROWS = 1024


def _quantize(x):
    shifted = x + _ZERO_CROSSING_OFFSET
    sign = jnp.sign(shifted)
    code = jnp.power(jnp.abs(shifted), 1 / 5) * sign * 127
    return jnp.round(code).astype(jnp.int8)


def _dequantize(q, dtype):
    return ((q / 127) ** 5).astype(dtype) - _ZERO_CROSSING_OFFSET


def _lion_kernel(g_ref, codes_ref, scales_ref, upd_ref, new_codes_ref,
                 new_scales_ref, *, b1, b2, mu_dtype):
    g = g_ref[:].astype(jnp.float32)  # (rows, bs)
    mu = _dequantize(codes_ref[:], jnp.float32) / scales_ref[:]

    upd_ref[:] = jnp.sign((1.0 - b1) * g + b1 * mu).astype(upd_ref.dtype)

    mu_new = (1.0 - b2) * g + b2 * mu
    absmax = jnp.max(jnp.abs(mu_new), axis=-1, keepdims=True)
    scales = 1.0 / jnp.where(absmax <= 0.0, 1.0, absmax)
    new_codes_ref[:] = _quantize(mu_new * scales)
    new_scales_ref[:] = scales.astype(new_scales_ref.dtype)


def fused_lion8bit_update(
    grad: jnp.ndarray,
    codes: jnp.ndarray,
    scales: jnp.ndarray,
    b1: float = 0.9,
    b2: float = 0.99,
    mu_scale_dtype=jnp.float32,
    rows_per_tile: int = _DEFAULT_ROWS,
    interpret: bool = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused update for one quantized leaf.

    ``grad``: any shape with ``grad.size == codes.size``; ``codes``:
    ``(n_blocks, bs)`` int8; ``scales``: ``(n_blocks, 1)``. Returns
    ``(update_sign, new_codes, new_scales)`` with ``update_sign`` reshaped to
    ``grad.shape``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nb, bs = codes.shape
    g2 = grad.reshape(nb, bs)

    rows = min(rows_per_tile, nb)
    pad = (-nb) % rows
    if pad:
        g2 = jnp.pad(g2, ((0, pad), (0, 0)))
        codes = jnp.pad(codes, ((0, pad), (0, 0)))
        scales = jnp.pad(scales, ((0, pad), (0, 0)), constant_values=1.0)
    nbp = nb + pad

    kernel = functools.partial(
        _lion_kernel, b1=float(b1), b2=float(b2), mu_dtype=mu_scale_dtype
    )
    upd, new_codes, new_scales = pl.pallas_call(
        kernel,
        grid=(nbp // rows,),
        in_specs=[
            pl.BlockSpec((rows, bs), lambda i: (i, 0)),
            pl.BlockSpec((rows, bs), lambda i: (i, 0)),
            pl.BlockSpec((rows, 1), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((rows, bs), lambda i: (i, 0)),
            pl.BlockSpec((rows, bs), lambda i: (i, 0)),
            pl.BlockSpec((rows, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nbp, bs), grad.dtype),
            jax.ShapeDtypeStruct((nbp, bs), jnp.int8),
            jax.ShapeDtypeStruct((nbp, 1), jnp.dtype(mu_scale_dtype)),
        ],
        interpret=interpret,
    )(g2, codes, scales)

    if pad:
        upd, new_codes, new_scales = upd[:nb], new_codes[:nb], new_scales[:nb]
    return upd.reshape(grad.shape), new_codes, new_scales
