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
is viewed as ``(N/bs, bs)`` blocks. Four kernel layouts, all
bitwise-identical to the jnp path for f32 scales (history in
PERF_NOTES.md; the optimizer picks per leaf, see ``optim.lion8bit``):

- **dense** (production for leaves with size % 1024 == 0, bs in {8,16}):
  codes are the parameter's own ``(N/128, 128)`` bitcast view, scales
  tile-grouped — grads enter / updates leave in natural layout with zero
  XLA relayouts. 2.3x faster than transposed per-leaf on v5e.
- **transposed** (production fallback): codes ``(bs, n_blocks)``, scales
  ``(1, n_blocks)`` — 3.0x faster than narrow (no 16/128-lane DMA pad).
- **narrow** (legacy default of ``fused_lion8bit_update``): rows of whole
  blocks, last dim = ``bs``. Won the round-2 kernel-only A/B but its
  operand relayouts dominated the full step (round-3 trace: 430 ms).
- **wide** (opt-in ``layout="wide"``): ``(N/128, 128)`` view with
  ``(rows, gpr)`` scales — the padded scales traffic made it SLOWER than
  narrow on v5e (72.8 vs 69.7 ms at bs=16); kept as a recorded negative
  result. The dense layout is its fixed successor (packed scales, natural
  I/O).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..optim.lion8bit import _ZERO_CROSSING_OFFSET
from ..optim.lion8bit import _dense_ok as dense_layout_ok
from ..optim.lion8bit import dense_tile_rows  # noqa: F401  (public re-export)

_DEFAULT_ROWS = 1024


def _fast_compander(compander: str) -> bool:
    if compander not in ("exact", "fast"):
        raise ValueError(
            f"unknown compander {compander!r}; use 'exact' or 'fast'"
        )
    return compander == "fast"


def _lion_kernel_dense(g_ref, codes_ref, scales_ref, upd_ref, new_codes_ref,
                       new_scales_ref, *, b1, b2, bs, fast=False):
    """DENSE layout: codes are the grad's own ``(N/128, 128)`` bitcast view.

    A quantization block (``bs`` consecutive flat elements) is ``bs``
    consecutive LANES of one row — block membership is identical to the
    reference flat blocking, so numerics stay bitwise-equal. Scales are
    stored tile-grouped (``optim.lion8bit._scales_flat_to_dense``):
    the tile at grid step t sees ``scales[t*gpr:(t+1)*gpr, :]`` =
    ``(gpr, r)`` with ``s[j, c]`` belonging to block ``(t*r+c)*gpr + j``
    (the j-th lane group of dense row ``t*r+c``) — sublane dim ``gpr``,
    full-lane-width blocks, no padding anywhere.

    Per-block absmax: cyclic lane roll-tree max (log2(bs) rotations) puts
    each group's exact max on its first lane; an exact one-hot MXU
    dot_general picks them straight into the ``(gpr, rows)`` storage
    layout, and the inverse one-hot expands scales back to ``(rows, 128)``
    — both exact for f32 at HIGHEST precision (each output is one f32
    picked by a 1.0). Unlike the retired "wide" layout, scales never
    round-trip a 16x-padded ``(rows, gpr)`` array in HBM, and unlike the
    transposed layout the grads/updates never round-trip an XLA transpose
    copy (measured ~103 ms/step on the round-3 trace)."""
    gpr = 128 // bs

    lane_grp = jax.lax.broadcasted_iota(jnp.int32, (gpr, 128), 1) // bs
    grp_idx = jax.lax.broadcasted_iota(jnp.int32, (gpr, 128), 0)
    e_expand = (lane_grp == grp_idx).astype(jnp.float32)
    p_pick = (
        jax.lax.broadcasted_iota(jnp.int32, (gpr, 128), 1)
        == bs * jax.lax.broadcasted_iota(jnp.int32, (gpr, 128), 0)
    ).astype(jnp.float32)

    def expand(s):  # (gpr, rows) -> (rows, 128): out[r, l] = s[l//bs, r]
        return jax.lax.dot_general(
            s, e_expand, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )

    def group_max_packed(x):  # (rows, 128) -> (gpr, rows) exact group max
        y = x
        shift = 1
        while shift < bs:  # cyclic window max over [l, l+bs-1]
            y = jnp.maximum(y, jnp.roll(y, -shift, axis=1))
            shift *= 2
        return jax.lax.dot_general(
            p_pick, y, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )

    g = g_ref[:].astype(jnp.float32)                       # (rows, 128)
    if fast:
        # reciprocal on the 16x-smaller scales block, then one expand —
        # the full-width divide becomes a multiply (see _dequantize_fast)
        mu = _dequantize_fast(codes_ref[:], expand(1.0 / scales_ref[:]))
    else:
        mu = _dequantize(codes_ref[:], jnp.float32) / expand(scales_ref[:])
    upd_ref[:] = jnp.sign((1.0 - b1) * g + b1 * mu).astype(upd_ref.dtype)
    mu_new = (1.0 - b2) * g + b2 * mu
    absmax = group_max_packed(jnp.abs(mu_new))             # (gpr, rows)
    scales = 1.0 / jnp.where(absmax <= 0.0, 1.0, absmax)
    new_codes_ref[:] = _quantize(mu_new * expand(scales))
    new_scales_ref[:] = scales.astype(new_scales_ref.dtype)


def fused_lion8bit_update_dense(
    grad: jnp.ndarray,
    codes_d: jnp.ndarray,
    scales_d: jnp.ndarray,
    b1: float = 0.9,
    b2: float = 0.99,
    mu_scale_dtype=jnp.float32,
    rows_per_tile: int = _DEFAULT_ROWS,
    interpret: bool = None,
    compander: str = "exact",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused update for one quantized leaf in the DENSE layout.

    ``grad``: any shape with ``grad.size == codes_d.size`` and
    ``dense_layout_ok(size, bs)``; ``codes_d``: ``(size/128, 128)`` int8;
    ``scales_d``: tile-grouped ``(gpr * x/r, r)`` per
    ``optim.lion8bit._scales_flat_to_dense`` (``r`` is read from the
    storage itself so the grid always matches it; the canonical value is
    ``dense_tile_rows(x)``). Returns ``(update_sign, new_codes_d,
    new_scales_d)`` with ``update_sign`` reshaped to ``grad.shape``.
    Bitwise-equal to the transposed/narrow kernels and the jnp path for
    f32 scales; grads and updates stay in the parameter's natural dense
    layout (free bitcasts, no XLA transposes)."""
    del rows_per_tile  # the scales storage fixes the tile height
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x, lanes = codes_d.shape
    srows, r = scales_d.shape
    assert lanes == 128 and grad.size == x * 128 and x % r == 0, (
        codes_d.shape, scales_d.shape, grad.shape)
    gpr = srows // (x // r)
    assert gpr * (x // r) == srows and 128 % gpr == 0 and r % 8 == 0, (
        codes_d.shape, scales_d.shape)
    bs = 128 // gpr
    gd = grad.reshape(x, 128)  # free bitcast view
    kernel = functools.partial(
        _lion_kernel_dense, b1=float(b1), b2=float(b2), bs=bs,
        fast=_fast_compander(compander),
    )
    upd, new_codes, new_scales = pl.pallas_call(
        kernel,
        grid=(x // r,),
        in_specs=[
            pl.BlockSpec((r, 128), lambda i: (i, 0)),
            pl.BlockSpec((r, 128), lambda i: (i, 0)),
            pl.BlockSpec((gpr, r), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((r, 128), lambda i: (i, 0)),
            pl.BlockSpec((r, 128), lambda i: (i, 0)),
            pl.BlockSpec((gpr, r), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((x, 128), grad.dtype),
            jax.ShapeDtypeStruct((x, 128), jnp.int8),
            jax.ShapeDtypeStruct((srows, r), jnp.dtype(mu_scale_dtype)),
        ],
        interpret=interpret,
    )(gd, codes_d, scales_d)
    return upd.reshape(grad.shape), new_codes, new_scales


def _quantize(x):
    shifted = x + _ZERO_CROSSING_OFFSET
    sign = jnp.sign(shifted)
    code = jnp.power(jnp.abs(shifted), 1 / 5) * sign * 127
    return jnp.round(code).astype(jnp.int8)


def _dequantize(q, dtype):
    return ((q / 127) ** 5).astype(dtype) - _ZERO_CROSSING_OFFSET


# folded (q/127)^5 constant for the fast compander (exact f32 value of
# 127.0**-5 — the fold itself, not the constant, is the non-bitwise part)
_POW5_C = float(127.0 ** -5)


def _dequantize_fast(q, inv_scale):
    """compander="fast" dequant: ``(q^5 * 127^-5 - offset) * absmax``.

    Two op-count cuts vs the exact compander (same math, reassociated):
    the ``/127`` is folded into one constant multiply on the 5th power,
    and the full-width divide by the stored inverse-absmax scales becomes
    a multiply by their reciprocal (``inv_scale``), which the caller
    computes on the 16x-smaller scales array before expanding. Values
    differ from the exact path only by rounding (<= a few ulps per
    element); see PERF_NOTES round-5 Lion op-count surgery."""
    qf = q.astype(jnp.float32)
    q2 = qf * qf
    q5 = q2 * q2 * qf
    return (q5 * _POW5_C - _ZERO_CROSSING_OFFSET) * inv_scale

# NOTE (round-5 negative result, kept on record): a shared-lerp rewrite
# ``d = mu - g; upd = sign(g + b1*d); mu_new = g + b2*d`` saves ~3 full-width
# ops but ``g + b2*(mu - g)`` with b2=0.99 and |mu| << |g| (every fresh
# momentum) cancels catastrophically — ~1e-5 relative noise in mu_new and
# pallas/jnp divergence well beyond ulps. The fast compander therefore keeps
# the exact two-multiply lerps and only reassociates the dequant.


def _lion_kernel_wide(g_ref, codes_ref, scales_ref, upd_ref, new_codes_ref,
                      new_scales_ref, *, b1, b2, bs):
    """Full-lane layout: refs are (rows, 128) views of the flat array and
    (rows, 128/bs) for the per-block scales.

    Mosaic can't shape-cast (rows,128)<->(rows,gpr,bs), so cross-lane block
    ops stay in 2D: per-block absmax is a roll-tree max (log2(bs) lane
    rotations each way), and (rows,gpr)<->(rows,128) scale expand/pick are
    one-hot MXU matmuls at HIGHEST precision (exact for f32: each output is
    a single f32 picked by a 1.0)."""
    rows = g_ref.shape[0]
    gpr = 128 // bs  # blocks (groups) per row

    # E_expand[g, l] = 1 iff lane l belongs to group g; E_pick = transpose
    grp_of_lane = jax.lax.broadcasted_iota(jnp.int32, (gpr, 128), 1) // bs
    grp_idx = jax.lax.broadcasted_iota(jnp.int32, (gpr, 128), 0)
    e_expand = (grp_of_lane == grp_idx).astype(jnp.float32)

    def expand(s):  # (rows, gpr) -> (rows, 128), each scale repeated bs times
        return jax.lax.dot_general(
            s, e_expand, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )

    e_pick = (
        jax.lax.broadcasted_iota(jnp.int32, (128, gpr), 0)
        == bs * jax.lax.broadcasted_iota(jnp.int32, (128, gpr), 1)
    ).astype(jnp.float32)

    def group_max(x):  # (rows, 128) -> (rows, gpr) per-bs-lane-group max
        y = x
        shift = 1
        while shift < bs:  # max over the cyclic window [l, l+bs-1]
            y = jnp.maximum(y, jnp.roll(y, -shift, axis=1))
            shift *= 2
        # lane bs*g holds the exact group max; select it (one-hot, exact)
        return jax.lax.dot_general(
            y, e_pick, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )

    g = g_ref[:].astype(jnp.float32)
    mu = _dequantize(codes_ref[:], jnp.float32) / expand(scales_ref[:])

    upd_ref[:] = jnp.sign((1.0 - b1) * g + b1 * mu).astype(upd_ref.dtype)

    mu_new = (1.0 - b2) * g + b2 * mu
    absmax = group_max(jnp.abs(mu_new))  # (rows, gpr)
    scales = 1.0 / jnp.where(absmax <= 0.0, 1.0, absmax)
    new_codes_ref[:] = _quantize(mu_new * expand(scales))
    new_scales_ref[:] = scales.astype(new_scales_ref.dtype)


def _lion_kernel_transposed(g_ref, codes_ref, scales_ref, upd_ref,
                            new_codes_ref, new_scales_ref, *, b1, b2,
                            fast=False):
    """Block-transposed layout: refs are (bs, cols) with one BLOCK per lane.

    Every lane is fully packed (vs 16/128 in the narrow layout's (rows, bs)
    tiles — 8x DMA pad amplification at the config's bs=16, measured as the
    dominant train-step sink in the round-3 trace), the (1, cols) scales are
    lane-dense (vs (nb, 1), which pads 128x), and per-block absmax is a
    cheap cross-sublane reduction. Measured 3.0x faster than narrow on v5e
    at 16M params, bitwise identical (benchmarks/lion_transposed_ab.py)."""
    g = g_ref[:].astype(jnp.float32)                      # (bs, cols)
    if fast:
        # reciprocal on the (1, cols) scales row broadcasts over bs rows
        mu = _dequantize_fast(codes_ref[:], 1.0 / scales_ref[:])
    else:
        mu = _dequantize(codes_ref[:], jnp.float32) / scales_ref[:]
    upd_ref[:] = jnp.sign((1.0 - b1) * g + b1 * mu).astype(upd_ref.dtype)
    mu_new = (1.0 - b2) * g + b2 * mu
    absmax = jnp.max(jnp.abs(mu_new), axis=0, keepdims=True)  # (1, cols)
    scales = 1.0 / jnp.where(absmax <= 0.0, 1.0, absmax)
    new_codes_ref[:] = _quantize(mu_new * scales)
    new_scales_ref[:] = scales.astype(new_scales_ref.dtype)


_DEFAULT_COLS = 8192


def fused_lion8bit_update_transposed_packed(
    g_t: jnp.ndarray,
    codes_t: jnp.ndarray,
    scales_t: jnp.ndarray,
    b1: float = 0.9,
    b2: float = 0.99,
    mu_scale_dtype=jnp.float32,
    cols_per_tile: int = _DEFAULT_COLS,
    interpret: bool = None,
    compander: str = "exact",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Transposed-layout fused update on PRE-TRANSPOSED operands.

    ``g_t``: ``(bs, n_blocks)`` grads in the same block-transposed view as
    ``codes_t``/``scales_t``. Returns ``(upd_t, new_codes_t, new_scales_t)``
    with ``upd_t`` still ``(bs, n_blocks)``. This is the bucketing entry:
    the optimizer concatenates many small transposed leaves along the block
    axis and updates them in ONE kernel dispatch (the round-3 trace counted
    ~219 per-leaf dispatches carrying only 9%% of the optimizer bytes);
    block membership per leaf is unchanged, so numerics stay bitwise."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bs, nb = codes_t.shape

    cols = min(cols_per_tile, nb)
    pad = (-nb) % cols
    if pad:
        g_t = jnp.pad(g_t, ((0, 0), (0, pad)))
        codes_t = jnp.pad(codes_t, ((0, 0), (0, pad)))
        scales_t = jnp.pad(scales_t, ((0, 0), (0, pad)), constant_values=1.0)
    nbp = nb + pad

    kernel = functools.partial(
        _lion_kernel_transposed, b1=float(b1), b2=float(b2),
        fast=_fast_compander(compander),
    )
    upd, new_codes, new_scales = pl.pallas_call(
        kernel,
        grid=(nbp // cols,),
        in_specs=[
            pl.BlockSpec((bs, cols), lambda i: (0, i)),
            pl.BlockSpec((bs, cols), lambda i: (0, i)),
            pl.BlockSpec((1, cols), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((bs, cols), lambda i: (0, i)),
            pl.BlockSpec((bs, cols), lambda i: (0, i)),
            pl.BlockSpec((1, cols), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bs, nbp), g_t.dtype),
            jax.ShapeDtypeStruct((bs, nbp), jnp.int8),
            jax.ShapeDtypeStruct((1, nbp), jnp.dtype(mu_scale_dtype)),
        ],
        interpret=interpret,
    )(g_t, codes_t, scales_t)

    if pad:
        upd = upd[:, :nb]
        new_codes = new_codes[:, :nb]
        new_scales = new_scales[:, :nb]
    return upd, new_codes, new_scales


def fused_lion8bit_update_transposed(
    grad: jnp.ndarray,
    codes_t: jnp.ndarray,
    scales_t: jnp.ndarray,
    b1: float = 0.9,
    b2: float = 0.99,
    mu_scale_dtype=jnp.float32,
    cols_per_tile: int = _DEFAULT_COLS,
    interpret: bool = None,
    compander: str = "exact",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused update for one quantized leaf in the block-TRANSPOSED layout.

    ``grad``: any shape with ``grad.size == codes_t.size``; ``codes_t``:
    ``(bs, n_blocks)`` int8 (block dim on sublanes, block index on lanes);
    ``scales_t``: ``(1, n_blocks)``. Returns ``(update_sign, new_codes_t,
    new_scales_t)`` with ``update_sign`` reshaped to ``grad.shape``.
    Numerics bitwise-equal to the narrow layout and the jnp path."""
    bs, nb = codes_t.shape
    g2 = grad.reshape(nb, bs).T  # per-step relayout of the grads (f32)
    upd, new_codes, new_scales = fused_lion8bit_update_transposed_packed(
        g2, codes_t, scales_t, b1=b1, b2=b2, mu_scale_dtype=mu_scale_dtype,
        cols_per_tile=cols_per_tile, interpret=interpret, compander=compander,
    )
    return upd.T.reshape(grad.shape), new_codes, new_scales


def _lion_kernel(g_ref, codes_ref, scales_ref, upd_ref, new_codes_ref,
                 new_scales_ref, *, b1, b2, mu_dtype, fast=False):
    g = g_ref[:].astype(jnp.float32)  # (rows, bs)
    if fast:
        mu = _dequantize_fast(codes_ref[:], 1.0 / scales_ref[:])
    else:
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
    layout: str = "narrow",
    compander: str = "exact",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused update for one quantized leaf.

    ``grad``: any shape with ``grad.size == codes.size``; ``codes``:
    ``(n_blocks, bs)`` int8; ``scales``: ``(n_blocks, 1)``. Returns
    ``(update_sign, new_codes, new_scales)`` with ``update_sign`` reshaped to
    ``grad.shape``. ``layout``: "narrow" (default, fastest measured) or
    "wide" (full-lane experiment, see module docstring).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nb, bs = codes.shape
    if layout not in ("narrow", "wide"):
        raise ValueError(f"unknown layout {layout!r}; use 'narrow' or 'wide'")
    if layout == "wide" and (bs >= 128 or 128 % bs):
        # falling back silently would make layout A/Bs measure narrow twice
        raise ValueError(
            f"layout='wide' requires block_size < 128 dividing 128, got {bs}"
        )
    if layout == "wide":
        if _fast_compander(compander):
            raise ValueError(
                "compander='fast' is not implemented for the retired "
                "'wide' layout"
            )
        return _fused_wide(
            grad, codes, scales, b1=b1, b2=b2,
            mu_scale_dtype=mu_scale_dtype, rows_per_tile=rows_per_tile,
            interpret=interpret,
        )
    g2 = grad.reshape(nb, bs)

    rows = min(rows_per_tile, nb)
    pad = (-nb) % rows
    if pad:
        g2 = jnp.pad(g2, ((0, pad), (0, 0)))
        codes = jnp.pad(codes, ((0, pad), (0, 0)))
        scales = jnp.pad(scales, ((0, pad), (0, 0)), constant_values=1.0)
    nbp = nb + pad

    kernel = functools.partial(
        _lion_kernel, b1=float(b1), b2=float(b2), mu_dtype=mu_scale_dtype,
        fast=_fast_compander(compander),
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


def _fused_wide(
    grad, codes, scales, *, b1, b2, mu_scale_dtype, rows_per_tile, interpret
):
    """Wide-layout dispatch: view the flat array as (N/128, 128) so all VPU
    lanes are live at small block sizes (the config's bs=16 fills 16/128
    lanes in the narrow layout). Free at the HBM level — codes/grads are
    contiguous, so the reshape is a no-op relayout of the same bytes."""
    nb, bs = codes.shape
    gpr = 128 // bs

    # pad the block count so rows of 128 divide evenly
    row_pad = (-nb) % gpr
    if row_pad:
        codes = jnp.pad(codes, ((0, row_pad), (0, 0)))
        scales = jnp.pad(scales, ((0, row_pad), (0, 0)), constant_values=1.0)
    nbp = nb + row_pad
    rows_total = nbp // gpr

    g2 = jnp.pad(grad.reshape(-1), (0, row_pad * bs)).reshape(rows_total, 128)
    codes_w = codes.reshape(rows_total, 128)
    scales_w = scales.reshape(rows_total, gpr)

    rows = min(rows_per_tile, rows_total)
    tile_pad = (-rows_total) % rows
    if tile_pad:
        g2 = jnp.pad(g2, ((0, tile_pad), (0, 0)))
        codes_w = jnp.pad(codes_w, ((0, tile_pad), (0, 0)))
        scales_w = jnp.pad(
            scales_w, ((0, tile_pad), (0, 0)), constant_values=1.0
        )
    rt = rows_total + tile_pad

    kernel = functools.partial(
        _lion_kernel_wide, b1=float(b1), b2=float(b2), bs=bs
    )
    upd, new_codes, new_scales = pl.pallas_call(
        kernel,
        grid=(rt // rows,),
        in_specs=[
            pl.BlockSpec((rows, 128), lambda i: (i, 0)),
            pl.BlockSpec((rows, 128), lambda i: (i, 0)),
            pl.BlockSpec((rows, gpr), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((rows, 128), lambda i: (i, 0)),
            pl.BlockSpec((rows, 128), lambda i: (i, 0)),
            pl.BlockSpec((rows, gpr), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rt, 128), grad.dtype),
            jax.ShapeDtypeStruct((rt, 128), jnp.int8),
            jax.ShapeDtypeStruct((rt, gpr), jnp.dtype(mu_scale_dtype)),
        ],
        interpret=interpret,
    )(g2, codes_w, scales_w)

    upd = upd.reshape(-1)[: grad.size].reshape(grad.shape)
    new_codes = new_codes.reshape(-1, bs)[:nb]
    new_scales = new_scales.reshape(-1, 1)[:nb]
    return upd, new_codes, new_scales
