"""Pallas TPU flash attention (fwd + custom-VJP bwd).

Replaces the reference's attention memory strategy — diffusers'
``jax_memory_efficient_attention`` with ``key_chunk_patch.patch`` forcing one
full-length key chunk (``/root/reference/key_chunk_patch.patch``, SURVEY.md
§2.12/§5.7). Blockwise online-softmax (FlashAttention, arXiv 2205.14135):
O(S) memory instead of the O(S^2) logits the patched reference materializes,
with fp32 accumulation and MXU-shaped (128-aligned) tiles.

Layout contract: q (B, Sq, H, D), k/v (B, Sk, H, D) — the models' native
layout. Internally heads fold into the grid's leading dim; per-row softmax
stats (logsumexp) live in (BH, S, 1) so every block shape is TPU-tileable.
Sequence lengths are padded to the block size; padded key columns are masked
to -inf, padded query rows are sliced off. Tested in interpret mode on CPU
against the jnp reference (tests/test_flash_attention.py) and compiled on TPU.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# v5e sweep (benchmarks/flash_ab.py, PERF_NOTES.md): 1024x1024 tiles beat
# 512x512 by ~1.6x fwd+bwd at 4096 tokens and ~1.6x at 16384 — grid overhead
# dominates smaller tiles; 1024² f32 logits (4 MB) still fit VMEM with room
# for the q/k/v tiles and accumulators.
DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 1024
_NEG_INF = -1e30


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def flash_supported(q, k, mask=None) -> bool:
    """Flash path handles unmasked attention (self or cross)."""
    return mask is None


# --- forward kernel -----------------------------------------------------------


def _fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref, *, scale, kv_len
):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # (bq, d)
    k = k_ref[0]  # (bk, d)
    v = v_ref[0]  # (bk, d)
    bq = q.shape[0]
    bk = k.shape[0]

    s = jax.lax.dot_general(
        q,
        k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * scale

    # mask padded key columns
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    s = jnp.where(col < kv_len - ik * bk, s, _NEG_INF)

    m_prev = m_ref[:, :1]  # (bq, 1)
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)  # (bq, 1)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)  # (bq, bk)
    correction = jnp.exp(m_prev - m_new)  # (bq, 1)
    l_new = l_prev * correction + jnp.sum(p, axis=-1, keepdims=True)

    acc_ref[:] = acc_ref[:] * correction + jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ik == nk - 1)
    def _finalize():
        l = l_ref[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[:] / safe_l).astype(o_ref.dtype)
        lse_ref[0] = (m_ref[:, :1] + jnp.log(safe_l)).astype(lse_ref.dtype)


# --- backward kernels -----------------------------------------------------------


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_acc, *, scale, kv_len
):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]  # (bq, 1)
    delta = delta_ref[0]  # (bq, 1)
    bq, bk = q.shape[0], k.shape[0]

    s = (
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    s = jnp.where(col < kv_len - ik * bk, s, _NEG_INF)
    p = jnp.exp(s - lse)  # (bq, bk)

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta)  # (bq, bk) f32
    dq_acc[:] += scale * jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ik == nk - 1)
    def _finalize():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_acc, dv_acc, *, scale, kv_len
):
    iq = pl.program_id(2)
    nq = pl.num_programs(2)
    ik = pl.program_id(1)

    @pl.when(iq == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]  # (bq, 1)
    delta = delta_ref[0]  # (bq, 1)
    bq, bk = q.shape[0], k.shape[0]

    s = (
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    s = jnp.where(col < kv_len - ik * bk, s, _NEG_INF)
    p = jnp.exp(s - lse)  # (bq, bk)

    # dv += p^T @ do
    dv_acc[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta)
    # dk += scale * ds^T @ q
    dk_acc[:] += scale * jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


# --- public op with custom VJP ---------------------------------------------------


def _pad_seq(x, block):
    s = x.shape[1]
    pad = _ceil_to(s, block) - s
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))
    return x


def _fold_heads(x):
    # (B, S, H, D) -> (B*H, S, D)
    b, s, h, d = x.shape
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, s, d)


def _unfold_heads(x, b, h):
    bh, s, d = x.shape
    return jnp.transpose(x.reshape(b, h, s, d), (0, 2, 1, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(q3, k3, v3, scale, block_q, block_k, interpret):
    o, _ = _flash_fwd_impl(q3, k3, v3, scale, block_q, block_k, interpret)
    return o


def _flash_fwd_impl(q3, k3, v3, scale, block_q, block_k, interpret):
    kv_len = k3.shape[1]
    sq = q3.shape[1]
    qp = _pad_seq(q3, block_q)
    kp = _pad_seq(k3, block_k)
    vp = _pad_seq(v3, block_k)

    bh, sqp, d = qp.shape
    grid = (bh, sqp // block_q, kp.shape[1] // block_k)
    kernel = functools.partial(_fwd_kernel, scale=scale, kv_len=kv_len)
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, iq, ik: (b, iq, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sqp, d), q3.dtype),
            jax.ShapeDtypeStruct((bh, sqp, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp)
    return o[:, :sq], lse


def _flash_fwd(q3, k3, v3, scale, block_q, block_k, interpret):
    o, lse = _flash_fwd_impl(q3, k3, v3, scale, block_q, block_k, interpret)
    return o, (q3, k3, v3, o, lse)


def _flash_bwd(scale, block_q, block_k, interpret, residuals, g):
    q3, k3, v3, o, lse_p = residuals  # lse_p is already (BH, Sq_padded, 1)
    kv_len = k3.shape[1]
    sq = q3.shape[1]

    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)

    qp = _pad_seq(q3, block_q)
    kp = _pad_seq(k3, block_k)
    vp = _pad_seq(v3, block_k)
    gp = _pad_seq(g, block_q)
    bh, sqp, d = qp.shape
    skp = kp.shape[1]
    delta_p = _pad_seq(delta[..., None], block_q)

    nq = sqp // block_q
    nk = skp // block_k

    stat_spec_q = pl.BlockSpec((1, block_q, 1), lambda b, iq, ik: (b, iq, 0))

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, kv_len=kv_len),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            stat_spec_q,
            stat_spec_q,
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sqp, d), q3.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(qp, kp, vp, gp, lse_p, delta_p)

    stat_spec_kgrid = pl.BlockSpec((1, block_q, 1), lambda b, ik, iq: (b, iq, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, kv_len=kv_len),
        grid=(bh, nk, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, ik, iq: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, ik, iq: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, ik, iq: (b, ik, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, ik, iq: (b, iq, 0)),
            stat_spec_kgrid,
            stat_spec_kgrid,
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, ik, iq: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, ik, iq: (b, ik, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, skp, d), k3.dtype),
            jax.ShapeDtypeStruct((bh, skp, d), v3.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, gp, lse_p, delta_p)

    return dq[:, :sq], dk[:, :kv_len], dv[:, :kv_len]


_flash.defvjp(_flash_fwd, _flash_bwd)


_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the 16 MB scoped limit


def _fit_blocks_to_vmem(block_q: int, block_k: int, d: int):
    """Shrink tile sizes until the kernel's VMEM footprint fits.

    Estimate (fwd, which matches the bwd kernels' shape): double-buffered
    q/k/v/do input tiles + output tile (bf16), two (bq, bk) f32 logits
    buffers, f32 accumulator + softmax stats. Large head dims (the VAE's
    single-head d=512 mid-block) overflow the 16 MB scoped VMEM with the
    default 1024x1024 tiles — observed as a Mosaic scoped-allocation error.
    """
    dp = _ceil_to(d, 128)

    def est(bq, bk):
        inputs = 2 * (bq * dp + 2 * bk * dp + bq * dp) * 2  # dbl-buffered bf16
        logits = 2 * bq * bk * 4
        acc = bq * dp * 4 + 2 * bq * 128 * 4 + bq * dp * 2
        return inputs + logits + acc

    while est(block_q, block_k) > _VMEM_BUDGET and max(block_q, block_k) > 256:
        if block_q >= block_k:
            block_q //= 2
        else:
            block_k //= 2
    return block_q, block_k


def flash_attention(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Flash attention over (B, S, H, D) tensors; numerics match
    ``ops.attention.dot_product_attention``."""
    if scale is None:
        scale = query.shape[-1] ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    b, sq, h, d = query.shape
    block_q = min(block_q, _ceil_to(sq, 128))
    block_k = min(block_k, _ceil_to(key.shape[1], 128))
    block_q, block_k = _fit_blocks_to_vmem(block_q, block_k, d)

    q3 = _fold_heads(query)
    k3 = _fold_heads(key)
    v3 = _fold_heads(value)
    o = _flash(q3, k3, v3, float(scale), block_q, block_k, bool(interpret))
    return _unfold_heads(o, b, h)
