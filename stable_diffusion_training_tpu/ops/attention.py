"""Attention primitive: jnp reference numerics + backend dispatch.

This replaces the reference's attention stack — diffusers'
``jax_memory_efficient_attention`` re-tuned by ``key_chunk_patch.patch`` to a
single full-length key chunk (``/root/reference/key_chunk_patch.patch:4-7``,
SURVEY.md §2.12). Instead of chunk-size tuning, the TPU-native design exposes
one functional primitive with two backends:

- ``"xla"``: fused einsum attention with fp32 softmax accumulation — what the
  patched reference computes, but laid out for the MXU (batched heads, bf16
  matmuls, fp32 accumulation via ``preferred_element_type``).
- ``"flash"``: Pallas blockwise online-softmax kernel
  (``ops.flash_attention``), used on TPU for long spatial sequences.

All tensors are ``(batch, seq, heads, head_dim)`` — the layout convolutions
naturally produce after a reshape, avoiding transposes on the hot path.
"""

import contextlib
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec

# Auto-dispatch thresholds (env-overridable so benchmarks/*_ab.py can A/B
# them on the real chip without code edits):
# - flash (Pallas) when keys are long — spatial self-attention
#   (4096..16k tokens), where the O(S²) logits can't exist at all;
# - rematerialized XLA when only the QUERY is long — caption
#   cross-attention (Sq=4096, Sk=227 at 512²). The (B*H, Sq, Sk) f32
#   softmax residuals of the plain XLA path dominated training temporaries
#   and capped the batch at 15 on 16G v5e (PERF_NOTES.md round-2);
#   jax.checkpoint recomputes them in the backward instead (the extra
#   QK^T at Sk=227 is noise next to the UNet matmuls). The Pallas kernel
#   is NOT used here: its layout-constrained operand copies pad
#   head_dim 40→128 lanes (3.2x HBM expansion per operand), which costs
#   more than the logits it avoids.
FLASH_MIN_KEY = int(os.environ.get("SDT_FLASH_MIN_KEY", "2048"))
REMAT_MIN_QUERY = int(os.environ.get("SDT_REMAT_MIN_QUERY", "1024"))
# query-chunk size for the long-query/short-key path: each chunk's f32
# logits block is (B, H, CHUNK, Sk) and chunks are individually
# rematerialized, so at batch 16 the biggest live logits temp drops from
# 464 MB (full 4096-row remat recompute — measured as THE allocation that
# pushed b16 136 MB over the 16G HBM ceiling) to ~116 MB
QUERY_CHUNK = int(os.environ.get("SDT_QUERY_CHUNK", "1024"))

# Mesh context for partitioning the Pallas flash kernel. ``pallas_call`` is a
# custom call with no GSPMD partitioning rule, so on a sharded mesh XLA must
# all-gather its operands to replicated and run the full kernel on every
# device — the exact opposite of tensor parallelism. Attention is
# embarrassingly parallel over (batch, heads), so when a mesh context is set
# the flash path runs inside ``jax.shard_map`` manual over the batch and head
# axes (heads sharded by the Megatron column-parallel q/k/v projections,
# ``parallel/sharding.py``): each device runs the kernel on its local
# (B/dp, S, H/tp, D) block with ZERO collectives. All other mesh axes (fsdp)
# stay in GSPMD auto mode. Enabled by ``train.states`` whenever states are
# placed on a mesh with a nontrivial batch or head axis.
_ATTENTION_MESH = None  # (mesh, batch_axis, head_axis) | None


def set_attention_mesh(
    mesh,
    batch_axis: str = "data_parallel",
    head_axis: str = "model_parallel",
) -> None:
    """Process-level default mesh for partitioned flash attention (pass
    ``None`` to clear). Affects subsequent traces, like flax's axis-rules
    context; scoped alternative: ``attention_mesh``."""
    global _ATTENTION_MESH
    _ATTENTION_MESH = None if mesh is None else (mesh, batch_axis, head_axis)


@contextlib.contextmanager
def attention_mesh(
    mesh,
    batch_axis: str = "data_parallel",
    head_axis: str = "model_parallel",
):
    global _ATTENTION_MESH
    prev = _ATTENTION_MESH
    set_attention_mesh(mesh, batch_axis, head_axis)
    try:
        yield
    finally:
        _ATTENTION_MESH = prev


def _shard_mapped_flash(query, key, value, scale):
    """Flash attention partitioned over (batch, heads); None if no mesh
    context applies (then the caller runs the kernel unpartitioned)."""
    ctx = _ATTENTION_MESH
    if ctx is None:
        return None
    mesh, batch_axis, head_axis = ctx
    sizes = dict(mesh.shape)
    b, h = query.shape[0], query.shape[2]
    baxis = batch_axis if sizes.get(batch_axis, 1) > 1 and b % sizes[batch_axis] == 0 else None
    haxis = head_axis if sizes.get(head_axis, 1) > 1 and h % sizes[head_axis] == 0 else None
    manual = {a for a in (baxis, haxis) if a}
    if not manual:
        return None
    from .flash_attention import flash_attention

    spec = PartitionSpec(baxis, None, haxis, None)
    fn = jax.shard_map(
        functools.partial(flash_attention, scale=scale),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        axis_names=manual,
        check_vma=False,
    )
    return fn(query, key, value)


def dot_product_attention(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Reference attention: softmax(q k^T * scale) v with fp32 softmax.

    Shapes: q ``(B, Sq, H, D)``, k/v ``(B, Sk, H, D)``; mask broadcastable to
    ``(B, H, Sq, Sk)`` (additive, -inf for masked). Returns ``(B, Sq, H, D)``
    in the query dtype.
    """
    if scale is None:
        scale = query.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", query, key, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if mask is not None:
        logits = logits + mask.astype(logits.dtype)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd",
        weights.astype(query.dtype),
        value,
        preferred_element_type=jnp.float32,
    )
    return out.astype(query.dtype)


@functools.lru_cache(maxsize=None)
def _flash_available() -> bool:
    try:
        from . import flash_attention  # noqa: F401

        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - import guard
        return False


def attention(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    backend: str = "auto",
) -> jnp.ndarray:
    """Dispatching attention primitive used by every model.

    ``backend``: ``"auto"`` (flash on TPU when shapes allow, else xla),
    ``"flash"``, or ``"xla"``.
    """
    if backend == "auto":
        # see module docstring for the three-way policy. v5e sweep
        # (benchmarks/flash_ab.py): self 4096 fwd+bwd flash 254ms vs xla
        # 294ms; self 1024 flash 23.2ms vs xla 21.0ms; 16k flash-only (xla
        # OOMs). Short both-ways (77/227-key cross at mid levels,
        # 64..256-token self) the plain fused XLA path wins and fuses
        # better with its neighbors.
        if _flash_available() and mask is None and key.shape[1] >= FLASH_MIN_KEY:
            backend = "flash"
        elif query.shape[1] >= REMAT_MIN_QUERY:
            backend = "xla_remat"
        else:
            backend = "xla"
    if backend == "flash":
        from .flash_attention import flash_attention, flash_supported

        if flash_supported(query, key, mask):
            sharded = _shard_mapped_flash(query, key, value, scale)
            if sharded is not None:
                return sharded
            return flash_attention(query, key, value, scale=scale)
        backend = "xla"
    if backend == "xla_remat":
        # identical numerics to "xla" (each query row sees the FULL key set,
        # so per-chunk softmax is exact — no online rescaling); the f32
        # logits/softmax of each chunk are recomputed in the backward pass
        # instead of saved as residuals, and chunking the query keeps the
        # single live recompute block small
        sq = query.shape[1]
        chunk = QUERY_CHUNK
        body = jax.checkpoint(
            functools.partial(dot_product_attention, scale=scale)
        )
        if mask is not None or sq <= chunk or sq % chunk:
            return body(query, key, value, mask)
        outs = [
            body(query[:, i : i + chunk], key, value, None)
            for i in range(0, sq, chunk)
        ]
        return jnp.concatenate(outs, axis=1)
    if backend == "xla":
        return dot_product_attention(query, key, value, mask=mask, scale=scale)
    raise ValueError(f"unknown attention backend: {backend!r}")
