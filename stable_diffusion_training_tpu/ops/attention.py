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

import functools
from typing import Optional

import jax
import jax.numpy as jnp


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
        # flash wins when the logits matrix is large (self-attention over
        # spatial tokens); for short/medium key sequences (77/227-token text
        # cross-attention, 1024-token mid levels) the fused XLA path wins and
        # fuses better with its neighbors. v5e sweep (benchmarks/flash_ab.py):
        # 4096 tokens fwd+bwd flash 254ms vs xla 294ms; 1024 tokens flash
        # 23.2ms vs xla 21.0ms; 16k tokens flash-only — xla OOMs.
        use_flash = _flash_available() and key.shape[1] >= 2048
        backend = "flash" if use_flash else "xla"
    if backend == "flash":
        from .flash_attention import flash_attention, flash_supported

        if flash_supported(query, key, mask):
            return flash_attention(query, key, value, scale=scale)
        backend = "xla"
    if backend == "xla":
        return dot_product_attention(query, key, value, mask=mask, scale=scale)
    raise ValueError(f"unknown attention backend: {backend!r}")
