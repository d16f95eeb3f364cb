"""TPU compute kernels.

The reference delegates every hot op to XLA via ``jax.jit`` and patches
diffusers' chunked attention to a single full-length chunk
(``/root/reference/key_chunk_patch.patch``; SURVEY.md §2.12/§2.14). Here the
hot ops are first-class:

- ``attention``: the single attention primitive used by every model (self- and
  cross-attention). A jnp reference implementation defines the numerics; a
  Pallas flash-attention kernel (``flash_attention``) provides the TPU fast
  path with identical math (fwd + custom-VJP bwd).
- ``lion_kernel``: fused 8-bit Lion momentum update (dequant -> lion ->
  requant in one pass over int8 blocks).
"""

from .attention import dot_product_attention, attention

__all__ = ["dot_product_attention", "attention"]
