"""Transformer blocks for the UNet: multi-head attention, GEGLU FF,
BasicTransformerBlock, and the spatial Transformer2DModel.

Behavior parity targets (shapes/numerics, not code) are diffusers 0.21.4's
``attention_flax.py`` classes as loaded by the reference at
``/root/reference/training_utils.py:209-214`` with
``use_memory_efficient_attention=True`` + ``key_chunk_patch.patch`` — i.e.
exact (non-approximated) attention. TPU-first differences:

- one functional attention primitive (``ops.attention``) shared by self- and
  cross-attention, backed by a Pallas flash kernel on TPU;
- all spatial tensors NHWC; heads kept in the trailing-dim layout
  ``(B, S, H, D)`` so q/k/v projections are single MXU matmuls with no
  transposes;
- fp32 softmax accumulation regardless of the bf16 compute dtype.
"""

import os
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import attention

# Rematerialize the GEGLU feed-forward blocks: their (B, S, 4*dim) bf16
# intermediates are among the largest saved residuals at big batches
# (measured 320 MB apiece for SD1.5 512² b16 L0), and recomputing them in
# the backward costs only two matmuls. Process-level toggle set from
# TrainingConfig.ff_gradient_checkpointing by train.states (trace-time
# setting, like ops.attention's mesh context); SDT_REMAT_FF=1 overrides the
# default for benchmarks. Remat never changes numerics.
_REMAT_FF = os.environ.get("SDT_REMAT_FF", "0") == "1"


def set_remat_ff(enabled: bool) -> None:
    global _REMAT_FF
    _REMAT_FF = bool(enabled)


def remat_ff_enabled() -> bool:
    return _REMAT_FF


class Attention(nn.Module):
    """Multi-head (self or cross) attention with fused head projections.

    ``query_dim``-sized input; context defaults to the hidden states
    (self-attention).
    """

    query_dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    use_linear_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attention_backend: str = "auto"

    @nn.compact
    def __call__(self, hidden_states, context=None, deterministic: bool = True):
        context = hidden_states if context is None else context
        inner_dim = self.heads * self.dim_head

        dense = lambda name: nn.Dense(  # noqa: E731
            inner_dim,
            use_bias=self.use_linear_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )
        q = dense("to_q")(hidden_states)
        k = dense("to_k")(context)
        v = dense("to_v")(context)

        b, sq = q.shape[0], q.shape[1]
        sk = k.shape[1]
        q = q.reshape(b, sq, self.heads, self.dim_head)
        k = k.reshape(b, sk, self.heads, self.dim_head)
        v = v.reshape(b, sk, self.heads, self.dim_head)

        out = attention(q, k, v, backend=self.attention_backend)
        out = out.reshape(b, sq, inner_dim)

        out = nn.Dense(
            self.query_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="to_out",
        )(out)
        if self.dropout > 0.0:
            out = nn.Dropout(rate=self.dropout)(out, deterministic=deterministic)
        return out


class GEGLU(nn.Module):
    """Gated GELU feed-forward input projection: proj to 2x dim, gate."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states):
        hidden = nn.Dense(
            self.dim_out * 2,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="proj",
        )(hidden_states)
        hidden, gate = jnp.split(hidden, 2, axis=-1)
        return hidden * nn.gelu(gate)


class FeedForward(nn.Module):
    """Transformer FF: GEGLU expansion (mult=4) then projection back."""

    dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, deterministic: bool = True):
        hidden = GEGLU(
            self.dim * self.mult,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="net_0",
        )(hidden_states)
        if self.dropout > 0.0:
            hidden = nn.Dropout(rate=self.dropout)(hidden, deterministic=deterministic)
        return nn.Dense(
            self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="net_2"
        )(hidden)


class BasicTransformerBlock(nn.Module):
    """Self-attn -> cross-attn -> FF, each pre-LayerNormed with residuals."""

    dim: int
    heads: int
    dim_head: int
    cross_attention_dim: Optional[int] = None
    dropout: float = 0.0
    only_cross_attention: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attention_backend: str = "auto"

    @nn.compact
    def __call__(self, hidden_states, context, deterministic: bool = True):
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        attn = lambda name: Attention(  # noqa: E731
            query_dim=self.dim,
            heads=self.heads,
            dim_head=self.dim_head,
            dropout=self.dropout,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            attention_backend=self.attention_backend,
            name=name,
        )

        residual = hidden_states
        hidden_states = ln("norm1")(hidden_states)
        hidden_states = attn("attn1")(
            hidden_states,
            context=context if self.only_cross_attention else None,
            deterministic=deterministic,
        )
        hidden_states = hidden_states + residual

        residual = hidden_states
        hidden_states = ln("norm2")(hidden_states)
        hidden_states = attn("attn2")(
            hidden_states, context=context, deterministic=deterministic
        )
        hidden_states = hidden_states + residual

        residual = hidden_states
        hidden_states = ln("norm3")(hidden_states)
        ff_cls = (
            nn.remat(FeedForward, static_argnums=(-1,))
            if remat_ff_enabled()
            else FeedForward
        )
        hidden_states = ff_cls(
            dim=self.dim,
            dropout=self.dropout,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="ff",
        )(hidden_states, deterministic)
        return hidden_states + residual


class Transformer2DModel(nn.Module):
    """Spatial transformer: GroupNorm -> project in -> N transformer blocks
    over flattened ``H*W`` tokens -> project out -> residual.

    ``use_linear_projection`` selects Dense (SD2.x/SDXL) vs 1x1 conv (SD1.5)
    in/out projections. Input/output NHWC.
    """

    in_channels: int
    heads: int
    dim_head: int
    depth: int = 1
    cross_attention_dim: Optional[int] = None
    dropout: float = 0.0
    use_linear_projection: bool = False
    only_cross_attention: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attention_backend: str = "auto"

    @nn.compact
    def __call__(self, hidden_states, context, deterministic: bool = True):
        b, h, w, c = hidden_states.shape
        inner_dim = self.heads * self.dim_head
        residual = hidden_states

        hidden_states = nn.GroupNorm(
            num_groups=32,
            epsilon=1e-6,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="norm",
        )(hidden_states)

        if self.use_linear_projection:
            hidden_states = hidden_states.reshape(b, h * w, c)
            hidden_states = nn.Dense(
                inner_dim,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="proj_in",
            )(hidden_states)
        else:
            hidden_states = nn.Conv(
                inner_dim,
                kernel_size=(1, 1),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="proj_in",
            )(hidden_states)
            hidden_states = hidden_states.reshape(b, h * w, inner_dim)

        for i in range(self.depth):
            hidden_states = BasicTransformerBlock(
                dim=inner_dim,
                heads=self.heads,
                dim_head=self.dim_head,
                cross_attention_dim=self.cross_attention_dim,
                dropout=self.dropout,
                only_cross_attention=self.only_cross_attention,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                attention_backend=self.attention_backend,
                name=f"transformer_blocks_{i}",
            )(hidden_states, context, deterministic=deterministic)

        if self.use_linear_projection:
            hidden_states = nn.Dense(
                self.in_channels,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="proj_out",
            )(hidden_states)
            hidden_states = hidden_states.reshape(b, h, w, self.in_channels)
        else:
            hidden_states = hidden_states.reshape(b, h, w, inner_dim)
            hidden_states = nn.Conv(
                self.in_channels,
                kernel_size=(1, 1),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="proj_out",
            )(hidden_states)

        return hidden_states + residual
