"""UNet building blocks: timestep embeddings, ResNet blocks, resampling, and
the composite down/mid/up blocks.

Capability parity with the diffusers 0.21.4 Flax UNet internals the reference
loads (``/root/reference/training_utils.py:209-214``); everything here is
NHWC-native and built for XLA:TPU fusion (SiLU/GroupNorm epilogues fuse into
the convs; time-embedding broadcast is a single add).
"""

import math
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
from flax.linen.dtypes import promote_dtype

from ..ops.conv import polyphase_stride2_conv
from .attention import Transformer2DModel


def get_sinusoidal_embeddings(
    timesteps: jnp.ndarray,
    embedding_dim: int,
    flip_sin_to_cos: bool = True,
    freq_shift: float = 0.0,
    max_period: float = 10000.0,
    scale: float = 1.0,
) -> jnp.ndarray:
    """Sinusoidal position/timestep embedding (SD uses flip_sin_to_cos=True,
    freq_shift=0)."""
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = scale * emb
    if flip_sin_to_cos:
        return jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=-1)
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class TimestepEmbedding(nn.Module):
    """Two-layer MLP lifting the sinusoidal embedding to the UNet time dim."""

    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, temb):
        temb = nn.Dense(
            self.time_embed_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="linear_1",
        )(temb)
        temb = nn.silu(temb)
        return nn.Dense(
            self.time_embed_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="linear_2",
        )(temb)


class ResnetBlock2D(nn.Module):
    """GroupNorm-SiLU-Conv x2 with additive time embedding and skip."""

    out_channels: int
    use_conv_shortcut: bool = False
    dropout: float = 0.0
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, temb=None, deterministic: bool = True):
        in_channels = hidden_states.shape[-1]
        residual = hidden_states

        conv = lambda name: nn.Conv(  # noqa: E731
            self.out_channels,
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )
        norm = lambda name: nn.GroupNorm(  # noqa: E731
            num_groups=self.groups,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )

        hidden_states = norm("norm1")(hidden_states)
        hidden_states = nn.silu(hidden_states)
        hidden_states = conv("conv1")(hidden_states)

        if temb is not None:
            temb_proj = nn.Dense(
                self.out_channels,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="time_emb_proj",
            )(nn.silu(temb))
            hidden_states = hidden_states + temb_proj[:, None, None, :]

        hidden_states = norm("norm2")(hidden_states)
        hidden_states = nn.silu(hidden_states)
        if self.dropout > 0.0:
            hidden_states = nn.Dropout(rate=self.dropout)(
                hidden_states, deterministic=deterministic
            )
        hidden_states = conv("conv2")(hidden_states)

        if in_channels != self.out_channels:
            if self.use_conv_shortcut:
                residual = conv("conv_shortcut")(residual)
            else:
                residual = nn.Conv(
                    self.out_channels,
                    kernel_size=(1, 1),
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name="conv_shortcut",
                )(residual)
        return hidden_states + residual


class _PolyphaseStride2Conv(nn.Module):
    """Drop-in for the stride-2 3x3 ``nn.Conv``, computed as four stride-1
    polyphase convs (``ops.conv.polyphase_stride2_conv``). Param names and
    shapes (``kernel``/``bias``) are identical to ``nn.Conv``, so checkpoints
    are interchangeable between the two forms."""

    features: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    asymmetric_padding: bool = True

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features),
            self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), self.param_dtype
        )
        x, kernel, bias = promote_dtype(x, kernel, bias, dtype=self.dtype)
        return polyphase_stride2_conv(x, kernel, self.asymmetric_padding) + bias


class Downsample2D(nn.Module):
    """Stride-2 3x3 conv downsample."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    # VAE encoder uses asymmetric (0,1) padding; UNet uses symmetric 1.
    asymmetric_padding: bool = False
    # polyphase: compute the same 9 taps as four stride-1 convs; param tree
    # is unchanged, output allclose (f32-accumulated either way). Measured
    # SLOWER on-chip (benchmarks/downsample_poly_ab.py) — kept as a
    # documented negative result, off by default.
    polyphase: bool = False

    @nn.compact
    def __call__(self, hidden_states):
        if self.polyphase:
            return _PolyphaseStride2Conv(
                self.out_channels,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                asymmetric_padding=self.asymmetric_padding,
                name="conv",
            )(hidden_states)
        pad = ((0, 1), (0, 1)) if self.asymmetric_padding else ((1, 1), (1, 1))
        return nn.Conv(
            self.out_channels,
            kernel_size=(3, 3),
            strides=(2, 2),
            padding=pad,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(hidden_states)


class Upsample2D(nn.Module):
    """Nearest 2x upsample followed by a 3x3 conv."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states):
        b, h, w, c = hidden_states.shape
        hidden_states = jnp.repeat(jnp.repeat(hidden_states, 2, axis=1), 2, axis=2)
        return nn.Conv(
            self.out_channels,
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(hidden_states)


class CrossAttnDownBlock2D(nn.Module):
    """N x (ResNet + Transformer2D), optional downsample; returns skips."""

    out_channels: int
    num_layers: int = 2
    transformer_layers_per_block: int = 1
    heads: int = 8
    dim_head: int = 64
    cross_attention_dim: int = 768
    dropout: float = 0.0
    add_downsample: bool = True
    use_linear_projection: bool = False
    only_cross_attention: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attention_backend: str = "auto"

    @nn.compact
    def __call__(self, hidden_states, temb, context, deterministic: bool = True):
        output_states = ()
        for i in range(self.num_layers):
            hidden_states = ResnetBlock2D(
                out_channels=self.out_channels,
                dropout=self.dropout,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"resnets_{i}",
            )(hidden_states, temb, deterministic=deterministic)
            hidden_states = Transformer2DModel(
                in_channels=self.out_channels,
                heads=self.heads,
                dim_head=self.dim_head,
                depth=self.transformer_layers_per_block,
                cross_attention_dim=self.cross_attention_dim,
                dropout=self.dropout,
                use_linear_projection=self.use_linear_projection,
                only_cross_attention=self.only_cross_attention,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                attention_backend=self.attention_backend,
                name=f"attentions_{i}",
            )(hidden_states, context, deterministic=deterministic)
            output_states += (hidden_states,)

        if self.add_downsample:
            hidden_states = Downsample2D(
                self.out_channels,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="downsamplers_0",
            )(hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states


class DownBlock2D(nn.Module):
    """N x ResNet, optional downsample; returns skips."""

    out_channels: int
    num_layers: int = 2
    dropout: float = 0.0
    add_downsample: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, temb, deterministic: bool = True):
        output_states = ()
        for i in range(self.num_layers):
            hidden_states = ResnetBlock2D(
                out_channels=self.out_channels,
                dropout=self.dropout,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"resnets_{i}",
            )(hidden_states, temb, deterministic=deterministic)
            output_states += (hidden_states,)

        if self.add_downsample:
            hidden_states = Downsample2D(
                self.out_channels,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="downsamplers_0",
            )(hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states


class UNetMidBlock2DCrossAttn(nn.Module):
    """ResNet -> N x (Transformer2D + ResNet)."""

    in_channels: int
    num_layers: int = 1
    transformer_layers_per_block: int = 1
    heads: int = 8
    dim_head: int = 64
    cross_attention_dim: int = 768
    dropout: float = 0.0
    use_linear_projection: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attention_backend: str = "auto"

    @nn.compact
    def __call__(self, hidden_states, temb, context, deterministic: bool = True):
        hidden_states = ResnetBlock2D(
            out_channels=self.in_channels,
            dropout=self.dropout,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="resnets_0",
        )(hidden_states, temb, deterministic=deterministic)
        for i in range(self.num_layers):
            hidden_states = Transformer2DModel(
                in_channels=self.in_channels,
                heads=self.heads,
                dim_head=self.dim_head,
                depth=self.transformer_layers_per_block,
                cross_attention_dim=self.cross_attention_dim,
                dropout=self.dropout,
                use_linear_projection=self.use_linear_projection,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                attention_backend=self.attention_backend,
                name=f"attentions_{i}",
            )(hidden_states, context, deterministic=deterministic)
            hidden_states = ResnetBlock2D(
                out_channels=self.in_channels,
                dropout=self.dropout,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"resnets_{i + 1}",
            )(hidden_states, temb, deterministic=deterministic)
        return hidden_states


class CrossAttnUpBlock2D(nn.Module):
    """N x (ResNet(skip concat) + Transformer2D), optional upsample."""

    out_channels: int
    num_layers: int = 3
    transformer_layers_per_block: int = 1
    heads: int = 8
    dim_head: int = 64
    cross_attention_dim: int = 768
    dropout: float = 0.0
    add_upsample: bool = True
    use_linear_projection: bool = False
    only_cross_attention: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attention_backend: str = "auto"

    @nn.compact
    def __call__(
        self,
        hidden_states,
        res_hidden_states_tuple: Tuple[jnp.ndarray, ...],
        temb,
        context,
        deterministic: bool = True,
    ):
        for i in range(self.num_layers):
            res_hidden = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = jnp.concatenate([hidden_states, res_hidden], axis=-1)
            hidden_states = ResnetBlock2D(
                out_channels=self.out_channels,
                dropout=self.dropout,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"resnets_{i}",
            )(hidden_states, temb, deterministic=deterministic)
            hidden_states = Transformer2DModel(
                in_channels=self.out_channels,
                heads=self.heads,
                dim_head=self.dim_head,
                depth=self.transformer_layers_per_block,
                cross_attention_dim=self.cross_attention_dim,
                dropout=self.dropout,
                use_linear_projection=self.use_linear_projection,
                only_cross_attention=self.only_cross_attention,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                attention_backend=self.attention_backend,
                name=f"attentions_{i}",
            )(hidden_states, context, deterministic=deterministic)

        if self.add_upsample:
            hidden_states = Upsample2D(
                self.out_channels,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="upsamplers_0",
            )(hidden_states)
        return hidden_states


class UpBlock2D(nn.Module):
    """N x ResNet(skip concat), optional upsample."""

    out_channels: int
    num_layers: int = 3
    dropout: float = 0.0
    add_upsample: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states,
        res_hidden_states_tuple: Tuple[jnp.ndarray, ...],
        temb,
        deterministic: bool = True,
    ):
        for i in range(self.num_layers):
            res_hidden = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = jnp.concatenate([hidden_states, res_hidden], axis=-1)
            hidden_states = ResnetBlock2D(
                out_channels=self.out_channels,
                dropout=self.dropout,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"resnets_{i}",
            )(hidden_states, temb, deterministic=deterministic)

        if self.add_upsample:
            hidden_states = Upsample2D(
                self.out_channels,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="upsamplers_0",
            )(hidden_states)
        return hidden_states
