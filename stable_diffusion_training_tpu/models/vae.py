"""AutoencoderKL — the latent VAE, NHWC-native, encode-fast-path first.

Replaces the reference's HF ``FlaxAutoencoderKL`` import
(``/root/reference/training_utils.py:218-222``). Training only ever calls
``encode`` + ``DiagonalGaussianDistribution.sample``
(``/root/reference/training_utils.py:574-586``); decode exists for the
inference pipeline. Mid-block attention uses the shared ``ops.attention``
primitive (single head over spatial tokens). Module nesting mirrors the
diffusers torch key structure (``encoder.down_blocks.0.resnets.0...``) so
checkpoints convert 1:1 in both directions (``hf_io``).
"""

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.configuration import ConfigurableMixin
from ..ops.attention import attention
from .blocks import Downsample2D, ResnetBlock2D, Upsample2D


class DiagonalGaussianDistribution:
    """Latent posterior q(z|x): mean/logvar split from the encoder moments.

    Moments are channel-concatenated along the trailing (NHWC) or channel
    (NCHW) axis; ``axis`` selects which.
    """

    def __init__(self, parameters: jnp.ndarray, axis: int = -1):
        self.mean, self.logvar = jnp.split(parameters, 2, axis=axis)
        self.logvar = jnp.clip(self.logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        return self.mean + self.std * jax.random.normal(
            key, self.mean.shape, dtype=self.mean.dtype
        )

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self) -> jnp.ndarray:
        return 0.5 * jnp.sum(
            self.mean**2 + self.var - 1.0 - self.logvar,
            axis=tuple(range(1, self.mean.ndim)),
        )


class _EncodeOutput:
    def __init__(self, latent_dist):
        self.latent_dist = latent_dist


class _DecodeOutput:
    def __init__(self, sample):
        self.sample = sample


class VaeAttentionBlock(nn.Module):
    """Single-head full self-attention over spatial tokens (VAE mid block)."""

    channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attention_backend: str = "auto"

    @nn.compact
    def __call__(self, hidden_states):
        b, h, w, c = hidden_states.shape
        residual = hidden_states
        hidden_states = nn.GroupNorm(
            num_groups=32,
            epsilon=1e-6,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="group_norm",
        )(hidden_states)
        hidden_states = hidden_states.reshape(b, h * w, c)

        dense = lambda name: nn.Dense(  # noqa: E731
            self.channels, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        q = dense("query")(hidden_states)[:, :, None, :]
        k = dense("key")(hidden_states)[:, :, None, :]
        v = dense("value")(hidden_states)[:, :, None, :]
        # auto: flash for >=2048 spatial tokens (>=384² inputs) — avoids
        # materializing the (S, S) f32 logits (805 MB/batch-12 at 512²);
        # the frozen-VAE training path only ever runs this forward
        out = attention(q, k, v, backend=self.attention_backend)[:, :, 0, :]
        out = dense("proj_attn")(out)
        return out.reshape(b, h, w, c) + residual


class DownEncoderBlock2D(nn.Module):
    out_channels: int
    num_layers: int
    add_downsample: bool
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    polyphase_downsample: bool = False

    @nn.compact
    def __call__(self, sample, deterministic: bool = True):
        for j in range(self.num_layers):
            sample = ResnetBlock2D(
                out_channels=self.out_channels,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"resnets_{j}",
            )(sample, deterministic=deterministic)
        if self.add_downsample:
            sample = Downsample2D(
                self.out_channels,
                asymmetric_padding=True,
                polyphase=self.polyphase_downsample,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="downsamplers_0",
            )(sample)
        return sample


class UpDecoderBlock2D(nn.Module):
    out_channels: int
    num_layers: int
    add_upsample: bool
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, deterministic: bool = True):
        for j in range(self.num_layers):
            sample = ResnetBlock2D(
                out_channels=self.out_channels,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"resnets_{j}",
            )(sample, deterministic=deterministic)
        if self.add_upsample:
            sample = Upsample2D(
                self.out_channels,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="upsamplers_0",
            )(sample)
        return sample


class VaeMidBlock(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attention_backend: str = "auto"

    @nn.compact
    def __call__(self, sample, deterministic: bool = True):
        sample = ResnetBlock2D(
            out_channels=self.channels,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="resnets_0",
        )(sample, deterministic=deterministic)
        sample = VaeAttentionBlock(
            self.channels,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            attention_backend=self.attention_backend,
            name="attentions_0",
        )(sample)
        return ResnetBlock2D(
            out_channels=self.channels,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="resnets_1",
        )(sample, deterministic=deterministic)


class Encoder(nn.Module):
    block_out_channels: Tuple[int, ...]
    layers_per_block: int
    latent_channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attention_backend: str = "auto"
    polyphase_downsample: bool = False

    @nn.compact
    def __call__(self, sample, deterministic: bool = True):
        sample = nn.Conv(
            self.block_out_channels[0],
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv_in",
        )(sample)

        for i, out_ch in enumerate(self.block_out_channels):
            sample = DownEncoderBlock2D(
                out_channels=out_ch,
                num_layers=self.layers_per_block,
                add_downsample=i < len(self.block_out_channels) - 1,
                polyphase_downsample=self.polyphase_downsample,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"down_blocks_{i}",
            )(sample, deterministic=deterministic)

        sample = VaeMidBlock(
            self.block_out_channels[-1],
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            attention_backend=self.attention_backend,
            name="mid_block",
        )(sample, deterministic=deterministic)

        sample = nn.GroupNorm(
            num_groups=32,
            epsilon=1e-6,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv_norm_out",
        )(sample)
        sample = nn.silu(sample)
        return nn.Conv(
            2 * self.latent_channels,
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv_out",
        )(sample)


class Decoder(nn.Module):
    block_out_channels: Tuple[int, ...]
    layers_per_block: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attention_backend: str = "auto"

    @nn.compact
    def __call__(self, latents, deterministic: bool = True):
        mid_ch = self.block_out_channels[-1]
        sample = nn.Conv(
            mid_ch,
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv_in",
        )(latents)

        sample = VaeMidBlock(
            mid_ch,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            attention_backend=self.attention_backend,
            name="mid_block",
        )(sample, deterministic=deterministic)

        # up blocks walk the channel list reversed; layers_per_block + 1 resnets
        reversed_channels = tuple(reversed(self.block_out_channels))
        for i, out_ch in enumerate(reversed_channels):
            sample = UpDecoderBlock2D(
                out_channels=out_ch,
                num_layers=self.layers_per_block + 1,
                add_upsample=i < len(reversed_channels) - 1,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"up_blocks_{i}",
            )(sample, deterministic=deterministic)

        sample = nn.GroupNorm(
            num_groups=32,
            epsilon=1e-6,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv_norm_out",
        )(sample)
        sample = nn.silu(sample)
        return nn.Conv(
            self.out_channels,
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv_out",
        )(sample)


class VaeCore(nn.Module):
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attention_backend: str = "auto"
    polyphase_downsample: bool = False

    def setup(self):
        self.encoder = Encoder(
            block_out_channels=self.block_out_channels,
            layers_per_block=self.layers_per_block,
            latent_channels=self.latent_channels,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            attention_backend=self.attention_backend,
            polyphase_downsample=self.polyphase_downsample,
        )
        self.decoder = Decoder(
            block_out_channels=self.block_out_channels,
            layers_per_block=self.layers_per_block,
            out_channels=self.out_channels,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            attention_backend=self.attention_backend,
        )
        self.quant_conv = nn.Conv(
            2 * self.latent_channels,
            kernel_size=(1, 1),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        self.post_quant_conv = nn.Conv(
            self.latent_channels,
            kernel_size=(1, 1),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

    def encode(self, sample, deterministic: bool = True):
        return self.quant_conv(self.encoder(sample, deterministic=deterministic))

    def decode(self, latents, deterministic: bool = True):
        return self.decoder(self.post_quant_conv(latents), deterministic=deterministic)

    def __call__(self, sample, rng, deterministic: bool = True):
        moments = self.encode(sample, deterministic=deterministic)
        posterior = DiagonalGaussianDistribution(moments, axis=-1)
        return self.decode(posterior.sample(rng), deterministic=deterministic)


class AutoencoderKL(ConfigurableMixin):
    """Configured VAE with the reference's public surface.

    ``encode``/``decode`` accept NCHW (reference-compatible default) or NHWC;
    ``encode`` returns an object with ``.latent_dist`` exactly like diffusers
    (``/root/reference/training_utils.py:574-580`` consumes that shape).
    """

    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        block_out_channels=(128, 256, 512, 512),
        layers_per_block: int = 2,
        latent_channels: int = 4,
        sample_size: int = 512,
        scaling_factor: float = 0.18215,
        dtype: jnp.dtype = jnp.float32,
        param_dtype: jnp.dtype = jnp.float32,
        data_format: str = "NCHW",
        attention_backend: str = "auto",
        polyphase_downsample: bool = False,
    ):
        self._register_config(dict(locals()))
        assert data_format in ("NCHW", "NHWC")
        self.data_format = data_format
        self.dtype = dtype
        self.module = VaeCore(
            block_out_channels=tuple(block_out_channels),
            layers_per_block=layers_per_block,
            in_channels=in_channels,
            out_channels=out_channels,
            latent_channels=latent_channels,
            dtype=dtype,
            param_dtype=param_dtype,
            attention_backend=attention_backend,
            polyphase_downsample=polyphase_downsample,
        )

    ignore_for_config = (
        "dtype", "param_dtype", "data_format", "attention_backend",
        "polyphase_downsample",
    )

    def init(self, rng, batch_size: int = 1, resolution: int = 32):
        sample = jnp.zeros((batch_size, resolution, resolution, 3), self.dtype)
        return jax.jit(self.module.init)(
            {"params": rng}, sample, jax.random.PRNGKey(0)
        )["params"]

    def _to_nhwc(self, x):
        return jnp.transpose(x, (0, 2, 3, 1)) if self.data_format == "NCHW" else x

    def _from_nhwc(self, x):
        return jnp.transpose(x, (0, 3, 1, 2)) if self.data_format == "NCHW" else x

    def encode(self, sample, params, deterministic: bool = True):
        if not isinstance(params, dict) or "params" not in params:
            params = {"params": params}
        moments = self.module.apply(
            params,
            self._to_nhwc(sample),
            deterministic=deterministic,
            method=self.module.encode,
        )
        moments = self._from_nhwc(moments)
        axis = 1 if self.data_format == "NCHW" else -1
        return _EncodeOutput(DiagonalGaussianDistribution(moments, axis=axis))

    def decode(self, latents, params, deterministic: bool = True):
        if not isinstance(params, dict) or "params" not in params:
            params = {"params": params}
        sample = self.module.apply(
            params,
            self._to_nhwc(latents),
            deterministic=deterministic,
            method=self.module.decode,
        )
        return _DecodeOutput(self._from_nhwc(sample))

    # FrozenModel compatibility: vae.apply({"params": p}, sample=x,
    # method=...) is the exact reference call shape (training_utils.py:574-579)
    def apply(self, variables, sample=None, *, method=None, deterministic=True, **kw):
        name = getattr(method, "__name__", method) or "encode"
        if name == "encode":
            return self.encode(sample, variables, deterministic=deterministic)
        if name == "decode":
            return self.decode(sample, variables, deterministic=deterministic)
        raise ValueError(f"unknown method {method!r}")

    def _diffusers_class_name(self) -> str:
        return "AutoencoderKL"
