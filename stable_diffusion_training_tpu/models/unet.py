"""UNet2DConditionModel — the denoiser, NHWC-native, SD1.5/2.1/SDXL-capable.

Replaces the reference's HF ``FlaxUNet2DConditionModel`` import
(``/root/reference/training_utils.py:209-214``). Same architecture family,
built TPU-first:

- NHWC activations end-to-end (one transpose at the public NCHW boundary);
- attention via ``ops.attention`` (Pallas flash kernel on TPU) instead of the
  key-chunk-patched diffusers path (SURVEY.md §2.12);
- optional gradient checkpointing (``jax.checkpoint`` through ``nn.remat``)
  per down/mid/up block for SDXL-scale memory (BASELINE config 4);
- SDXL ``addition_embed_type="text_time"`` micro-conditioning embeddings.
"""

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.configuration import ConfigurableMixin
from .blocks import (
    CrossAttnDownBlock2D,
    CrossAttnUpBlock2D,
    DownBlock2D,
    TimestepEmbedding,
    UNetMidBlock2DCrossAttn,
    UpBlock2D,
    get_sinusoidal_embeddings,
)


def _per_block(value, num_blocks: int) -> Tuple:
    """Broadcast a scalar-or-sequence config entry to one value per block."""
    if isinstance(value, (list, tuple)):
        assert len(value) == num_blocks, (value, num_blocks)
        return tuple(value)
    return (value,) * num_blocks


class UNetCore(nn.Module):
    """The flax module; see ``UNet2DConditionModel`` for the configured API."""

    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    transformer_layers_per_block: Tuple[int, ...] = 1
    attention_head_dim: Tuple[int, ...] = 8
    num_attention_heads: Optional[Tuple[int, ...]] = None
    cross_attention_dim: int = 768
    dropout: float = 0.0
    use_linear_projection: bool = False
    only_cross_attention: Tuple[bool, ...] = False
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    addition_embed_type: Optional[str] = None
    addition_time_embed_dim: Optional[int] = None
    projection_class_embeddings_input_dim: Optional[int] = None
    gradient_checkpointing: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    attention_backend: str = "auto"

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,
        timesteps: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
        added_cond_kwargs: Optional[dict] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """``sample``: NHWC latents; ``timesteps``: (B,) or scalar;
        ``encoder_hidden_states``: (B, S, cross_attention_dim)."""
        n_blocks = len(self.block_out_channels)
        # SD1.5 configs store head *count* in attention_head_dim (diffusers
        # historical naming); num_attention_heads overrides when set.
        heads_per_block = _per_block(
            self.num_attention_heads
            if self.num_attention_heads is not None
            else self.attention_head_dim,
            n_blocks,
        )
        tf_layers = _per_block(self.transformer_layers_per_block, n_blocks)
        only_cross = _per_block(self.only_cross_attention, n_blocks)

        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps[None], (sample.shape[0],))

        # --- time (+ SDXL micro-conditioning) embedding --------------------
        time_embed_dim = self.block_out_channels[0] * 4
        t_emb = get_sinusoidal_embeddings(
            timesteps,
            self.block_out_channels[0],
            flip_sin_to_cos=self.flip_sin_to_cos,
            freq_shift=self.freq_shift,
        ).astype(self.dtype)
        t_emb = TimestepEmbedding(
            time_embed_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="time_embedding",
        )(t_emb)

        if self.addition_embed_type == "text_time":
            assert added_cond_kwargs is not None, (
                "SDXL UNet requires added_cond_kwargs={'text_embeds', 'time_ids'}"
            )
            text_embeds = added_cond_kwargs["text_embeds"]
            time_ids = added_cond_kwargs["time_ids"]
            time_embeds = get_sinusoidal_embeddings(
                time_ids.reshape(-1),
                self.addition_time_embed_dim,
                flip_sin_to_cos=self.flip_sin_to_cos,
                freq_shift=self.freq_shift,
            )
            time_embeds = time_embeds.reshape(text_embeds.shape[0], -1)
            add_embeds = jnp.concatenate([text_embeds, time_embeds], axis=-1)
            t_emb = t_emb + TimestepEmbedding(
                time_embed_dim,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="add_embedding",
            )(add_embeds.astype(self.dtype))

        # --- conv in --------------------------------------------------------
        hidden_states = nn.Conv(
            self.block_out_channels[0],
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv_in",
        )(sample)

        maybe_remat = (
            (lambda cls: nn.remat(cls, static_argnums=(-1,)))
            if self.gradient_checkpointing
            else (lambda cls: cls)
        )

        # --- down -------------------------------------------------------------
        down_block_res: Tuple[jnp.ndarray, ...] = (hidden_states,)
        for i, block_type in enumerate(self.down_block_types):
            out_ch = self.block_out_channels[i]
            is_last = i == n_blocks - 1
            if block_type == "CrossAttnDownBlock2D":
                heads = heads_per_block[i]
                block = maybe_remat(CrossAttnDownBlock2D)(
                    out_channels=out_ch,
                    num_layers=self.layers_per_block,
                    transformer_layers_per_block=tf_layers[i],
                    heads=heads,
                    dim_head=out_ch // heads,
                    cross_attention_dim=self.cross_attention_dim,
                    dropout=self.dropout,
                    add_downsample=not is_last,
                    use_linear_projection=self.use_linear_projection,
                    only_cross_attention=only_cross[i],
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    attention_backend=self.attention_backend,
                    name=f"down_blocks_{i}",
                )
                hidden_states, res_states = block(
                    hidden_states, t_emb, encoder_hidden_states, deterministic
                )
            elif block_type == "DownBlock2D":
                block = maybe_remat(DownBlock2D)(
                    out_channels=out_ch,
                    num_layers=self.layers_per_block,
                    dropout=self.dropout,
                    add_downsample=not is_last,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"down_blocks_{i}",
                )
                hidden_states, res_states = block(hidden_states, t_emb, deterministic)
            else:
                raise ValueError(f"unknown down block type {block_type!r}")
            down_block_res += res_states

        # --- mid --------------------------------------------------------------
        mid_heads = heads_per_block[-1]
        hidden_states = maybe_remat(UNetMidBlock2DCrossAttn)(
            in_channels=self.block_out_channels[-1],
            transformer_layers_per_block=tf_layers[-1],
            heads=mid_heads,
            dim_head=self.block_out_channels[-1] // mid_heads,
            cross_attention_dim=self.cross_attention_dim,
            dropout=self.dropout,
            use_linear_projection=self.use_linear_projection,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            attention_backend=self.attention_backend,
            name="mid_block",
        )(hidden_states, t_emb, encoder_hidden_states, deterministic)

        # --- up ---------------------------------------------------------------
        reversed_channels = tuple(reversed(self.block_out_channels))
        reversed_heads = tuple(reversed(heads_per_block))
        reversed_tf_layers = tuple(reversed(tf_layers))
        reversed_only_cross = tuple(reversed(only_cross))
        for i, block_type in enumerate(self.up_block_types):
            out_ch = reversed_channels[i]
            is_last = i == n_blocks - 1
            res_states = down_block_res[-(self.layers_per_block + 1) :]
            down_block_res = down_block_res[: -(self.layers_per_block + 1)]
            if block_type == "CrossAttnUpBlock2D":
                heads = reversed_heads[i]
                block = maybe_remat(CrossAttnUpBlock2D)(
                    out_channels=out_ch,
                    num_layers=self.layers_per_block + 1,
                    transformer_layers_per_block=reversed_tf_layers[i],
                    heads=heads,
                    dim_head=out_ch // heads,
                    cross_attention_dim=self.cross_attention_dim,
                    dropout=self.dropout,
                    add_upsample=not is_last,
                    use_linear_projection=self.use_linear_projection,
                    only_cross_attention=reversed_only_cross[i],
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    attention_backend=self.attention_backend,
                    name=f"up_blocks_{i}",
                )
                hidden_states = block(
                    hidden_states,
                    res_states,
                    t_emb,
                    encoder_hidden_states,
                    deterministic,
                )
            elif block_type == "UpBlock2D":
                block = maybe_remat(UpBlock2D)(
                    out_channels=out_ch,
                    num_layers=self.layers_per_block + 1,
                    dropout=self.dropout,
                    add_upsample=not is_last,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"up_blocks_{i}",
                )
                hidden_states = block(hidden_states, res_states, t_emb, deterministic)
            else:
                raise ValueError(f"unknown up block type {block_type!r}")

        # --- out --------------------------------------------------------------
        hidden_states = nn.GroupNorm(
            num_groups=32,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv_norm_out",
        )(hidden_states)
        hidden_states = nn.silu(hidden_states)
        return nn.Conv(
            self.out_channels,
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv_out",
        )(hidden_states)


class UNet2DConditionModel(ConfigurableMixin):
    """Configured UNet with the reference's public surface.

    ``apply(params, sample, timesteps, encoder_hidden_states)`` accepts
    NCHW (``data_format="NCHW"``, reference-compatible default) or NHWC
    samples and returns the noise/velocity prediction in the same layout.
    """

    config_name = "config.json"

    def __init__(
        self,
        sample_size: int = 64,
        in_channels: int = 4,
        out_channels: int = 4,
        down_block_types=(
            "CrossAttnDownBlock2D",
            "CrossAttnDownBlock2D",
            "CrossAttnDownBlock2D",
            "DownBlock2D",
        ),
        up_block_types=(
            "UpBlock2D",
            "CrossAttnUpBlock2D",
            "CrossAttnUpBlock2D",
            "CrossAttnUpBlock2D",
        ),
        block_out_channels=(320, 640, 1280, 1280),
        layers_per_block: int = 2,
        transformer_layers_per_block=1,
        attention_head_dim=8,
        num_attention_heads=None,
        cross_attention_dim: int = 768,
        dropout: float = 0.0,
        use_linear_projection: bool = False,
        only_cross_attention=False,
        flip_sin_to_cos: bool = True,
        freq_shift: float = 0.0,
        addition_embed_type: Optional[str] = None,
        addition_time_embed_dim: Optional[int] = None,
        projection_class_embeddings_input_dim: Optional[int] = None,
        gradient_checkpointing: bool = False,
        dtype: jnp.dtype = jnp.float32,
        param_dtype: jnp.dtype = jnp.float32,
        attention_backend: str = "auto",
        data_format: str = "NCHW",
    ):
        self._register_config(dict(locals()))
        assert data_format in ("NCHW", "NHWC")
        self.data_format = data_format
        self.dtype = dtype
        self.module = UNetCore(
            sample_size=sample_size,
            in_channels=in_channels,
            out_channels=out_channels,
            down_block_types=tuple(down_block_types),
            up_block_types=tuple(up_block_types),
            block_out_channels=tuple(block_out_channels),
            layers_per_block=layers_per_block,
            transformer_layers_per_block=transformer_layers_per_block
            if isinstance(transformer_layers_per_block, int)
            else tuple(transformer_layers_per_block),
            attention_head_dim=attention_head_dim
            if isinstance(attention_head_dim, int)
            else tuple(attention_head_dim),
            num_attention_heads=num_attention_heads
            if num_attention_heads is None or isinstance(num_attention_heads, int)
            else tuple(num_attention_heads),
            cross_attention_dim=cross_attention_dim,
            dropout=dropout,
            use_linear_projection=use_linear_projection,
            only_cross_attention=only_cross_attention
            if isinstance(only_cross_attention, bool)
            else tuple(only_cross_attention),
            flip_sin_to_cos=flip_sin_to_cos,
            freq_shift=freq_shift,
            addition_embed_type=addition_embed_type,
            addition_time_embed_dim=addition_time_embed_dim,
            projection_class_embeddings_input_dim=projection_class_embeddings_input_dim,
            gradient_checkpointing=gradient_checkpointing,
            dtype=dtype,
            param_dtype=param_dtype,
            attention_backend=attention_backend,
        )

    ignore_for_config = (
        "dtype",
        "param_dtype",
        "attention_backend",
        "data_format",
        "gradient_checkpointing",
    )

    def init(self, rng, batch_size: int = 1, height: Optional[int] = None, width=None):
        h = height or self.config.sample_size
        w = width or self.config.sample_size
        sample = jnp.zeros((batch_size, h, w, self.config.in_channels), self.dtype)
        timesteps = jnp.zeros((batch_size,), jnp.int32)
        context = jnp.zeros(
            (batch_size, 77, self.config.cross_attention_dim), self.dtype
        )
        added = None
        if self.config.addition_embed_type == "text_time":
            added = {
                "text_embeds": jnp.zeros(
                    (
                        batch_size,
                        self.config.projection_class_embeddings_input_dim
                        - 6 * self.config.addition_time_embed_dim,
                    ),
                    self.dtype,
                ),
                "time_ids": jnp.zeros((batch_size, 6), self.dtype),
            }
        # jit the init: flax init otherwise dispatches each op eagerly, which
        # is ~2x slower than one compiled program (worst on 1-core CPU CI)
        return jax.jit(self.module.init)(rng, sample, timesteps, context, added)[
            "params"
        ]

    def apply(
        self,
        variables,
        sample,
        timesteps,
        encoder_hidden_states,
        added_cond_kwargs=None,
        train: bool = False,
        rngs=None,
    ):
        if not isinstance(variables, dict) or "params" not in variables:
            variables = {"params": variables}
        if self.data_format == "NCHW":
            sample = jnp.transpose(sample, (0, 2, 3, 1))
        out = self.module.apply(
            variables,
            sample,
            timesteps,
            encoder_hidden_states,
            added_cond_kwargs,
            deterministic=not train,
            rngs=rngs,
        )
        if self.data_format == "NCHW":
            out = jnp.transpose(out, (0, 3, 1, 2))
        return out

    # reference compat: unet(...) mirrors FlaxUNet2DConditionModel.apply
    def __call__(self, *args, **kwargs):
        return self.apply(*args, **kwargs)

    def _diffusers_class_name(self) -> str:
        return "UNet2DConditionModel"
