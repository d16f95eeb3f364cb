"""CLIP text encoder — the conditioning model.

Replaces the reference's HF ``FlaxCLIPTextModel`` import
(``/root/reference/training_utils.py:215-217``). Numerics target the
transformers CLIP text tower exactly (pre-LN transformer, causal mask,
quick_gelu for SD1.5 / gelu for SD2.x-OpenCLIP) so converted checkpoints
reproduce reference hidden states; verified against the PyTorch
``transformers.CLIPTextModel`` in tests.

The reference calls it with ``train=True`` and a ``dropout_rng``
(``/root/reference/training_utils.py:635-640``); CLIP configs set dropout to
0.0, so the API accepts both and they are no-ops — kept for parity.
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.configuration import ConfigurableMixin


class CLIPTextConfig:
    """The subset of transformers' CLIPTextConfig the tower needs."""

    def __init__(
        self,
        vocab_size: int = 49408,
        hidden_size: int = 768,
        intermediate_size: int = 3072,
        num_hidden_layers: int = 12,
        num_attention_heads: int = 12,
        max_position_embeddings: int = 77,
        hidden_act: str = "quick_gelu",
        layer_norm_eps: float = 1e-5,
        projection_dim: int = 512,
        eos_token_id: int = 49407,
    ):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.max_position_embeddings = max_position_embeddings
        self.hidden_act = hidden_act
        self.layer_norm_eps = layer_norm_eps
        self.projection_dim = projection_dim
        self.eos_token_id = eos_token_id

    def to_dict(self):
        return dict(self.__dict__)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":  # transformers "gelu" is the exact erf form
        return lambda x: nn.gelu(x, approximate=False)
    if name in ("gelu_new", "gelu_pytorch_tanh"):
        return lambda x: nn.gelu(x, approximate=True)
    raise ValueError(f"unknown activation {name!r}")


class CLIPAttention(nn.Module):
    hidden_size: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, causal_mask):
        head_dim = self.hidden_size // self.num_heads
        scale = head_dim**-0.5
        b, s, _ = hidden_states.shape

        dense = lambda name: nn.Dense(  # noqa: E731
            self.hidden_size, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        # transformers pre-scales q before the matmul; fp32 softmax
        q = dense("q_proj")(hidden_states) * scale
        k = dense("k_proj")(hidden_states)
        v = dense("v_proj")(hidden_states)

        q = q.reshape(b, s, self.num_heads, head_dim)
        k = k.reshape(b, s, self.num_heads, head_dim)
        v = v.reshape(b, s, self.num_heads, head_dim)

        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        logits = logits + causal_mask.astype(logits.dtype)
        weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        out = out.reshape(b, s, self.hidden_size)
        return dense("out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    hidden_act: str
    layer_norm_eps: float
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, causal_mask):
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=self.layer_norm_eps,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )
        residual = hidden_states
        hidden_states = ln("layer_norm1")(hidden_states)
        hidden_states = CLIPAttention(
            self.hidden_size,
            self.num_heads,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="self_attn",
        )(hidden_states, causal_mask)
        hidden_states = residual + hidden_states

        residual = hidden_states
        hidden_states = ln("layer_norm2")(hidden_states)
        hidden_states = nn.Dense(
            self.intermediate_size,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="mlp_fc1",
        )(hidden_states)
        hidden_states = _act(self.hidden_act)(hidden_states)
        hidden_states = nn.Dense(
            self.hidden_size,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="mlp_fc2",
        )(hidden_states)
        return residual + hidden_states


class CLIPTextCore(nn.Module):
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_hidden_layers: int
    num_heads: int
    max_position_embeddings: int
    hidden_act: str
    layer_norm_eps: float
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, output_hidden_states: bool = False):
        b, s = input_ids.shape
        token_embeds = nn.Embed(
            self.vocab_size,
            self.hidden_size,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="token_embedding",
        )(input_ids)
        positions = jnp.arange(s)[None, :]
        pos_embeds = nn.Embed(
            self.max_position_embeddings,
            self.hidden_size,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="position_embedding",
        )(positions)
        hidden_states = token_embeds + pos_embeds

        causal_mask = jnp.triu(
            jnp.full((1, 1, s, s), jnp.finfo(jnp.float32).min, dtype=jnp.float32), k=1
        )

        all_hidden = [hidden_states] if output_hidden_states else None
        for i in range(self.num_hidden_layers):
            hidden_states = CLIPEncoderLayer(
                self.hidden_size,
                self.num_heads,
                self.intermediate_size,
                self.hidden_act,
                self.layer_norm_eps,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"layers_{i}",
            )(hidden_states, causal_mask)
            if output_hidden_states:
                all_hidden.append(hidden_states)

        last_hidden_state = nn.LayerNorm(
            epsilon=self.layer_norm_eps,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="final_layer_norm",
        )(hidden_states)

        if output_hidden_states:
            return last_hidden_state, tuple(all_hidden)
        return last_hidden_state


class _TextOutput:
    """Tuple-and-attribute output mirroring transformers' Flax model output
    (the reference indexes ``[0]``, ``training_utils.py:640``)."""

    def __init__(self, last_hidden_state, pooler_output=None, hidden_states=None):
        self.last_hidden_state = last_hidden_state
        self.pooler_output = pooler_output
        self.hidden_states = hidden_states

    def __getitem__(self, idx):
        return (self.last_hidden_state, self.pooler_output, self.hidden_states)[idx]


class _ProjectedTextOutput:
    """Output of the projection variant: ``[0]`` is ``text_embeds`` (the
    pooled-and-projected vector SDXL consumes as micro-conditioning)."""

    def __init__(self, text_embeds, last_hidden_state, hidden_states=None):
        self.text_embeds = text_embeds
        self.last_hidden_state = last_hidden_state
        self.hidden_states = hidden_states

    def __getitem__(self, idx):
        return (self.text_embeds, self.last_hidden_state, self.hidden_states)[idx]


def _pool_eos(last_hidden_state, input_ids, eos_token_id):
    """CLIP pooling: hidden state at the EOS token.

    transformers keeps a legacy path for ``eos_token_id == 2`` (the value in
    SDXL's text_encoder_2 config): pool at ``input_ids.argmax(-1)`` — the
    highest token id, which is the EOT token for CLIP vocabularies — instead
    of the first literal EOS match. Reproduced exactly for checkpoint parity.
    """
    if eos_token_id == 2:
        eos_pos = jnp.argmax(input_ids, axis=-1)
    else:
        eos_pos = jnp.argmax((input_ids == eos_token_id).astype(jnp.int32), axis=-1)
    return last_hidden_state[jnp.arange(last_hidden_state.shape[0]), eos_pos]


class CLIPTextModel(ConfigurableMixin):
    """Configured CLIP text tower with the transformers-compatible surface:
    ``model(input_ids, params=..., train=..., dropout_rng=...)[0]``."""

    config_name = "config.json"

    def __init__(
        self,
        config: Optional[CLIPTextConfig] = None,
        dtype: jnp.dtype = jnp.float32,
        param_dtype: jnp.dtype = jnp.float32,
        **config_kwargs,
    ):
        config = config or CLIPTextConfig(**config_kwargs)
        self.text_config = config
        self.dtype = dtype
        self._register_config(config.to_dict())
        self.module = CLIPTextCore(
            vocab_size=config.vocab_size,
            hidden_size=config.hidden_size,
            intermediate_size=config.intermediate_size,
            num_hidden_layers=config.num_hidden_layers,
            num_heads=config.num_attention_heads,
            max_position_embeddings=config.max_position_embeddings,
            hidden_act=config.hidden_act,
            layer_norm_eps=config.layer_norm_eps,
            dtype=dtype,
            param_dtype=param_dtype,
        )

    @classmethod
    def from_config(cls, config, **overrides):
        """Filter against CLIPTextConfig fields (transformers config jsons
        carry extra keys like ``architectures``/``model_type``)."""
        import inspect

        accepted = set(inspect.signature(CLIPTextConfig.__init__).parameters) - {
            "self"
        }
        config = {k: v for k, v in dict(config).items() if k in accepted}
        config.update(overrides)
        return cls(**config)

    def init(self, rng, batch_size: int = 1):
        ids = jnp.zeros(
            (batch_size, self.text_config.max_position_embeddings), jnp.int32
        )
        return jax.jit(self.module.init)(rng, ids)["params"]

    def __call__(
        self,
        input_ids,
        attention_mask=None,
        params=None,
        dropout_rng=None,
        train: bool = False,
        output_hidden_states: bool = False,
    ):
        """``attention_mask``/``dropout_rng``/``train`` accepted for reference
        API parity; CLIP text dropout is 0.0 and the reference never consumes
        the attention mask (SURVEY.md §2.7 step 2)."""
        del attention_mask, dropout_rng, train
        variables = params if isinstance(params, dict) and "params" in params else {
            "params": params
        }
        out = self.module.apply(
            variables, input_ids, output_hidden_states=output_hidden_states
        )
        if output_hidden_states:
            last_hidden, all_hidden = out
            return _TextOutput(last_hidden, hidden_states=all_hidden)
        return _TextOutput(out)

    def apply(self, variables, input_ids, **kwargs):
        if isinstance(variables, dict) and "params" in variables:
            variables = variables["params"]
        return self(input_ids, params=variables, **kwargs)

    def _diffusers_class_name(self) -> str:
        return "CLIPTextModel"


class CLIPTextProjectionCore(nn.Module):
    """Text tower + linear projection on the EOS-pooled hidden state.
    The submodule attribute name ``text_model`` sets the param scope to
    match the transformers checkpoint nesting."""

    text_model: CLIPTextCore
    projection_dim: int
    eos_token_id: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, output_hidden_states: bool = False):
        out = self.text_model(input_ids, output_hidden_states=output_hidden_states)
        last_hidden = out[0] if output_hidden_states else out
        pooled = _pool_eos(last_hidden, input_ids, self.eos_token_id)
        text_embeds = nn.Dense(
            self.projection_dim,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="text_projection",
        )(pooled)
        if output_hidden_states:
            return text_embeds, last_hidden, out[1]
        return text_embeds, last_hidden


class CLIPTextModelWithProjection(ConfigurableMixin):
    """SDXL's second text encoder: the tower plus ``text_projection``
    producing the pooled ``text_embeds`` micro-conditioning vector.
    Surface mirrors transformers' ``FlaxCLIPTextModelWithProjection``."""

    config_name = "config.json"

    def __init__(
        self,
        config: Optional[CLIPTextConfig] = None,
        dtype: jnp.dtype = jnp.float32,
        param_dtype: jnp.dtype = jnp.float32,
        **config_kwargs,
    ):
        config = config or CLIPTextConfig(**config_kwargs)
        self.text_config = config
        self.dtype = dtype
        self._register_config(config.to_dict())
        tower = CLIPTextCore(
            vocab_size=config.vocab_size,
            hidden_size=config.hidden_size,
            intermediate_size=config.intermediate_size,
            num_hidden_layers=config.num_hidden_layers,
            num_heads=config.num_attention_heads,
            max_position_embeddings=config.max_position_embeddings,
            hidden_act=config.hidden_act,
            layer_norm_eps=config.layer_norm_eps,
            dtype=dtype,
            param_dtype=param_dtype,
        )
        self.module = CLIPTextProjectionCore(
            text_model=tower,
            projection_dim=config.projection_dim,
            eos_token_id=config.eos_token_id,
            dtype=dtype,
            param_dtype=param_dtype,
        )

    @classmethod
    def from_config(cls, config, **overrides):
        import inspect

        accepted = set(inspect.signature(CLIPTextConfig.__init__).parameters) - {
            "self"
        }
        config = {k: v for k, v in dict(config).items() if k in accepted}
        config.update(overrides)
        return cls(**config)

    def init(self, rng, batch_size: int = 1):
        ids = jnp.zeros(
            (batch_size, self.text_config.max_position_embeddings), jnp.int32
        )
        return jax.jit(self.module.init)(rng, ids)["params"]

    def __call__(
        self,
        input_ids,
        attention_mask=None,
        params=None,
        dropout_rng=None,
        train: bool = False,
        output_hidden_states: bool = False,
    ):
        del attention_mask, dropout_rng, train
        variables = params if isinstance(params, dict) and "params" in params else {
            "params": params
        }
        out = self.module.apply(
            variables, input_ids, output_hidden_states=output_hidden_states
        )
        if output_hidden_states:
            return _ProjectedTextOutput(out[0], out[1], hidden_states=out[2])
        return _ProjectedTextOutput(out[0], out[1])

    def _diffusers_class_name(self) -> str:
        return "CLIPTextModelWithProjection"
