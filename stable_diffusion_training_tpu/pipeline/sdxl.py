"""SDXL text-to-image pipeline: dual text encoders + micro-conditioning.

Beyond the reference's SD1.x pipeline (SURVEY.md §2.11): SDXL conditions the
UNet on (a) the concatenated penultimate hidden states of both text towers
(768 + 1280 = 2048 channels), (b) the pooled/projected embedding of the
second tower, and (c) size/crop ``time_ids`` — assembled here exactly as the
SDXL reference implementation does, with the same CFG/fori_loop/jit
structure as ``pipeline.stable_diffusion``.
"""

from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from .stable_diffusion import DEBUG, StableDiffusionPipeline


def export_text_encoder_2(text_encoder_2, te2_params, save_directory) -> None:
    """Write ``text_encoder_2/`` in diffusers layout (HF config.json +
    torch-keyed safetensors). Shared by the SDXL and refiner pipelines so
    the key mapping lives in exactly one place."""
    import json
    import os

    from ..models import hf_io
    from ..train.checkpoint import _to_numpy_f32

    te2_dir = os.path.join(save_directory, "text_encoder_2")
    os.makedirs(te2_dir, exist_ok=True)
    cfg = dict(text_encoder_2.config.to_dict())
    cfg.update(
        {
            "architectures": ["CLIPTextModelWithProjection"],
            "model_type": "clip_text_model",
            "torch_dtype": "float32",
        }
    )
    with open(os.path.join(te2_dir, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2, sort_keys=True)

    sd = hf_io.flax_params_to_torch_state_dict(_to_numpy_f32(te2_params))

    # invert the load-side folding: text_model.{token,position}_embedding
    # -> text_model.embeddings.*, text_model.layers -> encoder.layers
    def _rekey(k: str) -> str:
        k = k.replace("text_model.token_embedding",
                      "text_model.embeddings.token_embedding")
        k = k.replace("text_model.position_embedding",
                      "text_model.embeddings.position_embedding")
        return k.replace("text_model.layers.", "text_model.encoder.layers.")

    hf_io.save_safetensors(
        {_rekey(k): v for k, v in sd.items()},
        os.path.join(te2_dir, "model.safetensors"),
        metadata={"format": "pt"},
    )


class StableDiffusionXLPipeline(StableDiffusionPipeline):
    """Adds tokenizer_2/text_encoder_2 and text_time conditioning."""

    def __init__(
        self,
        tokenizer,
        tokenizer_2,
        text_encoder,
        text_encoder_2,
        vae,
        unet,
        scheduler,
        dtype=None,
    ):
        super().__init__(tokenizer, text_encoder, vae, unet, scheduler, dtype)
        self.tokenizer_2 = tokenizer_2
        self.text_encoder_2 = text_encoder_2

    # --- IO -------------------------------------------------------------------
    @classmethod
    def from_pretrained(cls, directory: str, dtype=jnp.float32):
        """Load an SDXL diffusers-format checkpoint (adds
        tokenizer_2/text_encoder_2 over the SD layout)."""
        import os

        from ..diffusion import DDIMScheduler
        from ..models import (
            AutoencoderKL,
            CLIPTextModel,
            CLIPTextModelWithProjection,
            UNet2DConditionModel,
            hf_io,
        )

        common = dict(dtype=dtype, param_dtype=dtype, data_format="NHWC")
        unet = UNet2DConditionModel.from_config(
            hf_io.load_config_json(os.path.join(directory, "unet")), **common
        )
        vae = AutoencoderKL.from_config(
            hf_io.load_config_json(os.path.join(directory, "vae")), **common
        )
        te1 = CLIPTextModel.from_config(
            hf_io.load_config_json(os.path.join(directory, "text_encoder")),
            dtype=dtype,
            param_dtype=dtype,
        )
        te2 = CLIPTextModelWithProjection.from_config(
            hf_io.load_config_json(os.path.join(directory, "text_encoder_2")),
            dtype=dtype,
            param_dtype=dtype,
        )
        scheduler, scheduler_state = DDIMScheduler.from_pretrained(
            directory, subfolder="scheduler"
        )

        def _tok(sub):
            tok_dir = os.path.join(directory, sub)
            if not os.path.isdir(tok_dir):
                return None
            from transformers import CLIPTokenizer

            return CLIPTokenizer.from_pretrained(tok_dir)

        params = {
            "unet": hf_io.load_unet_params(os.path.join(directory, "unet"), dtype),
            "vae": hf_io.load_vae_params(os.path.join(directory, "vae"), dtype),
            "text_encoder": hf_io.load_text_encoder_params(
                os.path.join(directory, "text_encoder"), dtype
            ),
            "text_encoder_2": hf_io.load_text_encoder_2_params(
                os.path.join(directory, "text_encoder_2"), dtype
            ),
            "scheduler": scheduler_state,
        }
        pipe = cls(
            _tok("tokenizer"), _tok("tokenizer_2"), te1, te2, vae, unet, scheduler
        )
        return pipe, params

    def save_pretrained(self, save_directory: str, params) -> None:
        import os

        super().save_pretrained(save_directory, params)
        export_text_encoder_2(
            self.text_encoder_2, params["text_encoder_2"], save_directory
        )
        if self.tokenizer_2 is not None:
            self.tokenizer_2.save_pretrained(
                os.path.join(save_directory, "tokenizer_2")
            )

    def _encode_prompt_pair(self, prompt_ids, prompt_2_ids, params):
        """Concat penultimate hidden states of both towers; pooled from TE2."""
        out1 = self.text_encoder(
            prompt_ids, params=params["text_encoder"], output_hidden_states=True
        )
        hidden1 = out1.hidden_states[-2]
        out2 = self.text_encoder_2(
            prompt_2_ids,
            params=params["text_encoder_2"],
            output_hidden_states=True,
        )
        hidden2 = out2.hidden_states[-2]
        pooled = out2.text_embeds
        context = jnp.concatenate([hidden1, hidden2], axis=-1)
        return context, pooled

    def _generate(
        self,
        prompt_ids: jnp.ndarray,
        params: Dict[str, Any],
        prng_seed: jax.Array,
        num_inference_steps: int,
        height: int,
        width: int,
        guidance_scale: float,
        latents: Optional[jnp.ndarray] = None,
        neg_prompt_ids: Optional[jnp.ndarray] = None,
        prompt_2_ids: Optional[jnp.ndarray] = None,
        neg_prompt_2_ids: Optional[jnp.ndarray] = None,
        crops_coords_top_left: Tuple[int, int] = (0, 0),
    ) -> jnp.ndarray:
        if prompt_2_ids is None:
            prompt_2_ids = prompt_ids
        batch_size = prompt_ids.shape[0]

        if neg_prompt_ids is None:
            uncond = self.tokenizer(
                [""] * batch_size,
                padding="max_length",
                max_length=prompt_ids.shape[-1],
                return_tensors="np",
            ).input_ids
            neg_prompt_ids = jnp.asarray(uncond)
        if neg_prompt_2_ids is None:
            neg_prompt_2_ids = neg_prompt_ids

        context_text, pooled_text = self._encode_prompt_pair(
            prompt_ids, prompt_2_ids, params
        )
        context_neg, pooled_neg = self._encode_prompt_pair(
            neg_prompt_ids, neg_prompt_2_ids, params
        )
        context = jnp.concatenate([context_neg, context_text])
        pooled = jnp.concatenate([pooled_neg, pooled_text])

        # micro-conditioning: original size, crop, target size
        add_time_ids = jnp.array(
            [[height, width, *crops_coords_top_left, height, width]],
            dtype=jnp.float32,
        )
        add_time_ids = jnp.broadcast_to(add_time_ids, (2 * batch_size, 6))
        added_cond = {"text_embeds": pooled, "time_ids": add_time_ids}

        latents_shape = (
            batch_size,
            self.unet.config.in_channels,
            height // self.vae_scale_factor,
            width // self.vae_scale_factor,
        )
        if latents is None:
            latents = jax.random.normal(
                prng_seed, shape=latents_shape, dtype=jnp.float32
            )
        elif latents.shape != latents_shape:
            raise ValueError(
                f"Unexpected latents shape {latents.shape}, want {latents_shape}"
            )

        scheduler_state = self.scheduler.set_timesteps(
            params["scheduler"],
            num_inference_steps=num_inference_steps,
            shape=latents.shape,
        )
        latents = latents * scheduler_state.init_noise_sigma

        def loop_body(step, args):
            latents, scheduler_state = args
            latents_input = jnp.concatenate([latents] * 2)
            t = jnp.array(scheduler_state.timesteps, dtype=jnp.int32)[step]
            latents_input = self.scheduler.scale_model_input(
                scheduler_state, latents_input, t
            )
            noise_pred = self._unet_call_sdxl(
                params, latents_input.astype(self.dtype), t, context, added_cond
            ).astype(jnp.float32)
            uncond, text = jnp.split(noise_pred, 2, axis=0)
            noise_pred = uncond + guidance_scale * (text - uncond)
            out = self.scheduler.step(scheduler_state, noise_pred, t, latents)
            return out.prev_sample, out.state

        if DEBUG:
            for i in range(num_inference_steps):
                latents, scheduler_state = loop_body(i, (latents, scheduler_state))
        else:
            latents, scheduler_state = jax.lax.fori_loop(
                0, num_inference_steps, loop_body, (latents, scheduler_state)
            )

        latents = latents / self.vae.config.scaling_factor
        decode_in = latents
        if self._model_nhwc():
            decode_in = jnp.transpose(decode_in, (0, 2, 3, 1))

        def _decode(z):
            return self.vae.decode(
                z.astype(self.dtype), {"params": params["vae"]}
            ).sample

        # At >=768² output, whole-batch decode triggers XLA's f32
        # spatially-partitioned convolutions (see stable_diffusion.py /
        # PERF_NOTES round 3), so decode per-sample — but gate on the
        # ACTUAL output size (latents are NCHW here): small user-passed
        # sizes and tiny test families decode faster whole-batch
        out_size = max(latents.shape[2], latents.shape[3]) * self.vae_scale_factor
        if out_size >= 768 and decode_in.shape[0] > 1:
            image = jax.lax.map(lambda z: _decode(z[None])[0], decode_in)
        else:
            image = _decode(decode_in)
        image = image.astype(jnp.float32)
        if not self._model_nhwc():
            image = jnp.transpose(image, (0, 2, 3, 1))
        return (image / 2 + 0.5).clip(0, 1)

    def _unet_call_sdxl(self, params, latents_nchw, t, context, added_cond):
        x = latents_nchw
        if self._model_nhwc():
            x = jnp.transpose(x, (0, 2, 3, 1))
        t_vec = jnp.broadcast_to(jnp.asarray(t), (x.shape[0],))
        out = self.unet.apply(
            {"params": params["unet"]}, x, t_vec, context,
            added_cond_kwargs=added_cond,
        )
        if self._model_nhwc():
            out = jnp.transpose(out, (0, 3, 1, 2))
        return out

    def __call__(
        self,
        prompt_ids: jnp.ndarray,
        params: Dict[str, Any],
        prng_seed: jax.Array,
        num_inference_steps: int = 50,
        height: Optional[int] = None,
        width: Optional[int] = None,
        guidance_scale: float = 5.0,
        latents: Optional[jnp.ndarray] = None,
        neg_prompt_ids: Optional[jnp.ndarray] = None,
        prompt_2_ids: Optional[jnp.ndarray] = None,
        neg_prompt_2_ids: Optional[jnp.ndarray] = None,
        jit: bool = False,
        return_dict: bool = True,
    ):
        height = height or self.unet.config.sample_size * self.vae_scale_factor
        width = width or self.unet.config.sample_size * self.vae_scale_factor

        if jit:
            if self._jitted_generate is None:
                self._jitted_generate = jax.jit(
                    self._generate,
                    static_argnames=("num_inference_steps", "height", "width"),
                )
            images = self._jitted_generate(
                prompt_ids, params, prng_seed, num_inference_steps, height,
                width, guidance_scale, latents, neg_prompt_ids, prompt_2_ids,
                neg_prompt_2_ids,
            )
        else:
            images = self._generate(
                prompt_ids, params, prng_seed, num_inference_steps, height,
                width, guidance_scale, latents, neg_prompt_ids, prompt_2_ids,
                neg_prompt_2_ids,
            )
        if not return_dict:
            return (images, False)
        return {"images": images, "nsfw_content_detected": False}


FlaxStableDiffusionXLPipeline = StableDiffusionXLPipeline
