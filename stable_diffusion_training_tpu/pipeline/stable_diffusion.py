"""Text-to-image pipeline: CFG + on-device fori_loop denoise + VAE decode.

Behavior parity with the reference's vendored
``models/pipeline_flax_stable_diffusion.py`` (SURVEY.md §2.11): same prompt
encoding (empty-string negative default), CFG combine
``uncond + g*(text - uncond)``, ``init_noise_sigma`` scaling,
``lax.fori_loop`` denoise (Python loop under DEBUG), VAE decode to [0,1]
NHWC images, and the stubbed-out NSFW field. The safety checker the upstream
diffusers pipeline had is removed in the reference and stays removed.

TPU-native differences: multi-device execution is jit/GSPMD over the named
mesh — no ``pmap`` (the reference's ``_p_generate``/``unshard`` per-device
reshape dance disappears; shard the prompt batch with a data PartitionSpec
instead). Latent rng shapes follow the reference's NCHW convention so
same-seed outputs are comparable.
"""

from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

# reference keeps a module-level DEBUG that swaps fori_loop for a Python loop
# so the denoise loop is steppable (pipeline_flax_stable_diffusion.py:42-44)
DEBUG = False


class StableDiffusionPipeline:
    """tokenizer + text_encoder + vae + unet + scheduler bundle."""

    def __init__(self, tokenizer, text_encoder, vae, unet, scheduler, dtype=None):
        self.tokenizer = tokenizer
        self.text_encoder = text_encoder
        self.vae = vae
        self.unet = unet
        self.scheduler = scheduler
        self.dtype = dtype or getattr(unet, "dtype", jnp.float32)
        block_out_channels = list(vae.config.block_out_channels)
        self.vae_scale_factor = 2 ** (len(block_out_channels) - 1)
        self._jitted_generate = None

    # --- IO -------------------------------------------------------------------
    @classmethod
    def from_pretrained(cls, directory: str, dtype=jnp.float32):
        """Load a diffusers-format checkpoint directory. Returns
        (pipeline, params dict)."""
        import os

        from ..diffusion import DDIMScheduler
        from ..models import AutoencoderKL, CLIPTextModel, UNet2DConditionModel
        from ..models import hf_io

        common = dict(dtype=dtype, param_dtype=dtype, data_format="NHWC")
        unet = UNet2DConditionModel.from_config(
            hf_io.load_config_json(os.path.join(directory, "unet")), **common
        )
        vae = AutoencoderKL.from_config(
            hf_io.load_config_json(os.path.join(directory, "vae")), **common
        )
        te_cfg = hf_io.load_config_json(os.path.join(directory, "text_encoder"))
        text_encoder = CLIPTextModel.from_config(
            te_cfg, dtype=dtype, param_dtype=dtype
        )
        scheduler, scheduler_state = DDIMScheduler.from_pretrained(
            directory, subfolder="scheduler"
        )
        tokenizer = None
        tok_dir = os.path.join(directory, "tokenizer")
        if os.path.isdir(tok_dir):
            from transformers import CLIPTokenizer

            tokenizer = CLIPTokenizer.from_pretrained(tok_dir)

        params = {
            "unet": hf_io.load_unet_params(os.path.join(directory, "unet"), dtype),
            "vae": hf_io.load_vae_params(os.path.join(directory, "vae"), dtype),
            "text_encoder": hf_io.load_text_encoder_params(
                os.path.join(directory, "text_encoder"), dtype
            ),
            "scheduler": scheduler_state,
        }
        return cls(tokenizer, text_encoder, vae, unet, scheduler), params

    def save_pretrained(self, save_directory: str, params: Dict[str, Any]) -> None:
        import os

        from ..train.checkpoint import save_model

        save_model(
            model_object_dict={
                "unet": self.unet,
                "vae": self.vae,
                "text_encoder": self.text_encoder,
                "schedulers": self.scheduler,
            },
            tokenizer_object=self.tokenizer,
            unet_params=params["unet"],
            text_encoder_params=params["text_encoder"],
            vae_params=params["vae"],
            output_dir=save_directory,
        )
        # save_model keeps the reference's checkpoint quirk (always DDIM
        # scaled_linear/v_prediction, training_utils.py:997-1004); the
        # pipeline's OWN save_pretrained matches diffusers semantics instead
        # — the registered scheduler round-trips as configured
        self.scheduler.save_config(os.path.join(save_directory, "scheduler"))

    # --- inference --------------------------------------------------------------
    def prepare_inputs(self, prompt: Union[str, List[str]]) -> jnp.ndarray:
        """Tokenize to fixed-length numpy ids
        (reference pipeline L146-157)."""
        if not isinstance(prompt, (str, list)):
            raise ValueError(f"`prompt` has to be str or list but is {type(prompt)}")
        text_input = self.tokenizer(
            prompt,
            padding="max_length",
            max_length=self.tokenizer.model_max_length,
            truncation=True,
            return_tensors="np",
        )
        return jnp.asarray(text_input.input_ids)

    def _model_nhwc(self) -> bool:
        return getattr(self.unet, "data_format", "NCHW") == "NHWC"

    def _unet_call(self, params, latents_nchw, t, context):
        x = latents_nchw
        if self._model_nhwc():
            x = jnp.transpose(x, (0, 2, 3, 1))
        t_vec = jnp.broadcast_to(jnp.asarray(t), (x.shape[0],))
        out = self.unet.apply({"params": params["unet"]}, x, t_vec, context)
        if self._model_nhwc():
            out = jnp.transpose(out, (0, 3, 1, 2))
        return out

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
    ) -> jnp.ndarray:
        if height % 8 != 0 or width % 8 != 0:
            raise ValueError(f"`height`/`width` must be multiples of 8: {height}, {width}")

        # prompt + negative-prompt encoding, concatenated for one CFG batch
        prompt_embeds = self.text_encoder(
            prompt_ids, params=params["text_encoder"]
        )[0]
        batch_size = prompt_ids.shape[0]
        max_length = prompt_ids.shape[-1]

        if neg_prompt_ids is None:
            uncond_input = self.tokenizer(
                [""] * batch_size,
                padding="max_length",
                max_length=max_length,
                return_tensors="np",
            ).input_ids
            neg_prompt_ids = jnp.asarray(uncond_input)
        negative_prompt_embeds = self.text_encoder(
            neg_prompt_ids, params=params["text_encoder"]
        )[0]
        context = jnp.concatenate([negative_prompt_embeds, prompt_embeds])

        # gaussian init latents in the reference's NCHW shape for seed parity
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
                f"Unexpected latents shape, got {latents.shape}, "
                f"expected {latents_shape}"
            )

        scheduler_state = self.scheduler.set_timesteps(
            params["scheduler"], num_inference_steps=num_inference_steps,
            shape=latents.shape,
        )
        latents = latents * scheduler_state.init_noise_sigma

        def loop_body(step, args):
            latents, scheduler_state = args
            # duplicate latents for the CFG pass: (uncond, text) in one batch
            latents_input = jnp.concatenate([latents] * 2)
            t = jnp.array(scheduler_state.timesteps, dtype=jnp.int32)[step]
            latents_input = self.scheduler.scale_model_input(
                scheduler_state, latents_input, t
            )
            noise_pred = self._unet_call(
                params, latents_input.astype(self.dtype), t, context
            ).astype(jnp.float32)
            noise_pred_uncond, noise_prediction_text = jnp.split(
                noise_pred, 2, axis=0
            )
            noise_pred = noise_pred_uncond + guidance_scale * (
                noise_prediction_text - noise_pred_uncond
            )
            out = self.scheduler.step(
                scheduler_state, noise_pred, t, latents
            )
            return out.prev_sample, out.state

        if DEBUG:
            for i in range(num_inference_steps):
                latents, scheduler_state = loop_body(i, (latents, scheduler_state))
        else:
            latents, scheduler_state = jax.lax.fori_loop(
                0, num_inference_steps, loop_body, (latents, scheduler_state)
            )

        # decode: 1/scaling_factor, VAE, [0,1] NHWC. At >=768² output the
        # decode runs per-sample via lax.map — the same XLA-strategy lever
        # as training's vae_encode_chunk (whole-batch at that size triggers
        # f32 spatially-partitioned convolutions; PERF_NOTES round 3).
        latents = latents / self.vae.config.scaling_factor
        decode_in = latents

        def _decode(z):
            return self.vae.decode(
                z.astype(self.dtype), {"params": params["vae"]}
            ).sample

        per_sample = max(height, width) >= 768 and decode_in.shape[0] > 1
        if self._model_nhwc():
            decode_in = jnp.transpose(decode_in, (0, 2, 3, 1))
        if per_sample:
            image = jax.lax.map(lambda z: _decode(z[None])[0], decode_in)
        else:
            image = _decode(decode_in)
        if self._model_nhwc():
            image = image.astype(jnp.float32)
        else:
            image = jnp.transpose(image.astype(jnp.float32), (0, 2, 3, 1))
        image = (image / 2 + 0.5).clip(0, 1)
        return image

    def __call__(
        self,
        prompt_ids: jnp.ndarray,
        params: Dict[str, Any],
        prng_seed: jax.Array,
        num_inference_steps: int = 50,
        height: Optional[int] = None,
        width: Optional[int] = None,
        guidance_scale: float = 7.5,
        latents: Optional[jnp.ndarray] = None,
        neg_prompt_ids: Optional[jnp.ndarray] = None,
        jit: bool = False,
        return_dict: bool = True,
    ):
        """Generate images. ``jit=True`` uses a cached GSPMD-jitted program —
        shard ``prompt_ids`` over the mesh's data axis for multi-device
        batching (replaces the reference's pmap path)."""
        height = height or self.unet.config.sample_size * self.vae_scale_factor
        width = width or self.unet.config.sample_size * self.vae_scale_factor

        if jit:
            if self._jitted_generate is None:
                self._jitted_generate = jax.jit(
                    self._generate,
                    static_argnames=("num_inference_steps", "height", "width"),
                )
            images = self._jitted_generate(
                prompt_ids,
                params,
                prng_seed,
                num_inference_steps,
                height,
                width,
                guidance_scale,
                latents,
                neg_prompt_ids,
            )
        else:
            images = self._generate(
                prompt_ids,
                params,
                prng_seed,
                num_inference_steps,
                height,
                width,
                guidance_scale,
                latents,
                neg_prompt_ids,
            )

        if not return_dict:
            return (images, False)
        # reference stubs the NSFW checker out (pipeline L353-359)
        return {"images": images, "nsfw_content_detected": False}

    def numpy_to_pil(self, images: np.ndarray):
        from PIL import Image

        images = (np.asarray(images) * 255).round().astype("uint8")
        return [Image.fromarray(im) for im in images]


def unshard(x: jnp.ndarray) -> jnp.ndarray:
    """Merge a per-device leading axis: (d, b, ...) -> (d*b, ...)
    (reference pipeline helper, ``pipeline_flax_stable_diffusion.py:395-399``;
    kept for API parity even though the jit path never shards outputs this
    way)."""
    num_devices, batch_size = x.shape[:2]
    return x.reshape(num_devices * batch_size, *x.shape[2:])


# reference-compatible alias
FlaxStableDiffusionPipeline = StableDiffusionPipeline
