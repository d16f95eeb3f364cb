"""SDXL refiner / img2img pipeline.

Completes the SDXL family beyond the reference's SD1.x text-to-image pipeline
(SURVEY.md §2.11 covers only ``pipeline_flax_stable_diffusion.py``): the
refiner checkpoint conditions on the SECOND text tower only (1280-channel
context, no ``text_encoder``/``tokenizer`` subfolders in the checkpoint),
replaces the target-size micro-conditioning entry with an aesthetic score
(5 time ids instead of 6), and denoises from a noised version of an input
image (img2img) instead of pure gaussian latents.

TPU-native structure matches the other pipelines: one ``lax.fori_loop``
denoise jitted over the GSPMD mesh, NHWC models, NCHW seed-parity rng shapes.
The loop always runs ``num_inference_steps`` iterations from a static lower
bound derived from ``strength`` so the program shape is independent of any
traced value.
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sdxl import DEBUG, StableDiffusionXLPipeline


def prepare_image(image) -> jnp.ndarray:
    """Convert a PIL image / uint8 array / [0,1] float array (NHWC or HWC)
    to the pipeline's NCHW float32 [-1, 1] convention."""
    arr = np.asarray(image)
    if arr.ndim == 3:
        arr = arr[None]
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    arr = arr.astype(np.float32) * 2.0 - 1.0
    return jnp.asarray(np.transpose(arr, (0, 3, 1, 2)))


class StableDiffusionXLImg2ImgPipeline(StableDiffusionXLPipeline):
    """SDXL refiner: TE2-only conditioning + aesthetic score + img2img."""

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
        requires_aesthetics_score: bool = True,
    ):
        super().__init__(
            tokenizer, tokenizer_2, text_encoder, text_encoder_2, vae, unet,
            scheduler, dtype,
        )
        self.requires_aesthetics_score = requires_aesthetics_score

    @classmethod
    def from_pretrained(cls, directory: str, dtype=jnp.float32):
        """Load an SDXL-refiner diffusers checkpoint: like the base SDXL
        layout but without ``text_encoder``/``tokenizer`` subfolders."""
        import json
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
        te2 = CLIPTextModelWithProjection.from_config(
            hf_io.load_config_json(os.path.join(directory, "text_encoder_2")),
            dtype=dtype,
            param_dtype=dtype,
        )
        scheduler, scheduler_state = DDIMScheduler.from_pretrained(
            directory, subfolder="scheduler"
        )

        params = {
            "unet": hf_io.load_unet_params(os.path.join(directory, "unet"), dtype),
            "vae": hf_io.load_vae_params(os.path.join(directory, "vae"), dtype),
            "text_encoder_2": hf_io.load_text_encoder_2_params(
                os.path.join(directory, "text_encoder_2"), dtype
            ),
            "scheduler": scheduler_state,
        }

        te1 = None
        te1_dir = os.path.join(directory, "text_encoder")
        if os.path.isdir(te1_dir):  # base-style checkpoint driven as img2img
            te1 = CLIPTextModel.from_config(
                hf_io.load_config_json(te1_dir), dtype=dtype, param_dtype=dtype
            )
            params["text_encoder"] = hf_io.load_text_encoder_params(te1_dir, dtype)

        def _tok(sub):
            tok_dir = os.path.join(directory, sub)
            if not os.path.isdir(tok_dir):
                return None
            from transformers import CLIPTokenizer

            return CLIPTokenizer.from_pretrained(tok_dir)

        requires_aesthetics_score = te1 is None
        index_path = os.path.join(directory, "model_index.json")
        if os.path.isfile(index_path):
            with open(index_path) as f:
                requires_aesthetics_score = bool(
                    json.load(f).get(
                        "requires_aesthetics_score", requires_aesthetics_score
                    )
                )

        pipe = cls(
            _tok("tokenizer"), _tok("tokenizer_2"), te1, te2, vae, unet,
            scheduler, requires_aesthetics_score=requires_aesthetics_score,
        )
        return pipe, params

    def save_pretrained(self, save_directory: str, params) -> None:
        """Export in diffusers refiner layout. A TE1-less checkpoint writes
        unet/vae/scheduler/text_encoder_2/tokenizer_2 only; with a first
        tower present the base SDXL layout is used."""
        if self.text_encoder is not None and "text_encoder" in params:
            super().save_pretrained(save_directory, params)
            return

        import json
        import os

        from ..models import hf_io
        from ..train.checkpoint import _to_numpy_f32
        from .sdxl import export_text_encoder_2

        os.makedirs(save_directory, exist_ok=True)
        # the pipeline's OWN scheduler config (a loaded epsilon-prediction
        # refiner must round-trip as epsilon, not a hardcoded default)
        self.scheduler.save_config(os.path.join(save_directory, "scheduler"))

        unet_dir = os.path.join(save_directory, "unet")
        self.unet.save_config(unet_dir)
        hf_io.save_unet_params(_to_numpy_f32(params["unet"]), unet_dir)
        vae_dir = os.path.join(save_directory, "vae")
        self.vae.save_config(vae_dir)
        hf_io.save_vae_params(_to_numpy_f32(params["vae"]), vae_dir)

        export_text_encoder_2(
            self.text_encoder_2, params["text_encoder_2"], save_directory
        )
        if self.tokenizer_2 is not None:
            self.tokenizer_2.save_pretrained(
                os.path.join(save_directory, "tokenizer_2")
            )
        index = {
            "_class_name": "FlaxStableDiffusionXLImg2ImgPipeline",
            "_diffusers_version": "0.21.4",
            "requires_aesthetics_score": self.requires_aesthetics_score,
            "scheduler": ["diffusers", "FlaxDDIMScheduler"],
            "text_encoder_2": ["transformers", "FlaxCLIPTextModelWithProjection"],
            "tokenizer_2": ["transformers", "CLIPTokenizer"],
            "unet": ["diffusers", "FlaxUNet2DConditionModel"],
            "vae": ["diffusers", "FlaxAutoencoderKL"],
        }
        with open(os.path.join(save_directory, "model_index.json"), "w") as f:
            json.dump(index, f, indent=2, sort_keys=True)

    # --- conditioning ---------------------------------------------------------
    def _encode_prompt_pair(self, prompt_ids, prompt_2_ids, params):
        """Refiner conditioning: TE2 penultimate hidden states only (1280
        channels); fall back to the base dual-tower concat when a first
        tower is present (base checkpoint driven as img2img)."""
        if self.text_encoder is not None and "text_encoder" in params:
            return super()._encode_prompt_pair(prompt_ids, prompt_2_ids, params)
        out2 = self.text_encoder_2(
            prompt_2_ids,
            params=params["text_encoder_2"],
            output_hidden_states=True,
        )
        return out2.hidden_states[-2], out2.text_embeds

    def _time_ids(
        self,
        batch_size: int,
        height: int,
        width: int,
        crops_coords_top_left: Tuple[int, int],
        aesthetic_score: float,
        negative_aesthetic_score: float,
    ) -> jnp.ndarray:
        """(2B, 5) refiner ids ``[h, w, crop_t, crop_l, aesthetic]`` — the
        negative half carries the negative score — or the base (2B, 6)
        target-size ids when the UNet was trained without aesthetics."""
        if self.requires_aesthetics_score:
            neg = jnp.array(
                [[height, width, *crops_coords_top_left, negative_aesthetic_score]],
                dtype=jnp.float32,
            )
            pos = jnp.array(
                [[height, width, *crops_coords_top_left, aesthetic_score]],
                dtype=jnp.float32,
            )
            return jnp.concatenate(
                [
                    jnp.broadcast_to(neg, (batch_size, 5)),
                    jnp.broadcast_to(pos, (batch_size, 5)),
                ]
            )
        ids = jnp.array(
            [[height, width, *crops_coords_top_left, height, width]],
            dtype=jnp.float32,
        )
        return jnp.broadcast_to(ids, (2 * batch_size, 6))

    # --- generation -------------------------------------------------------------
    def _generate_img2img(
        self,
        prompt_ids: jnp.ndarray,
        image: jnp.ndarray,
        params: Dict[str, Any],
        prng_seed: jax.Array,
        start_step: int,
        num_inference_steps: int,
        guidance_scale: float,
        neg_prompt_ids: Optional[jnp.ndarray],
        prompt_2_ids: Optional[jnp.ndarray],
        neg_prompt_2_ids: Optional[jnp.ndarray],
        aesthetic_score: float,
        negative_aesthetic_score: float,
        crops_coords_top_left: Tuple[int, int] = (0, 0),
    ) -> jnp.ndarray:
        if prompt_2_ids is None:
            prompt_2_ids = prompt_ids
        batch_size = prompt_ids.shape[0]
        height, width = image.shape[2], image.shape[3]

        if neg_prompt_ids is None:
            tok = self.tokenizer_2 if self.tokenizer is None else self.tokenizer
            uncond = tok(
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
        added_cond = {
            "text_embeds": pooled,
            "time_ids": self._time_ids(
                batch_size, height, width, crops_coords_top_left,
                aesthetic_score, negative_aesthetic_score,
            ),
        }

        # encode the input image; sample with the first rng split, noise with
        # the second (NCHW draw shapes for seed parity with the NHWC models)
        sample_rng, noise_rng = jax.random.split(prng_seed)
        image_in = image.astype(self.dtype)
        if self._model_nhwc():
            image_in = jnp.transpose(image_in, (0, 2, 3, 1))
        latent_dist = self.vae.encode(image_in, {"params": params["vae"]}).latent_dist
        init_latents = latent_dist.sample(sample_rng).astype(jnp.float32)
        if self._model_nhwc():
            init_latents = jnp.transpose(init_latents, (0, 3, 1, 2))
        init_latents = init_latents * self.vae.config.scaling_factor

        scheduler_state = self.scheduler.set_timesteps(
            params["scheduler"],
            num_inference_steps=num_inference_steps,
            shape=init_latents.shape,
        )
        noise = jax.random.normal(
            noise_rng, shape=init_latents.shape, dtype=jnp.float32
        )
        latent_timestep = jnp.array(
            scheduler_state.timesteps, dtype=jnp.int32
        )[start_step][None]
        latents = self.scheduler.add_noise(
            scheduler_state,
            init_latents,
            noise,
            jnp.broadcast_to(latent_timestep, (batch_size,)),
        )

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
            for i in range(start_step, num_inference_steps):
                latents, scheduler_state = loop_body(i, (latents, scheduler_state))
        else:
            latents, scheduler_state = jax.lax.fori_loop(
                start_step, num_inference_steps, loop_body,
                (latents, scheduler_state),
            )

        latents = latents / self.vae.config.scaling_factor
        decode_in = latents
        if self._model_nhwc():
            decode_in = jnp.transpose(decode_in, (0, 2, 3, 1))

        def _decode(z):
            return self.vae.decode(
                z.astype(self.dtype), {"params": params["vae"]}
            ).sample

        # per-sample decode at >=768² actual output only (see sdxl.py note)
        out_size = max(latents.shape[2], latents.shape[3]) * self.vae_scale_factor
        if out_size >= 768 and decode_in.shape[0] > 1:
            image_out = jax.lax.map(
                lambda z: _decode(z[None])[0], decode_in
            )
        else:
            image_out = _decode(decode_in)
        image_out = image_out.astype(jnp.float32)
        if not self._model_nhwc():
            image_out = jnp.transpose(image_out, (0, 2, 3, 1))
        return (image_out / 2 + 0.5).clip(0, 1)

    def __call__(
        self,
        prompt_ids: jnp.ndarray,
        image: jnp.ndarray,
        params: Dict[str, Any],
        prng_seed: jax.Array,
        strength: float = 0.3,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        neg_prompt_ids: Optional[jnp.ndarray] = None,
        prompt_2_ids: Optional[jnp.ndarray] = None,
        neg_prompt_2_ids: Optional[jnp.ndarray] = None,
        aesthetic_score: float = 6.0,
        negative_aesthetic_score: float = 2.5,
        jit: bool = False,
        return_dict: bool = True,
    ):
        """Refine/redraw ``image`` (NCHW float32 in [-1, 1]; see
        ``prepare_image``). ``strength`` picks how much of the schedule to
        re-run: 0.3 keeps most of the input, 1.0 redraws from (almost) pure
        noise. Static per (steps, strength) pair so the denoise loop bounds
        stay compile-time constants."""
        if not 0.0 < strength <= 1.0:
            raise ValueError(f"strength must be in (0, 1], got {strength}")
        init_timestep = min(int(num_inference_steps * strength), num_inference_steps)
        if init_timestep < 1:
            # strength < 1/steps would denoise zero steps and index the
            # timestep array out of bounds (JAX clamps silently)
            raise ValueError(
                f"strength={strength} runs no denoise steps at "
                f"num_inference_steps={num_inference_steps}; use strength "
                f">= {1.0 / num_inference_steps:.4f} or more steps"
            )
        start_step = max(num_inference_steps - init_timestep, 0)

        args = (prompt_ids, image, params, prng_seed)
        kwargs = dict(
            start_step=start_step,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
            neg_prompt_ids=neg_prompt_ids,
            prompt_2_ids=prompt_2_ids,
            neg_prompt_2_ids=neg_prompt_2_ids,
            aesthetic_score=aesthetic_score,
            negative_aesthetic_score=negative_aesthetic_score,
        )
        if jit:
            if self._jitted_generate is None:
                self._jitted_generate = jax.jit(
                    self._generate_img2img,
                    static_argnames=(
                        "start_step",
                        "num_inference_steps",
                        "aesthetic_score",
                        "negative_aesthetic_score",
                    ),
                )
            images = self._jitted_generate(*args, **kwargs)
        else:
            images = self._generate_img2img(*args, **kwargs)
        if not return_dict:
            return (images, False)
        return {"images": images, "nsfw_content_detected": False}


FlaxStableDiffusionXLImg2ImgPipeline = StableDiffusionXLImg2ImgPipeline
