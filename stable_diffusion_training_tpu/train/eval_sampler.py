"""Periodic DDIM eval sampling inside the training loop.

BASELINE config 2 calls for "SD 1.5 full training loop at 512², bf16, DDIM
eval sampling every N steps" — the reference has no in-loop eval at all
(its only visual check is inspecting per-chunk checkpoints by hand), so
this is a new capability, wired as an opt-in like ``profile_trace_dir``.

Config keys (all optional, in the raw config dict):

- ``eval_sample_interval``: sample every N train steps (0/absent = off);
- ``eval_sample_prompts``: list of prompt strings (tokenized with the run's
  tokenizer) — or ``eval_sample_prompt_ids``: pre-tokenized id rows for
  tokenizer-less runs (e.g. synthetic/in-memory loaders);
- ``eval_sample_dir``: output directory (default ``eval_samples`` next to
  loss.csv);
- ``eval_num_inference_steps`` (default 20), ``eval_guidance_scale``
  (default 7.5), ``eval_sample_resolution`` (default: the UNet's native
  ``sample_size * 8``);
- refiner runs (``sdxl_time_ids_count != 6``) have no text-to-image path;
  instead ``eval_sample_images`` (image paths or a directory) enables
  img2img eval — the live UNet re-refines the fixed base images each
  interval, with ``eval_refine_strength`` (default 0.3) picking the window.

Images are denoised with the same DDIM scaled_linear/v_prediction
configuration the checkpoints embed (``train/checkpoint.py:80-88``), from
the CURRENT live params (donated buffers are read, never kept), and written
as PNGs under ``eval_sample_dir/step_<N>/``.
"""

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


class EvalSampler:
    """Opt-in in-loop sampler; every call is a no-op when disabled."""

    def __init__(
        self,
        config_dict: Dict[str, Any],
        model_object_dict: Dict[str, Any],
        tokenizer: Optional[Any],
        metrics_writer: Optional[Any] = None,
    ):
        self.interval = int(config_dict.get("eval_sample_interval", 0) or 0)
        self._pipe = None
        self._prompt_ids = None
        self._neg_ids = None
        if not self.interval:
            return

        from ..diffusion import DDIMScheduler
        from ..pipeline import StableDiffusionPipeline

        self.out_dir = config_dict.get("eval_sample_dir", "eval_samples")
        self.num_steps = int(config_dict.get("eval_num_inference_steps", 20))
        self.guidance = float(config_dict.get("eval_guidance_scale", 7.5))
        self.resolution = config_dict.get("eval_sample_resolution")
        self.metrics_writer = metrics_writer

        # mirror the RUN's noise schedule (betas + prediction type), not a
        # fixed default — eval images must come from the model's own process
        scheduler = DDIMScheduler(
            beta_start=0.00085,
            beta_end=0.012,
            beta_schedule=config_dict.get("beta_scheduler", "scaled_linear"),
            num_train_timesteps=1000,
            prediction_type=config_dict.get("prediction_type", "v_prediction"),
        )
        self._scheduler_state = scheduler.create_state()

        unet = model_object_dict["unet"]
        self._te2_params = None
        self._img2img = False
        self._init_image = None
        addition_embed = getattr(
            getattr(unet, "config", None), "addition_embed_type", None
        ) or getattr(unet, "addition_embed_type", None)
        if addition_embed == "text_time":
            if int(config_dict.get("sdxl_time_ids_count", 6)) != 6:
                # refiner UNet (5 aesthetic-score time ids): no from-noise
                # text-to-image path exists, but the img2img refine loop can
                # still be evaluated in-loop against fixed base images
                # supplied via ``eval_sample_images`` (file paths or a
                # directory; ``eval_refine_strength`` picks the window)
                images_cfg = config_dict.get("eval_sample_images")
                if not images_cfg:
                    print(
                        "eval sampling disabled: refiner-style UNet "
                        "(sdxl_time_ids_count != 6) has no text-to-image "
                        "path; set eval_sample_images for img2img eval"
                    )
                    self.interval = 0
                    return
                from ..pipeline import StableDiffusionXLImg2ImgPipeline

                te2, te2_params, tokenizer_2 = self._load_text_encoder_2(
                    config_dict
                )
                if te2 is None:
                    print(
                        "eval sampling disabled: refiner UNet but no "
                        "text_encoder_2 found"
                    )
                    self.interval = 0
                    return
                self._te2_params = jax.device_put(te2_params)
                self._refine_strength = float(
                    config_dict.get("eval_refine_strength", 0.3)
                )
                self._init_image = self._load_eval_images(
                    images_cfg, self.resolution
                )
                self._pipe = StableDiffusionXLImg2ImgPipeline(
                    tokenizer,
                    tokenizer_2,
                    None,  # refiner conditions on the second tower only
                    te2,
                    model_object_dict["vae"],
                    unet,
                    scheduler,
                )
                self._img2img = True
                self._finish_prompts(config_dict, tokenizer)
                return
            # SDXL (BASELINE config 5): the UNet needs TE2's pooled embeds +
            # time_ids, but training keeps TE2 out of the live state (frozen
            # towers, cached context) — load it here, eval-only/lazily, from
            # the checkpoint dir or the model family
            from ..pipeline import StableDiffusionXLPipeline

            te2, te2_params, tokenizer_2 = self._load_text_encoder_2(
                config_dict
            )
            if te2 is None:
                print(
                    "eval sampling disabled: SDXL UNet but no text_encoder_2 "
                    "found (model_path has no text_encoder_2/ and the model "
                    "family defines none)"
                )
                self.interval = 0
                return
            self._te2_params = jax.device_put(te2_params)
            self._pipe = StableDiffusionXLPipeline(
                tokenizer,
                tokenizer_2,
                model_object_dict["text_encoder"],
                te2,
                model_object_dict["vae"],
                unet,
                scheduler,
            )
        else:
            self._pipe = StableDiffusionPipeline(
                tokenizer,
                model_object_dict["text_encoder"],
                model_object_dict["vae"],
                model_object_dict["unet"],
                scheduler,
            )

        self._finish_prompts(config_dict, tokenizer)

    def _finish_prompts(self, config_dict, tokenizer):
        # refiner checkpoints ship no first-tower tokenizer (diffusers
        # layout: tokenizer_2 only) — fall back to the pipeline's second
        # tokenizer so string prompts still work for img2img eval
        tok = tokenizer or getattr(self._pipe, "tokenizer_2", None)

        def _tokenize(texts):
            return np.asarray(
                tok(
                    list(texts),
                    padding="max_length",
                    max_length=tok.model_max_length,
                    truncation=True,
                    return_tensors="np",
                ).input_ids,
                np.int32,
            )

        prompts = config_dict.get("eval_sample_prompts")
        prompt_ids = config_dict.get("eval_sample_prompt_ids")
        if prompt_ids is not None:
            self._prompt_ids = np.asarray(prompt_ids, np.int32)
        elif prompts and tok is not None:
            self._prompt_ids = _tokenize(prompts)
        else:
            # nothing to sample from: disable rather than crash mid-run
            self.interval = 0
            self._pipe = None
            return
        if tokenizer is None:
            # the pipeline has no first tokenizer to build the
            # unconditional branch itself: tokenize empty strings with the
            # second tower's tokenizer, else an all-pad row (id 0)
            if tok is not None:
                self._neg_ids = _tokenize([""] * self._prompt_ids.shape[0])
            else:
                self._neg_ids = np.zeros_like(self._prompt_ids)
        if self._init_image is not None:
            # one base image per prompt row: tile/truncate to match
            b = self._prompt_ids.shape[0]
            img = self._init_image
            if img.shape[0] < b:
                reps = -(-b // img.shape[0])
                img = np.tile(img, (reps, 1, 1, 1))
            self._init_image = jax.device_put(img[:b])

    @staticmethod
    def _load_eval_images(images_cfg, resolution=None):
        """Load the img2img eval base images (NCHW float32 in [-1, 1]).
        ``images_cfg``: list of image file paths or a directory of images;
        resized to ``resolution`` when set (else must share one size)."""
        from ..pipeline import prepare_image

        if isinstance(images_cfg, str) and os.path.isdir(images_cfg):
            paths = sorted(
                os.path.join(images_cfg, f)
                for f in os.listdir(images_cfg)
                if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp"))
            )
        elif isinstance(images_cfg, str):
            paths = [images_cfg]  # a single image file path
        else:
            paths = list(images_cfg)
        if not paths:
            raise ValueError(f"eval_sample_images matched no files: {images_cfg!r}")
        from PIL import Image

        arrays = []
        for p in paths:
            im = Image.open(p).convert("RGB")
            if resolution:
                im = im.resize((int(resolution), int(resolution)))
            arrays.append(np.asarray(prepare_image(im))[0])
        return np.stack(arrays)

    @staticmethod
    def _load_text_encoder_2(config_dict):
        """TE2 (OpenCLIP-bigG tower) for SDXL eval: from the checkpoint's
        ``text_encoder_2/`` subfolder when ``model_path`` is a diffusers dir,
        else freshly initialized from the model family (tiny families /
        benchmarks). Returns (model, params, tokenizer_2) or (None,)*3."""
        from ..models import CLIPTextModelWithProjection, configs, hf_io
        from .states import _dtype_from_name

        dtype = _dtype_from_name(
            config_dict.get("mixed_precision", "bfloat16")
        )
        model_dir = config_dict["model_path"]
        te2_dir = os.path.join(model_dir, "text_encoder_2")
        if os.path.isdir(te2_dir):
            te2 = CLIPTextModelWithProjection.from_config(
                hf_io.load_config_json(te2_dir), dtype=dtype, param_dtype=dtype
            )
            params = hf_io.load_text_encoder_2_params(te2_dir, dtype)
            tok2_dir = os.path.join(model_dir, "tokenizer_2")
            tokenizer_2 = None
            if os.path.isdir(tok2_dir):
                try:
                    from transformers import CLIPTokenizer

                    tokenizer_2 = CLIPTokenizer.from_pretrained(tok2_dir)
                except Exception:
                    tokenizer_2 = None
            return te2, params, tokenizer_2

        fam_name = (
            model_dir
            if model_dir in configs.MODEL_FAMILIES
            else config_dict.get("model_family")
        )
        fam = configs.MODEL_FAMILIES.get(fam_name, {})
        if "text_encoder_2" not in fam:
            return None, None, None
        te2 = CLIPTextModelWithProjection(
            **fam["text_encoder_2"], dtype=dtype, param_dtype=dtype
        )
        params = te2.init(
            jax.random.PRNGKey(int(config_dict.get("seed_init", 0)))
        )
        return te2, params, None

    @property
    def active(self) -> bool:
        return bool(self.interval)

    def maybe_sample(self, step: int, unet_params, te_params, vae_params, rng):
        """Generate + save samples when ``step`` hits the interval.

        ``rng`` is consumed read-only (folded with the step index, never
        split back into the training stream), so sampling does not perturb
        training numerics but does track the run's seed."""
        if not self.interval or step % self.interval:
            return None
        base_rng = jax.random.PRNGKey(0) if rng is None else rng
        sample_rng = jax.random.fold_in(base_rng, step)
        params = {
            "unet": unet_params,
            "text_encoder": te_params,
            "vae": vae_params,
            "scheduler": self._scheduler_state,
        }
        if self._te2_params is not None:
            params["text_encoder_2"] = self._te2_params
        if self._img2img:
            # refiner eval: re-refine the fixed base images with the live
            # UNet (the trained model); TE2 is the eval-only frozen tower
            images = self._pipe(
                self._prompt_ids,
                self._init_image,
                params,
                sample_rng,
                strength=self._refine_strength,
                num_inference_steps=self.num_steps,
                guidance_scale=self.guidance,
                neg_prompt_ids=self._neg_ids,
                jit=True,
                return_dict=False,
            )[0]
        else:
            kwargs = {}
            if self.resolution:
                kwargs["height"] = kwargs["width"] = int(self.resolution)
            images = self._pipe(
                self._prompt_ids,
                params,
                sample_rng,
                num_inference_steps=self.num_steps,
                guidance_scale=self.guidance,
                neg_prompt_ids=self._neg_ids,
                jit=True,  # cached GSPMD program; first call pays the compile
                return_dict=False,
                **kwargs,
            )[0]

        # multi-host: the generate program runs collectively on every host,
        # but the output may span non-addressable devices — gather it, and
        # let only process 0 write files
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            arr = np.asarray(multihost_utils.process_allgather(images))
            arr = arr.reshape((-1,) + arr.shape[-3:])
            if jax.process_index() != 0:
                return None
        else:
            arr = np.asarray(images)

        step_dir = os.path.join(self.out_dir, f"step_{step:08d}")
        os.makedirs(step_dir, exist_ok=True)
        for i, pil in enumerate(self._pipe.numpy_to_pil(arr)):
            pil.save(os.path.join(step_dir, f"sample_{i}.png"))
        if self.metrics_writer is not None and self.metrics_writer.active:
            self.metrics_writer.scalar(
                "eval/sample_mean", float(arr.mean()), step
            )
        return step_dir
