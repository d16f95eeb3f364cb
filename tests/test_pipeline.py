"""Inference pipeline tests: CFG denoise loop, output range, checkpoint
round-trip through from_pretrained."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_diffusion_training_tpu.diffusion import DDIMScheduler
from stable_diffusion_training_tpu.models import (
    AutoencoderKL,
    CLIPTextModel,
    UNet2DConditionModel,
    configs,
)
from stable_diffusion_training_tpu.pipeline import StableDiffusionPipeline


@pytest.fixture(scope="module")
def tiny_pipeline():
    rng = jax.random.PRNGKey(0)
    common = dict(data_format="NHWC")
    unet = UNet2DConditionModel(**configs.TINY_UNET, **common)
    vae = AutoencoderKL(**configs.TINY_VAE, **common)
    te = CLIPTextModel(**configs.TINY_CLIP)
    scheduler = DDIMScheduler(
        beta_start=0.00085,
        beta_end=0.012,
        beta_schedule="scaled_linear",
        num_train_timesteps=1000,
        prediction_type="v_prediction",
    )
    params = {
        "unet": unet.init(rng, batch_size=1, height=8, width=8),
        "vae": vae.init(rng),
        "text_encoder": te.init(rng),
        "scheduler": scheduler.create_state(),
    }
    pipe = StableDiffusionPipeline(None, te, vae, unet, scheduler)
    return pipe, params


def _ids(batch=2, seed=0):
    return jax.random.randint(jax.random.PRNGKey(seed), (batch, 77), 0, 1000)


class TestPipeline:
    def test_generate_shape_and_range(self, tiny_pipeline):
        pipe, params = tiny_pipeline
        out = pipe(
            _ids(),
            params,
            jax.random.PRNGKey(1),
            num_inference_steps=3,
            height=32,
            width=32,
            guidance_scale=4.0,
            neg_prompt_ids=_ids(seed=9),
        )
        images = out["images"]
        assert images.shape == (2, 32, 32, 3)
        assert bool(jnp.isfinite(images).all())
        assert float(images.min()) >= 0.0 and float(images.max()) <= 1.0
        assert out["nsfw_content_detected"] is False

    def test_jit_matches_eager(self, tiny_pipeline):
        pipe, params = tiny_pipeline
        kw = dict(
            num_inference_steps=2,
            height=32,
            width=32,
            guidance_scale=2.0,
            neg_prompt_ids=_ids(seed=9),
        )
        eager = pipe(_ids(), params, jax.random.PRNGKey(2), **kw)["images"]
        jitted = pipe(_ids(), params, jax.random.PRNGKey(2), jit=True, **kw)["images"]
        np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), atol=1e-5)

    def test_guidance_scale_matters(self, tiny_pipeline):
        pipe, params = tiny_pipeline
        kw = dict(num_inference_steps=2, height=32, width=32,
                  neg_prompt_ids=_ids(seed=9))
        a = pipe(_ids(), params, jax.random.PRNGKey(3), guidance_scale=1.0, **kw)
        b = pipe(_ids(), params, jax.random.PRNGKey(3), guidance_scale=8.0, **kw)
        assert not np.allclose(a["images"], b["images"], atol=1e-5)

    def test_latents_override_deterministic(self, tiny_pipeline):
        pipe, params = tiny_pipeline
        latents = jax.random.normal(jax.random.PRNGKey(5), (2, 4, 16, 16))
        kw = dict(num_inference_steps=2, height=32, width=32, guidance_scale=2.0,
                  latents=latents, neg_prompt_ids=_ids(seed=9))
        a = pipe(_ids(), params, jax.random.PRNGKey(1), **kw)["images"]
        b = pipe(_ids(), params, jax.random.PRNGKey(2), **kw)["images"]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_from_pretrained_roundtrip(self, tiny_pipeline, tmp_path):
        pipe, params = tiny_pipeline
        out_dir = str(tmp_path / "pipe_ckpt")
        pipe.save_pretrained(out_dir, params)
        pipe2, params2 = StableDiffusionPipeline.from_pretrained(out_dir)
        kw = dict(num_inference_steps=2, height=32, width=32, guidance_scale=2.0,
                  neg_prompt_ids=_ids(seed=9))
        a = pipe(_ids(), params, jax.random.PRNGKey(4), **kw)["images"]
        # saved scheduler is DDIM scaled_linear/v_prediction (reference rule),
        # same as the fixture's -> outputs must match
        b = pipe2(_ids(), params2, jax.random.PRNGKey(4), **kw)["images"]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_multi_device_dp_inference(tiny_pipeline, cpu_devices):
    """GSPMD multi-device batching: shard the prompt batch over the data
    axis and run the jitted pipeline (replaces the reference's pmap path)."""
    from jax.sharding import NamedSharding, PartitionSpec

    from stable_diffusion_training_tpu.core import mesh as mesh_lib

    pipe, params = tiny_pipeline
    mesh = mesh_lib.create_mesh(shape=(8,), axis_names=("data_parallel",))
    sharding = NamedSharding(mesh, PartitionSpec("data_parallel"))
    ids = jax.device_put(_ids(batch=8), sharding)
    neg = jax.device_put(_ids(batch=8, seed=9), sharding)
    out = pipe(
        ids, params, jax.random.PRNGKey(0),
        num_inference_steps=2, height=32, width=32, guidance_scale=3.0,
        neg_prompt_ids=neg, jit=True,
    )
    images = out["images"]
    assert images.shape == (8, 32, 32, 3)
    assert bool(jnp.isfinite(images).all())


@pytest.mark.slow  # second dtype variant of the denoise-loop compile
def test_bf16_pipeline_runs(tiny_pipeline):
    """bf16 compute path end-to-end (mixed-precision inference)."""
    from stable_diffusion_training_tpu.diffusion import DDIMScheduler
    from stable_diffusion_training_tpu.models import (
        AutoencoderKL, CLIPTextModel, UNet2DConditionModel, configs,
    )

    rng = jax.random.PRNGKey(0)
    common = dict(data_format="NHWC", dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    unet = UNet2DConditionModel(**configs.TINY_UNET, **common)
    vae = AutoencoderKL(**configs.TINY_VAE, **common)
    te = CLIPTextModel(**configs.TINY_CLIP, dtype=jnp.bfloat16,
                       param_dtype=jnp.bfloat16)
    scheduler = DDIMScheduler(
        beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
        num_train_timesteps=1000, prediction_type="v_prediction",
    )
    params = {
        "unet": unet.init(rng, batch_size=1, height=8, width=8),
        "vae": vae.init(rng),
        "text_encoder": te.init(rng),
        "scheduler": scheduler.create_state(),
    }
    pipe = StableDiffusionPipeline(None, te, vae, unet, scheduler)
    out = pipe(_ids(1), params, jax.random.PRNGKey(1), num_inference_steps=2,
               height=32, width=32, guidance_scale=2.0,
               neg_prompt_ids=_ids(1, seed=3))
    assert bool(jnp.isfinite(out["images"]).all())
