"""SDXL pipeline: dual-tower prompt encoding, micro-conditioning, CFG loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy pipeline fixtures; run with -m slow

from stable_diffusion_training_tpu.diffusion import DDIMScheduler
from stable_diffusion_training_tpu.models import (
    AutoencoderKL,
    CLIPTextModel,
    CLIPTextModelWithProjection,
    UNet2DConditionModel,
    configs,
)
from stable_diffusion_training_tpu.pipeline import StableDiffusionXLPipeline
from test_sdxl import TINY_SDXL_UNET


@pytest.fixture(scope="module")
def tiny_sdxl_pipeline():
    rng = jax.random.PRNGKey(0)
    # context = hidden1(32) + hidden2(?); TINY_SDXL cross_attention_dim=32
    # -> use 16+16 towers
    te1_cfg = dict(configs.TINY_CLIP, hidden_size=16, num_attention_heads=2)
    te2_cfg = dict(configs.TINY_CLIP, hidden_size=16, num_attention_heads=2)
    unet_cfg = dict(TINY_SDXL_UNET)
    unet = UNet2DConditionModel(**unet_cfg, data_format="NHWC")
    vae = AutoencoderKL(**configs.TINY_VAE, data_format="NHWC")
    te1 = CLIPTextModel(**te1_cfg)
    te2 = CLIPTextModelWithProjection(**te2_cfg, projection_dim=16, eos_token_id=2)
    scheduler = DDIMScheduler(
        beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
        num_train_timesteps=1000, prediction_type="v_prediction",
    )
    params = {
        "unet": unet.init(rng, batch_size=1, height=8, width=8),
        "vae": vae.init(rng),
        "text_encoder": te1.init(rng),
        "text_encoder_2": te2.init(rng),
        "scheduler": scheduler.create_state(),
    }
    pipe = StableDiffusionXLPipeline(None, None, te1, te2, vae, unet, scheduler)
    return pipe, params


def _ids(batch=2, seed=0):
    return jax.random.randint(jax.random.PRNGKey(seed), (batch, 77), 3, 1000)


def test_sdxl_generate(tiny_sdxl_pipeline):
    pipe, params = tiny_sdxl_pipeline
    out = pipe(
        _ids(), params, jax.random.PRNGKey(1),
        num_inference_steps=2, height=32, width=32, guidance_scale=4.0,
        neg_prompt_ids=_ids(seed=7),
    )
    images = out["images"]
    assert images.shape == (2, 32, 32, 3)
    assert bool(jnp.isfinite(images).all())
    assert float(images.min()) >= 0.0 and float(images.max()) <= 1.0


def test_sdxl_jit_matches_eager(tiny_sdxl_pipeline):
    pipe, params = tiny_sdxl_pipeline
    kw = dict(num_inference_steps=2, height=32, width=32, guidance_scale=3.0,
              neg_prompt_ids=_ids(seed=7))
    a = pipe(_ids(), params, jax.random.PRNGKey(2), **kw)["images"]
    b = pipe(_ids(), params, jax.random.PRNGKey(2), jit=True, **kw)["images"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sdxl_second_prompt_matters(tiny_sdxl_pipeline):
    pipe, params = tiny_sdxl_pipeline
    kw = dict(num_inference_steps=2, height=32, width=32, guidance_scale=3.0,
              neg_prompt_ids=_ids(seed=7))
    a = pipe(_ids(), params, jax.random.PRNGKey(3), **kw)["images"]
    b = pipe(_ids(), params, jax.random.PRNGKey(3),
             prompt_2_ids=_ids(seed=11), **kw)["images"]
    assert not np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sdxl_save_load_roundtrip(tiny_sdxl_pipeline, tmp_path):
    pipe, params = tiny_sdxl_pipeline
    out_dir = str(tmp_path / "sdxl_ckpt")
    pipe.save_pretrained(out_dir, params)
    pipe2, params2 = StableDiffusionXLPipeline.from_pretrained(out_dir)
    kw = dict(num_inference_steps=2, height=32, width=32, guidance_scale=3.0,
              neg_prompt_ids=_ids(seed=7))
    a = pipe(_ids(), params, jax.random.PRNGKey(4), **kw)["images"]
    b = pipe2(_ids(), params2, jax.random.PRNGKey(4), **kw)["images"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
