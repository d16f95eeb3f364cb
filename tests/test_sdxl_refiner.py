"""SDXL refiner / img2img pipeline: TE2-only conditioning, aesthetic-score
time ids (5 instead of 6), strength-controlled denoise window."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy pipeline fixtures; run with -m slow

from stable_diffusion_training_tpu.diffusion import DDIMScheduler
from stable_diffusion_training_tpu.models import (
    AutoencoderKL,
    CLIPTextModelWithProjection,
    UNet2DConditionModel,
    configs,
)
from stable_diffusion_training_tpu.pipeline import (
    StableDiffusionXLImg2ImgPipeline,
    prepare_image,
)


@pytest.fixture(scope="module")
def tiny_refiner_pipeline():
    rng = jax.random.PRNGKey(0)
    # TE2-only context: cross_attention_dim must equal TE2 hidden size
    unet_cfg = dict(configs.TINY_SDXL_REFINER_UNET)
    te2_cfg = dict(configs.TINY_CLIP, hidden_size=32, num_attention_heads=4)
    unet = UNet2DConditionModel(**unet_cfg, data_format="NHWC")
    vae = AutoencoderKL(**configs.TINY_VAE, data_format="NHWC")
    te2 = CLIPTextModelWithProjection(**te2_cfg, projection_dim=16, eos_token_id=2)
    scheduler = DDIMScheduler(
        beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
        num_train_timesteps=1000, prediction_type="v_prediction",
    )
    params = {
        "unet": unet.init(rng, batch_size=1, height=8, width=8),
        "vae": vae.init(rng),
        "text_encoder_2": te2.init(rng),
        "scheduler": scheduler.create_state(),
    }
    pipe = StableDiffusionXLImg2ImgPipeline(
        None, None, None, te2, vae, unet, scheduler,
        requires_aesthetics_score=True,
    )
    return pipe, params


def _ids(batch=2, seed=0):
    return jax.random.randint(jax.random.PRNGKey(seed), (batch, 77), 3, 1000)


def _image(batch=2, size=32, seed=5):
    return jax.random.uniform(
        jax.random.PRNGKey(seed), (batch, 3, size, size), minval=-1, maxval=1
    )


def test_prepare_image_uint8_and_float():
    u8 = (np.arange(2 * 8 * 8 * 3) % 256).astype(np.uint8).reshape(2, 8, 8, 3)
    out = prepare_image(u8)
    assert out.shape == (2, 3, 8, 8)
    assert float(out.min()) >= -1.0 and float(out.max()) <= 1.0
    f = np.zeros((8, 8, 3), np.float32)  # single HWC image, [0,1]
    out = prepare_image(f)
    assert out.shape == (1, 3, 8, 8)
    np.testing.assert_allclose(np.asarray(out), -1.0)


def test_refiner_generate(tiny_refiner_pipeline):
    pipe, params = tiny_refiner_pipeline
    out = pipe(
        _ids(), _image(), params, jax.random.PRNGKey(1),
        strength=0.5, num_inference_steps=4, guidance_scale=4.0,
        neg_prompt_ids=_ids(seed=7),
    )
    images = out["images"]
    assert images.shape == (2, 32, 32, 3)
    assert bool(jnp.isfinite(images).all())
    assert float(images.min()) >= 0.0 and float(images.max()) <= 1.0


def test_refiner_jit_matches_eager(tiny_refiner_pipeline):
    pipe, params = tiny_refiner_pipeline
    kw = dict(strength=0.5, num_inference_steps=4, guidance_scale=3.0,
              neg_prompt_ids=_ids(seed=7))
    a = pipe(_ids(), _image(), params, jax.random.PRNGKey(2), **kw)["images"]
    b = pipe(_ids(), _image(), params, jax.random.PRNGKey(2), jit=True, **kw)[
        "images"
    ]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_refiner_strength_controls_fidelity(tiny_refiner_pipeline):
    """Lower strength keeps the output closer to the input image."""
    pipe, params = tiny_refiner_pipeline
    img = _image(batch=1)
    ref = np.asarray((img / 2 + 0.5).clip(0, 1).transpose(0, 2, 3, 1))
    kw = dict(num_inference_steps=4, guidance_scale=3.0,
              neg_prompt_ids=_ids(1, seed=7))
    low = pipe(_ids(1), img, params, jax.random.PRNGKey(3), strength=0.25, **kw)
    high = pipe(_ids(1), img, params, jax.random.PRNGKey(3), strength=1.0, **kw)
    err_low = float(np.abs(np.asarray(low["images"]) - ref).mean())
    err_high = float(np.abs(np.asarray(high["images"]) - ref).mean())
    assert err_low < err_high


def test_refiner_aesthetic_score_matters(tiny_refiner_pipeline):
    pipe, params = tiny_refiner_pipeline
    kw = dict(strength=0.5, num_inference_steps=4, guidance_scale=3.0,
              neg_prompt_ids=_ids(seed=7))
    a = pipe(_ids(), _image(), params, jax.random.PRNGKey(4),
             aesthetic_score=6.0, **kw)["images"]
    b = pipe(_ids(), _image(), params, jax.random.PRNGKey(4),
             aesthetic_score=1.0, **kw)["images"]
    assert not np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_refiner_save_load_roundtrip(tiny_refiner_pipeline, tmp_path):
    pipe, params = tiny_refiner_pipeline
    out_dir = str(tmp_path / "refiner_ckpt")
    pipe.save_pretrained(out_dir, params)
    pipe2, params2 = StableDiffusionXLImg2ImgPipeline.from_pretrained(out_dir)
    assert pipe2.text_encoder is None and pipe2.requires_aesthetics_score
    kw = dict(strength=0.5, num_inference_steps=2, guidance_scale=3.0,
              neg_prompt_ids=_ids(seed=7))
    a = pipe(_ids(), _image(), params, jax.random.PRNGKey(6), **kw)["images"]
    b = pipe2(_ids(), _image(), params2, jax.random.PRNGKey(6), **kw)["images"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_refiner_rejects_bad_strength(tiny_refiner_pipeline):
    pipe, params = tiny_refiner_pipeline
    with pytest.raises(ValueError):
        pipe(_ids(), _image(), params, jax.random.PRNGKey(5), strength=0.0)


def test_refiner_time_ids_layout():
    from stable_diffusion_training_tpu.data.latent_cache import sdxl_time_ids

    ids = sdxl_time_ids(3, (512, 512), (0, 0), (512, 512), aesthetic_score=6.0)
    assert ids.shape == (3, 5) and ids.dtype == np.float32
    np.testing.assert_array_equal(ids[0], [512, 512, 0, 0, 6.0])


def test_latent_cache_refiner_conditioning(tmp_path):
    from stable_diffusion_training_tpu.data import InMemoryDataLoader
    from stable_diffusion_training_tpu.data.latent_cache import (
        precompute_latent_cache,
        sdxl_time_ids,
    )
    from stable_diffusion_training_tpu.models import AutoencoderKL

    vae = AutoencoderKL(**configs.TINY_VAE, data_format="NHWC")
    te2 = CLIPTextModelWithProjection(**configs.TINY_CLIP_PROJ)
    rng = jax.random.PRNGKey(0)
    loader = InMemoryDataLoader.synthetic(
        2, 2, [(32, 32)], concat_count=3, vocab_size=1000, seed=0
    )
    cached = precompute_latent_cache(
        loader, vae, vae.init(rng), str(tmp_path / "cache"),
        text_encoder_2=te2, te2_params=te2.init(rng), aesthetic_score=6.0,
    )
    batch = cached.grab_next_batch()
    np.testing.assert_array_equal(
        batch["time_ids"],
        sdxl_time_ids(2, (32, 32), (0, 0), (32, 32), aesthetic_score=6.0),
    )


@pytest.mark.slow
def test_refiner_trainer_end_to_end(tmp_path, monkeypatch):
    """Refiner training through the full trainer path: latent cache with
    aesthetic-score time ids + frozen TE2 pooled embeds, 5-id text_time
    UNet, AOT fused step."""
    import json
    import os

    from stable_diffusion_training_tpu.core import mesh as mesh_lib
    from stable_diffusion_training_tpu.data import InMemoryDataLoader
    from stable_diffusion_training_tpu.data.latent_cache import (
        precompute_latent_cache,
    )
    from stable_diffusion_training_tpu.models import AutoencoderKL
    from stable_diffusion_training_tpu.train import trainer
    from test_trainer import make_config_dict

    monkeypatch.chdir(tmp_path)
    base = str(tmp_path / "ckpt" / "refiner")
    cfg = make_config_dict(
        tmp_path,
        model_path=base + "@0",
        model_family="tiny_sdxl_refiner",
        chunk_limit=1,
        use_latent_cache=True,
        sdxl_micro_conditioning=True,
        sdxl_time_ids_count=5,  # refiner: size/crop/aesthetic
        train_text_encoder=False,
        image_area_root=[64],
        minimum_axis_length=[64],
        batch_size=2,
        loss_logging_interval=1,
    )
    config_path = str(tmp_path / "props.json")
    with open(config_path, "w") as f:
        json.dump(cfg, f)

    vae = AutoencoderKL(**configs.TINY_VAE, data_format="NHWC")
    te2 = CLIPTextModelWithProjection(**configs.TINY_CLIP_PROJ)
    rng = jax.random.PRNGKey(0)
    loader = InMemoryDataLoader.synthetic(
        2, 2, [(64, 64)], concat_count=3, vocab_size=1000, seed=0
    )
    cached = precompute_latent_cache(
        loader, vae, vae.init(rng), str(tmp_path / "cache"),
        text_encoder_2=te2, te2_params=te2.init(rng), aesthetic_score=6.0,
    )
    mesh = mesh_lib.create_mesh(shape=(2, 1), devices=jax.devices()[:2])
    trainer.main(
        config_dict_path=config_path, dataloader=cached, tokenizer=None,
        mesh=mesh,
    )
    with open(cfg["loss_csv"]) as f:
        rows = [l for l in f.read().splitlines()[1:] if l]
    assert rows and all(np.isfinite(float(r.split(",")[2])) for r in rows)
    assert os.path.isdir(f"{base}@0/unet")
