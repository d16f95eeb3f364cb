"""SDXL-shape training: micro-conditioned UNet (text_time added embeddings)
through the fused train step with frozen text encoder — the BASELINE
config-5 recipe at tiny scale."""

import jax
import numpy as np
import optax
import pytest
from flax.training import train_state

from stable_diffusion_training_tpu.diffusion import DDPMScheduler
from stable_diffusion_training_tpu.models import (
    AutoencoderKL,
    CLIPTextModel,
    UNet2DConditionModel,
    configs,
)
from stable_diffusion_training_tpu.train import train_step
from stable_diffusion_training_tpu.train.states import FrozenModel


TINY_SDXL_UNET = dict(
    sample_size=8,
    in_channels=4,
    out_channels=4,
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
    block_out_channels=(32, 64),
    layers_per_block=1,
    transformer_layers_per_block=(1, 2),
    attention_head_dim=(2, 4),
    cross_attention_dim=32,
    use_linear_projection=True,
    addition_embed_type="text_time",
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=8 * 6 + 16,  # 6 time_ids + pooled 16
)


@pytest.mark.slow
def test_sdxl_micro_conditioned_train_step():
    rng = jax.random.PRNGKey(0)
    unet = UNet2DConditionModel(**TINY_SDXL_UNET, data_format="NHWC")
    vae = AutoencoderKL(**configs.TINY_VAE, data_format="NHWC")
    te = CLIPTextModel(**configs.TINY_CLIP)

    unet_params = unet.init(rng, batch_size=1, height=8, width=8)
    vae_params = vae.init(rng)
    te_params = te.init(rng)

    scheduler = DDPMScheduler(
        beta_start=0.00085, beta_end=0.012,
        beta_schedule="zero_snr_scaled_linear",
        num_train_timesteps=1000, prediction_type="v_prediction",
    )
    unet_state = train_state.TrainState.create(
        apply_fn=unet.apply, params=unet_params, tx=optax.lion(1e-4)
    )
    te_state = train_state.TrainState.create(
        apply_fn=te.__call__, params=te_params, tx=optax.set_to_zero()
    )
    frozen_vae = FrozenModel(call=vae, params=vae_params)
    frozen_sched = FrozenModel(call=scheduler, params=scheduler.create_state())

    from stable_diffusion_training_tpu.data.memory import synthetic_batch

    batch = synthetic_batch(4, (32, 32), concat_count=1, vocab_size=1000)
    # SDXL micro-conditioning: pooled second-TE embeds + size/crop time_ids
    batch["pooled_text_embeds"] = np.random.RandomState(0).randn(4, 16).astype(
        np.float32
    )
    batch["time_ids"] = np.tile(
        np.array([[32, 32, 0, 0, 32, 32]], np.float32), (4, 1)
    )

    step = jax.jit(
        train_step,
        donate_argnums=(0, 1),
        static_argnames=(
            "strip_bos_eos_token", "offset_noise_magnitude",
            "min_snr_gamma_magnitude", "perturbation_noise_magnitude",
            "ema_rate", "train_text_encoder",
        ),
    )
    prev = jax.tree.map(lambda x: np.asarray(x), unet_state.params)
    out = step(
        unet_state, te_state, None, None, batch, jax.random.PRNGKey(1),
        frozen_vae, frozen_sched,
        strip_bos_eos_token=False,
        offset_noise_magnitude=0.0,
        min_snr_gamma_magnitude=0.0,
        perturbation_noise_magnitude=0.0,
        ema_rate=0.0,
        train_text_encoder=False,
    )
    assert np.isfinite(float(out[4]["loss"]))
    # the add_embedding branch received grads (its params moved)
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        out[0].params["add_embedding"],
        prev["add_embedding"],
    )
    assert max(jax.tree.leaves(moved)) > 0
