"""Inference throughput: DDIM text-to-image loop, images/sec/chip.

BASELINE config 2 pairs the 512² training loop with a DDIM eval; this
measures that eval path (jitted ``_generate``: CLIP x2 -> fori_loop of
CFG UNet calls + DDIM steps -> VAE decode) on the current default device.

Run from the repo root: ``python benchmarks/inference_bench.py``.
Env: INF_BATCH (4), INF_RES (512), INF_STEPS (30), INF_FAMILY (sd15),
INF_REPEATS (3).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stable_diffusion_training_tpu.diffusion import DDIMScheduler  # noqa: E402
from stable_diffusion_training_tpu.models import (  # noqa: E402
    AutoencoderKL,
    CLIPTextModel,
    UNet2DConditionModel,
    configs,
)
from stable_diffusion_training_tpu.pipeline import StableDiffusionPipeline  # noqa: E402


def main():
    batch = int(os.environ.get("INF_BATCH", "4"))
    res = int(os.environ.get("INF_RES", "512"))
    steps = int(os.environ.get("INF_STEPS", "30"))
    family = os.environ.get("INF_FAMILY", "sd15")
    repeats = int(os.environ.get("INF_REPEATS", "3"))

    fam = configs.MODEL_FAMILIES[family]
    dtype = jnp.bfloat16
    common = dict(dtype=dtype, param_dtype=dtype, data_format="NHWC")
    unet = UNet2DConditionModel(**fam["unet"], **common)
    vae = AutoencoderKL(**fam["vae"], **common)
    te = CLIPTextModel(**fam["text_encoder"])
    scheduler = DDIMScheduler(
        beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
        num_train_timesteps=1000, prediction_type="v_prediction",
    )
    rng = jax.random.PRNGKey(0)
    params = {
        "unet": unet.init(rng, batch_size=1, height=res // 8, width=res // 8),
        "vae": vae.init(rng),
        "text_encoder": te.init(rng),
        "scheduler": scheduler.create_state(),
    }
    pipe = StableDiffusionPipeline(None, te, vae, unet, scheduler)
    vocab = fam["text_encoder"]["vocab_size"]
    ids = jax.random.randint(jax.random.PRNGKey(1), (batch, 77), 3, vocab)
    neg = jax.random.randint(jax.random.PRNGKey(2), (batch, 77), 3, vocab)

    def run(seed):
        out = pipe(
            ids, params, jax.random.PRNGKey(seed),
            num_inference_steps=steps, height=res, width=res,
            neg_prompt_ids=neg, jit=True,
        )["images"]
        return float(out.mean())  # full sync through the relay

    t0 = time.perf_counter()
    run(0)
    print(f"compile+first batch: {time.perf_counter()-t0:.1f}s")
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        run(i + 1)
        times.append(time.perf_counter() - t0)
    best = min(times)
    n_chips = jax.device_count()
    print(
        f"{family} {res}² {steps}-step DDIM CFG, batch {batch}: "
        f"best {best:.2f}s -> {batch/best/n_chips:.3f} images/sec/chip "
        f"({best/steps*1e3/batch:.1f} ms/step/image)"
    )


if __name__ == "__main__":
    main()
