"""Component timing breakdown of the SD1.5 fused train step.

Times each stage of the step separately (VAE encode, CLIP forward, UNet
forward, UNet fwd+bwd, optimizer apply, full fused step) with value-forced
syncs, so PERF_NOTES.md can attribute the step time and target the next
optimization. Run from the repo root on the TPU:
``python benchmarks/step_breakdown.py``. Env: BD_BATCH (12), BD_RES (512).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: config builder)
from stable_diffusion_training_tpu.data.memory import synthetic_batch  # noqa: E402
from stable_diffusion_training_tpu.train import (  # noqa: E402
    on_device_model_training_state,
    train_step,
)


def timed(fn, *args, steps=6, **kw):
    """fn must return a (near-)scalar so no multi-GB output stays resident
    between stages on a 16G chip."""
    out = fn(*args, **kw)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args, **kw)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / steps


def main():
    batch = int(os.environ.get("BD_BATCH", "12"))
    res = int(os.environ.get("BD_RES", "512"))
    cfg = bench._build_config("sd15", batch, res, False)
    (unet_state, te_state, _, _, frozen_vae, frozen_sched, _) = (
        on_device_model_training_state(cfg)
    )
    b = synthetic_batch(batch, (res, res), concat_count=3, seed=0, vocab_size=49408)
    b = {k: jnp.asarray(v) for k, v in b.items()}
    print(f"device={jax.devices()[0].device_kind} batch={batch} res={res}")

    # VAE encode
    pixels_nhwc = jnp.transpose(b["pixel_values"], (0, 2, 3, 1)).astype(jnp.bfloat16)

    @jax.jit
    def vae_encode(px):
        out = frozen_vae.call.apply(
            {"params": frozen_vae.params}, px, deterministic=True, method="encode"
        )
        return out.latent_dist.mean

    print(f"vae_encode:        {timed(vae_encode, pixels_nhwc)*1e3:8.1f} ms")

    # CLIP forward (3x77 windows)
    @jax.jit
    def clip_fwd(ids):
        return te_state.apply_fn(params=te_state.params, input_ids=ids)[0]

    print(f"clip_fwd (B*3,77): {timed(clip_fwd, b['input_ids'])*1e3:8.1f} ms")

    # UNet forward / forward+backward
    lat = jnp.zeros((batch, res // 8, res // 8, 4), jnp.bfloat16)
    ctx = jnp.zeros((batch, 227, 768), jnp.bfloat16)
    t = jnp.zeros((batch,), jnp.int32)

    @jax.jit
    def unet_fwd(p, lat, t, ctx):
        return unet_state.apply_fn({"params": p}, lat, t, ctx)

    print(f"unet_fwd:          {timed(unet_fwd, unet_state.params, lat, t, ctx)*1e3:8.1f} ms")

    # standalone fwd+bwd lacks the fused step's donation/scheduling headroom:
    # at batch 12 it OOMs 16G even though the full step fits, so measure the
    # backward at batch 8 (params + activations + grads all resident here)
    bwd_batch = int(os.environ.get("BD_BWD_BATCH", "8"))
    lat8 = lat[:bwd_batch]
    t8 = t[:bwd_batch]
    ctx8 = ctx[:bwd_batch]

    @jax.jit
    def unet_fwd_bwd(p, lat, t, ctx):
        def loss(p):
            return jnp.mean(
                unet_state.apply_fn({"params": p}, lat, t, ctx).astype(jnp.float32) ** 2
            )

        g = jax.grad(loss)(p)
        # reduce to a scalar inside the program: the grad tree (1.7 GB bf16)
        # must not become a resident output between stages
        return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(g))

    print(
        f"unet_fwd+bwd (b{bwd_batch}): "
        f"{timed(unet_fwd_bwd, unet_state.params, lat8, t8, ctx8)*1e3:8.1f} ms"
    )

    # optimizer apply (clip-norm -> 8-bit Lion -> decay -> lr) on both states
    ones_u = jax.tree_util.tree_map(jnp.ones_like, unet_state.params)

    @jax.jit
    def opt_apply(state, g):
        new = state.apply_gradients(grads=g)
        return sum(
            jnp.sum(x.astype(jnp.float32))
            for x in jax.tree_util.tree_leaves(new.params)[:4]
        )

    print(f"optimizer (unet):  {timed(opt_apply, unet_state, ones_u)*1e3:8.1f} ms")

    # full fused step
    step = jax.jit(
        train_step,
        donate_argnums=(0, 1, 2, 3),
        static_argnames=(
            "strip_bos_eos_token", "offset_noise_magnitude",
            "min_snr_gamma_magnitude", "perturbation_noise_magnitude",
            "ema_rate",
        ),
    )
    kw = dict(strip_bos_eos_token=True, offset_noise_magnitude=0.0,
              min_snr_gamma_magnitude=0.0, perturbation_noise_magnitude=0.0,
              ema_rate=0.0)
    rng = jax.random.PRNGKey(0)

    def full(us, ts, rng):
        out = step(us, ts, None, None, b, rng, frozen_vae, frozen_sched, **kw)
        return out

    us, ts = unet_state, te_state
    out = full(us, ts, rng)
    us, ts, rng = out[0], out[1], out[5]
    _ = float(out[4]["loss"])
    t0 = time.perf_counter()
    n = 6
    for _ in range(n):
        out = full(us, ts, rng)
        us, ts, rng = out[0], out[1], out[5]
    _ = float(out[4]["loss"])
    print(f"full fused step:   {(time.perf_counter()-t0)/n*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
