"""Category breakdown of the fused train step from an xprof trace.

Thin driver around ``utils.xplane.category_report`` (per-op self time from
the device plane's exact "XLA Ops" line, bucketed into optimizer / flash /
conv / fusion / copy categories with per-family drill-down, plus the
"Async XLA Ops" occupancy totals, which overlap compute and are NOT
serialized time). For cached-latent SDXL-recipe legs use bench.py's
``BENCH_TRACE=1`` hook instead — it traces whatever leg run_leg builds.

Caveat: a ``while`` op's self time (e.g. a lax.map'd VAE encode) INCLUDES
its body, whose ops are also counted individually — so the serialized
total can exceed wall time when loops are present; compare category
deltas, not the grand total, on loopy programs.

Usage (on the TPU):  python benchmarks/trace_categories.py [batch] [res] [family]
"""

import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 3


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    family = sys.argv[3] if len(sys.argv) > 3 else "sd15"

    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    import bench
    from stable_diffusion_training_tpu.core import mesh as mesh_lib
    from stable_diffusion_training_tpu.data.memory import synthetic_batch
    from stable_diffusion_training_tpu.models import configs as model_configs
    from stable_diffusion_training_tpu.train import (
        on_device_model_training_state,
        train_step,
    )
    from stable_diffusion_training_tpu.utils import xplane

    cfg = bench._build_config(family, batch, res, reference_style=False)
    (unet_state, te_state, _, _, frozen_vae, frozen_sched, _) = (
        on_device_model_training_state(cfg)
    )
    vocab = model_configs.MODEL_FAMILIES[family]["text_encoder"]["vocab_size"]
    b = synthetic_batch(batch, (res, res), concat_count=3, seed=0, vocab_size=vocab)
    mesh = mesh_lib.get_default_mesh()
    b = jax.tree_util.tree_map(
        lambda leaf: jax.device_put(
            leaf, NamedSharding(mesh, PartitionSpec("data_parallel"))
        ),
        b,
    )
    static = dict(
        strip_bos_eos_token=True,
        offset_noise_magnitude=0.0,
        min_snr_gamma_magnitude=0.0,
        perturbation_noise_magnitude=0.0,
        ema_rate=0.0,
        # mirror bench.py: per-sample VAE encode at >=768 streaming legs
        vae_encode_chunk=1 if res >= 768 else 0,
    )
    step = jax.jit(train_step, donate_argnums=(0, 1, 2, 3),
                   static_argnames=tuple(static))
    rng = jax.random.PRNGKey(0)
    for _ in range(2):
        out = step(unet_state, te_state, None, None, b, rng,
                   frozen_vae, frozen_sched, **static)
        unet_state, te_state, rng = out[0], out[1], out[5]
        _ = float(out[4]["loss"])

    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = step(unet_state, te_state, None, None, b, rng,
                   frozen_vae, frozen_sched, **static)
        unet_state, te_state, rng = out[0], out[1], out[5]
    _ = float(out[4]["loss"])
    wall_ms = (time.perf_counter() - t0) / STEPS * 1e3

    trace_dir = tempfile.mkdtemp(prefix="sdt_trace_")
    with jax.profiler.trace(trace_dir):
        for _ in range(STEPS):
            out = step(unet_state, te_state, None, None, b, rng,
                       frozen_vae, frozen_sched, **static)
            unet_state, te_state, rng = out[0], out[1], out[5]
        _ = float(out[4]["loss"])

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print(f"no xplane.pb under {trace_dir}")
        return
    print(f"{family} batch {batch} @ {res}px:")
    print(xplane.category_report(paths[0], STEPS, wall_ms=wall_ms))


if __name__ == "__main__":
    main()
