"""Capture an xprof trace of the fused train step and print the top time
sinks (no tensorboard needed — decoded by ``utils.xplane``).

Usage (on the TPU):  python benchmarks/trace_top_ops.py [batch] [res] [k]

Drives the same leg as ``bench.py`` (optimized backends), traces a few
steady-state steps, then aggregates per-op self time from the device
plane's "XLA Ops" line. Output feeds PERF_NOTES.md's top-sinks table
(round-2 VERDICT item 1: attack MFU with a trace).
"""

import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 15

    import jax
    import numpy as np
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

    cfg = bench._build_config("sd15", batch, res, reference_style=False)
    (unet_state, te_state, _, _, frozen_vae, frozen_sched, _) = (
        on_device_model_training_state(cfg)
    )
    vocab = model_configs.MODEL_FAMILIES["sd15"]["text_encoder"]["vocab_size"]
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
    )
    step = jax.jit(train_step, donate_argnums=(0, 1, 2, 3),
                   static_argnames=tuple(static))
    rng = jax.random.PRNGKey(0)
    for _ in range(2):  # compile + warm
        out = step(unet_state, te_state, None, None, b, rng,
                   frozen_vae, frozen_sched, **static)
        unet_state, te_state, rng = out[0], out[1], out[5]
        _ = float(out[4]["loss"])

    trace_dir = tempfile.mkdtemp(prefix="sdt_trace_")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = step(unet_state, te_state, None, None, b, rng,
                       frozen_vae, frozen_sched, **static)
            unet_state, te_state, rng = out[0], out[1], out[5]
        _ = float(out[4]["loss"])

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print(f"no xplane.pb produced under {trace_dir} (relay may not "
              "support device tracing)")
        return
    print(f"trace: {paths[0]}")
    # device plane first; fall back to any plane (relay naming differs)
    for plane_sub, line_sub in (("/device:TPU", "XLA Ops"),
                                ("/device:TPU", ""), ("", "")):
        top = xplane.top_ops(paths[0], k=k, plane_substring=plane_sub,
                             line_substring=line_sub)
        if top:
            break
    total_ms = sum(t for _, t, _ in top)
    print(f"top {len(top)} ops (plane~'{plane_sub}', line~'{line_sub}'), "
          f"3 steps, batch {batch} @ {res}px:")
    for name, ms, n in top:
        # names are full HLO instruction strings; keep "%op = shape opcode"
        short = name if len(name) <= 140 else name[:137] + "..."
        print(f"  {ms / 3:9.3f} ms/step  x{n:<5d} {short}")
    print(f"  sum of listed: {total_ms / 3:.1f} ms/step")


if __name__ == "__main__":
    main()
