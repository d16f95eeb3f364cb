"""Per-kernel effective-bandwidth audit of the fused train step.

Round-4 discovery: the rig-roofline *copy* probes underestimate badly — a
single-dispatch `x * c` chain gets constant-folded / relay-floor-dominated
(scaling diagnostic: 8 vs 16 fori_loop reps, ratio 1.01), while a chained
GroupNorm's MARGINAL cost measures ~700 GB/s effective on the same chip.
If clean streaming kernels can do ~700 GB/s, the step's fusion category
(377 ms/step serialized, previously written off as "at the ~250 GB/s
ceiling") may have real headroom.

This audit answers per-kernel, from first principles:

1. compile the headline leg and parse the OPTIMIZED HLO — per instruction,
   bytes = sum(operand buffer sizes) + output buffer size(s), and whether
   the kernel contains MXU work (dot/convolution in its fusion body);
2. trace 3 steady-state steps and aggregate per-op device time (utils.xplane);
3. report the top time sinks with their effective GB/s (and the calibration
   bandwidth from the chained-GN marginal measurement in the same session).

Kernels WITHOUT MXU work running far below the calibration bandwidth are
optimization targets (bad layouts, f32 materialization, fusion shape);
kernels at/above it are genuinely bandwidth-pinned.

Usage (on the TPU):
    python benchmarks/fusion_bw_audit.py [batch] [res] [k] [family] [ff_remat]
e.g. the headline leg is `16 512 25 sd15 0` (the defaults) and the config-3
SD2.1 FF-remat leg is `8 768 25 sd21 1`.
"""

import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stable_diffusion_training_tpu.utils.hloaudit import INSTR_RE, parse_hlo  # noqa: E402

def gn_calibration_bw():
    """Marginal chained-GroupNorm bandwidth (GB/s) — the clean-stream rate
    the chip actually sustains this session (3 passes over X per GN)."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    class GN(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.silu(nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                        dtype=jnp.bfloat16,
                                        param_dtype=jnp.bfloat16)(x))

    mod = GN()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (16, 512, 512, 128), jnp.bfloat16)
    params = mod.init(key, x)

    def mk(reps):
        @jax.jit
        def chain(params, x):
            import jax.lax as lax
            return lax.fori_loop(0, reps, lambda i, x: mod.apply(params, x), x)
        return chain

    def timed(fn):
        float(fn(params, x).reshape(-1)[0])  # compile+warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(params, x)
            float(out.reshape(-1)[0])
            best = min(best, time.perf_counter() - t0)
        return best

    t8, t16 = timed(mk(8)), timed(mk(16))
    marginal = (t16 - t8) / 8  # per-GN seconds, relay floor cancelled
    nbytes = x.size * 2
    return 3 * nbytes / marginal / 1e9, marginal * 1e3


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    family = sys.argv[4] if len(sys.argv) > 4 else "sd15"
    ff_remat = bool(int(sys.argv[5])) if len(sys.argv) > 5 else False

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

    cal_bw, cal_ms = gn_calibration_bw()
    print(f"calibration: chained-GN marginal {cal_ms:.2f} ms "
          f"-> {cal_bw:.0f} GB/s clean-stream", flush=True)

    cfg = bench._build_config(
        family, batch, res, reference_style=False, ff_remat=ff_remat
    )
    (unet_state, te_state, _, _, frozen_vae, frozen_sched, _) = (
        on_device_model_training_state(cfg)
    )
    vocab = model_configs.MODEL_FAMILIES[family]["text_encoder"]["vocab_size"]
    b = synthetic_batch(batch, (res, res), concat_count=3, seed=0,
                        vocab_size=vocab)
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
    lowered = step.lower(unet_state, te_state, None, None, b,
                         jax.random.PRNGKey(0), frozen_vae, frozen_sched,
                         **static)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    idx = parse_hlo(hlo)
    print(f"HLO parsed: {len(idx.out_bytes)} instructions", flush=True)
    # same-session achievable matmul rate for the compute side of the roofline
    tf_cal = bench._measured_peak_flops() / 1e12
    print(f"calibration: measured matmul {tf_cal:.1f} TF/s", flush=True)

    rng = jax.random.PRNGKey(0)
    for _ in range(2):  # warm (donated states threaded through)
        out = compiled(unet_state, te_state, None, None, b, rng,
                       frozen_vae, frozen_sched)
        unet_state, te_state, rng = out[0], out[1], out[5]
        _ = float(out[4]["loss"])

    trace_dir = tempfile.mkdtemp(prefix="sdt_bw_audit_")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = compiled(unet_state, te_state, None, None, b, rng,
                           frozen_vae, frozen_sched)
            unet_state, te_state, rng = out[0], out[1], out[5]
        _ = float(out[4]["loss"])

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print(f"no xplane.pb under {trace_dir}")
        return
    with open(paths[0], "rb") as f:
        durations = xplane.op_durations(f.read())

    rows = []
    for raw_name, (ps, n) in durations.items():
        # trace names may be bare ("fusion.123") or full instruction text
        m = INSTR_RE.match(raw_name)
        name = m.group(1) if m else raw_name.strip().lstrip("%").split()[0]
        ms = ps / 1e9 / 3  # per step
        nb = idx.kernel_bytes(name)
        fl = idx.kernel_flops(name)
        if idx.opcode.get(name) in ("dot", "convolution"):
            fl = max(fl, 1.0)  # unfused MXU op: flops not tracked, mark MXU
        # roofline ideal: the binding resource at calibration rates.
        # custom-calls (flash/Lion Pallas kernels) have their own arbiters;
        # skip the flops side for them (bytes-only lower bound).
        ideal_ms = max(nb / (cal_bw * 1e9), fl / (tf_cal * 1e12)) * 1e3
        rows.append((ms, name, nb, fl, ideal_ms, idx.has_mxu(name)))
    rows.sort(reverse=True)

    print(f"\ntop {k} ops by serialized time/step (batch {batch} @ {res}px); "
          f"ideal = max(bytes/{cal_bw:.0f}GB/s, flops/{tf_cal:.0f}TF/s):")
    print(f"{'ms/step':>9} {'GB/step':>8} {'GF':>7} {'ideal':>7} {'gap':>5}"
          f"  mxu  name")
    for ms, name, nb, fl, ideal, mxu in rows[:k]:
        gap = ms / ideal if ideal > 1e-6 else float("inf")
        tag = "MXU" if mxu else "   "
        body = idx.body_of.get(name)
        ops = ",".join(sorted(idx.comp_ops.get(body, ()))) if body else ""
        print(f"{ms:9.3f} {nb / 1e9:8.3f} {fl / 1e9:7.1f} {ideal:7.3f} "
              f"{gap:5.1f}  {tag}  {name[:60]}  [{ops[:110]}]")

    # aggregate: how much step time sits >1.5x above its kernel roofline
    # (excluding custom-calls, whose flops the HLO parse cannot see)
    excess_ms = 0.0
    excess_ideal = 0.0
    for ms, name, nb, fl, ideal, mxu in rows:
        if idx.opcode.get(name) == "custom-call" or ms < 0.2:
            continue
        if ideal > 1e-6 and ms / ideal > 1.5:
            excess_ms += ms
            excess_ideal += ideal
    print(f"\nfusion kernels >0.2 ms running >1.5x above their roofline: "
          f"{excess_ms:.1f} ms/step now vs {excess_ideal:.1f} ideal -> "
          f"potential {excess_ms - excess_ideal:.1f} ms/step")
    total_ms = sum(r[0] for r in rows)
    print(f"total serialized {total_ms:.1f} ms/step across {len(rows)} ops")
    print(f"trace: {paths[0]}")


if __name__ == "__main__":
    main()
