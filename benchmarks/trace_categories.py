"""Category breakdown of the fused train step from an xprof trace.

Buckets per-op self time (device plane, exact "XLA Ops" line — see
``utils.xplane.op_durations``) into coarse categories (optimizer
custom-calls, flash-attention custom-calls, convolutions, copies,
fusions, other) so PERF_NOTES.md can track where the step goes after
each optimization. Also prints the "Async XLA Ops" occupancy totals
separately — those overlap compute and are NOT serialized time.

Caveat: a ``while`` op's self time (e.g. a lax.map'd VAE encode) INCLUDES
its body, whose ops are also counted individually — so the serialized
total can exceed wall time when loops are present; compare category
deltas, not the grand total, on loopy programs.

Usage (on the TPU):  python benchmarks/trace_categories.py [batch] [res]
"""

import glob
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 3


_OPCODE_RE = re.compile(r" = (?:\([^=]*?\) )?([a-z][a-z0-9-]*)\(")


def opcode_of(name: str) -> str:
    """Extract the HLO opcode from '%id = [tuple-shape ]opcode(operands)'."""
    m = _OPCODE_RE.search(name)
    return m.group(1) if m else "?"


def family_of(name: str) -> str:
    """Op-name family: the id with trailing .N / digits stripped."""
    opid = name.split(" = ", 1)[0].lstrip("%")
    return re.sub(r"[.\d]+$", "", opid)


def categorize(name: str) -> str:
    """Bucket a full HLO instruction string into a coarse category."""
    opid = name.split(" = ", 1)[0].lstrip("%")
    op = opcode_of(name)
    if op in ("copy", "copy-start", "copy-done", "transpose", "bitcast"):
        return "copy/relayout"
    if op == "custom-call":
        if "lion" in name.lower() or "s8[" in name:
            return "lion custom-call"
        if "attn" in opid or "flash" in name.lower():
            return "flash custom-call"
        return "other custom-call"
    if op == "convolution" or opid.startswith("convolution"):
        return "convolution"
    if op == "fusion":
        return "fusion"
    if op in ("all-reduce", "all-gather", "reduce-scatter",
              "collective-permute", "all-to-all"):
        return "collective"
    return "other"


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

    import time
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
    with open(paths[0], "rb") as f:
        data = f.read()

    for line_name, label in (("XLA Ops", "serialized (XLA Ops line)"),
                             ("Async XLA Ops", "async occupancy (overlaps)")):
        totals = xplane.op_durations(data, "/device:TPU", line_name)
        if not totals:
            print(f"[{label}] no events")
            continue
        cats = {}
        for name, (ps, n) in totals.items():
            c = categorize(name)
            t, cnt = cats.get(c, (0.0, 0))
            cats[c] = (t + ps, cnt + n)
        grand = sum(t for t, _ in cats.values()) / 1e9 / STEPS
        print(f"\n[{label}] total {grand:.1f} ms/step "
              f"(wall {wall_ms:.1f} ms/step), {family} batch {batch} @ {res}px:")
        for c, (ps, n) in sorted(cats.items(), key=lambda kv: -kv[1][0]):
            ms = ps / 1e9 / STEPS
            print(f"  {ms:8.1f} ms/step  {100*ms/max(grand,1e-9):5.1f}%  "
                  f"x{n//STEPS:<6d} {c}")
        # top op-name families inside each of the 3 biggest categories
        for big, _ in sorted(cats.items(), key=lambda kv: -kv[1][0])[:3]:
            fams = {}
            sample = {}
            for nm, (ps, n) in totals.items():
                if categorize(nm) != big:
                    continue
                f = family_of(nm)
                t, cnt = fams.get(f, (0.0, 0))
                fams[f] = (t + ps, cnt + n)
                if f not in sample or ps > sample[f][1]:
                    sample[f] = (nm, ps)
            print(f"  top families in '{big}':")
            for f, (ps, n) in sorted(fams.items(), key=lambda kv: -kv[1][0])[:6]:
                nm = sample[f][0]
                short = nm if len(nm) <= 120 else nm[:117] + "..."
                print(f"    {ps/1e9/STEPS:8.2f} ms/step x{n//STEPS:<6d} {f}"
                      f"  e.g. {short}")


if __name__ == "__main__":
    main()
