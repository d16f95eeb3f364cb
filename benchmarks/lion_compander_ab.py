"""A/B: compander="fast" vs "exact" in the fused dense Lion kernel.

The round-4 per-kernel roofline audit (PERF_NOTES) put the dense Lion
update at ~38 ms/step, VPU op-count-bound (not DMA-bound), with op-count
surgery bounded at <= ~2x (<= 19 ms). The fast compander spends part of
that budget with two reassociations of the same math (see
optim.lion8bit.scale_by_lion_8bit):

- dequant ``(q/127)^5 - off) / s``  ->  ``(q^5 * 127^-5 - off) * (1/s)``:
  the /127 folds into one constant on the 5th power, and the full-width
  VPU divide becomes a multiply (the reciprocal is taken on the
  16x-smaller scales array before the one-hot expand).
- (negative result, NOT shipped: the shared-lerp rewrite ``g + b2*(mu-g)``
  cancels catastrophically for fresh momentum — ops/lion_kernel note.)

Non-bitwise vs exact (ulp-level; codes move by at most one step —
tests/test_lion_kernel.py::TestFastCompander), bitwise pallas==jnp within
the fast mode. This script is the on-chip arbiter for whether the opt-in
earns its keep at step level.

Run on the TPU:  python benchmarks/lion_compander_ab.py [n_elems_millions]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stable_diffusion_training_tpu.ops.lion_kernel import (
    fused_lion8bit_update_dense,
    fused_lion8bit_update_transposed,
)
from stable_diffusion_training_tpu.optim.lion8bit import (
    _scales_flat_to_dense,
)

BS = 16
GPR = 128 // BS


def timed(fn, grad, codes, scales, iters=30):
    """Chained (state feeds the next call) + value-forced sync — same
    harness rationale as benchmarks/lion_dense_ab.py (unchained same-input
    calls get deduped on the tunneled chip)."""
    c, s = codes, scales
    out = fn(grad, c, s)
    _ = float(jnp.sum(out[2]))
    c, s = out[1], out[2]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(grad, c, s)
        c, s = out[1], out[2]
    _ = float(jnp.sum(out[2]))
    return (time.perf_counter() - t0) / iters, out


def main():
    m = float(sys.argv[1]) if len(sys.argv) > 1 else 29.5
    n = (int(m * 1e6) // (128 * 1024)) * 128 * 1024
    nb = n // BS
    x = n // 128
    rng = np.random.default_rng(0)
    grad = jnp.asarray(
        rng.standard_normal(n, dtype=np.float32), jnp.float32
    ).astype(jnp.bfloat16)
    codes_flat = rng.integers(-127, 128, n, dtype=np.int8)
    scales_flat = 1.0 / (rng.random(nb, dtype=np.float32) + 0.5)

    codes_d = jnp.asarray(codes_flat.reshape(x, 128))
    scales_d = _scales_flat_to_dense(jnp.asarray(scales_flat), x, GPR)
    codes_t = jnp.asarray(codes_flat.reshape(nb, BS).T)
    scales_t = jnp.asarray(scales_flat.reshape(1, nb))

    legs = {
        "dense/exact": (
            jax.jit(lambda g, c, s: fused_lion8bit_update_dense(
                g, c, s, compander="exact")),
            codes_d, scales_d,
        ),
        "dense/fast": (
            jax.jit(lambda g, c, s: fused_lion8bit_update_dense(
                g, c, s, compander="fast")),
            codes_d, scales_d,
        ),
        "transposed/exact": (
            jax.jit(lambda g, c, s: fused_lion8bit_update_transposed(
                g, c, s, compander="exact")),
            codes_t, scales_t,
        ),
        "transposed/fast": (
            jax.jit(lambda g, c, s: fused_lion8bit_update_transposed(
                g, c, s, compander="fast")),
            codes_t, scales_t,
        ),
    }
    times = {}
    outs = {}
    for name, (fn, c, s) in legs.items():
        t, out = timed(fn, grad, c, s)
        times[name] = t
        outs[name] = out
        gbytes = (2 * grad.size * grad.dtype.itemsize + 2 * n + 2 * 4 * nb) / 1e9
        print(f"{name:18s} {t*1e3:8.2f} ms  ({gbytes/t:6.1f} GB/s eff)")

    for layout in ("dense", "transposed"):
        te, tf = times[f"{layout}/exact"], times[f"{layout}/fast"]
        ue = np.asarray(outs[f"{layout}/exact"][0])
        uf = np.asarray(outs[f"{layout}/fast"][0])
        ce = np.asarray(outs[f"{layout}/exact"][1], np.int32)
        cf = np.asarray(outs[f"{layout}/fast"][1], np.int32)
        flips = float(np.mean(ue != uf))
        dmax = int(np.max(np.abs(ce - cf)))
        print(
            f"{layout}: fast/exact ratio {tf/te:.3f}x  "
            f"(saved {max(te-tf,0)*1e3:.2f} ms at {n/1e6:.1f}M elems)  "
            f"sign flips {flips:.2e}  max |code delta| {dmax}"
        )


if __name__ == "__main__":
    main()
