"""A/B: narrow (nb, bs) Lion kernel vs block-TRANSPOSED (bs, nb) layout.

Trace finding (round 3, PERF_NOTES): the fused Lion update is the single
biggest sink of the b15 train step — 430 ms/step, ~26 GB/s effective — and
the suspected cause is the narrow layout's (rows, 16) int8/f32 tiles
filling 16 of 128 VPU lanes (8x pad amplification on every DMA). The
transposed layout puts the block dim on SUBLANES and the block index on
LANES: (16, cols) tiles are fully packed, per-block absmax is a cheap
cross-sublane reduction, and no cross-lane tricks are needed (unlike the
failed "wide" one-hot-matmul experiment).

Run on the TPU:  python benchmarks/lion_transposed_ab.py [n_params_millions]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stable_diffusion_training_tpu.ops.lion_kernel import (
    fused_lion8bit_update,
    fused_lion8bit_update_transposed,
)

BS = 16


def main():
    m = float(sys.argv[1]) if len(sys.argv) > 1 else 16.0
    n = int(m * 1e6) // (BS * 128) * (BS * 128)
    nb = n // BS
    interpret = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    grad = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    codes = jnp.asarray(rng.integers(-127, 128, size=(nb, BS)), jnp.int8)
    scales = jnp.asarray(1.0 / (rng.random((nb, 1)) + 0.5), jnp.float32)

    # correctness: transposed == narrow (bitwise)
    u1, c1, s1 = jax.jit(
        lambda g, c, s: fused_lion8bit_update(g, c, s, interpret=interpret)
    )(grad, codes, scales)
    f_t = jax.jit(lambda g, ct, st: fused_lion8bit_update_transposed(
        g, ct, st, interpret=interpret))
    u2, c2, s2 = f_t(grad, codes.T, scales.T)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2.T))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2.T))
    print(f"bitwise parity OK at {n/1e6:.1f}M params")

    def bench(fn, *args, iters=20):
        out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        return (time.perf_counter() - t0) / iters

    f_n = jax.jit(lambda g, c, s: fused_lion8bit_update(
        g, c, s, interpret=interpret))
    t_n = bench(f_n, grad, codes, scales)
    ct, st = codes.T, scales.T
    t_t = bench(f_t, grad, ct, st)
    traffic = n * (4 + 1 + 4 + 1 + 0.5)  # g r, codes r/w, upd w, scales
    print(f"narrow:     {t_n*1e3:8.2f} ms  ({traffic/t_n/1e9:6.1f} GB/s)")
    print(f"transposed: {t_t*1e3:8.2f} ms  ({traffic/t_t/1e9:6.1f} GB/s)")
    print(f"ratio: {t_t/t_n:.3f}x")


if __name__ == "__main__":
    main()
