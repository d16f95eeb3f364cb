"""A/B: fully DENSE-layout fused Lion kernel vs the transposed-layout path.

The round-3 trace attributes ~103 ms/step to XLA transpose copies around
the block-transposed Lion kernel (``grad.reshape(nb,16).T`` in, ``upd.T``
out). Mosaic can't lower lane-splitting reshapes in-kernel (probed), but
it doesn't need to: store the momentum in the GRAD'S OWN dense layout.

- codes: ``(N/128, 128)`` int8 — the free bitcast view of the flat
  parameter; a quantization block (16 consecutive flat elements) is 16
  consecutive LANES of one row, so block membership — and therefore
  numerics — is bitwise-identical to the reference blocking.
- scales: tile-grouped f32 storage ``(8 * x/r, r)`` (see
  ``optim.lion8bit._scales_flat_to_dense``); each kernel tile reads a
  contiguous full-lane-width ``(8, r)`` block whose ``s[j, c]`` is the
  scale of block ``(t*r + c)*8 + j``.
- per-block absmax: lane roll-tree max (4 cyclic rolls; window [l, l+15]
  lands the exact group max on lane 16j), picked straight into the
  storage layout with an exact one-hot dot_general.
- scale expand: exact one-hot ``dot_general(S(8,R), E(8,128))`` -> (R,128).

Everything is elementwise/roll/one-hot-matmul on dense (R,128) tiles:
zero relayouts in-kernel AND zero XLA copies outside (grad in, update out
are free bitcasts of the natural parameter layout).

Run on the TPU:  python benchmarks/lion_dense_ab.py [n_elems_millions]
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
    _scales_dense_to_flat,
    _scales_flat_to_dense,
)

BS = 16
GPR = 128 // BS


def timed(fn, grad, codes, scales, iters=30):
    """Chained (state feeds the next call) + value-forced sync: on the
    tunneled chip, block_until_ready alone returns at enqueue-ack time and
    unchained same-input calls get deduped — both were measured as
    impossible >10 TB/s effective bandwidths before this shape."""
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

    # transposed layout: codes (16, nb), scales (1, nb)
    codes_t = jnp.asarray(codes_flat.reshape(nb, BS).T)
    scales_t = jnp.asarray(scales_flat.reshape(1, nb))
    # dense layout: codes (x, 128), scales tile-grouped (gpr*x/r, r)
    codes_d = jnp.asarray(codes_flat.reshape(x, 128))
    scales_d = _scales_flat_to_dense(jnp.asarray(scales_flat), x, GPR)

    cur = jax.jit(lambda g, c, s: fused_lion8bit_update_transposed(g, c, s))
    new = jax.jit(lambda g, c, s: fused_lion8bit_update_dense(g, c, s))

    t_cur, out_cur = timed(cur, grad, codes_t, scales_t)
    try:
        t_new, out_new = timed(new, grad, codes_d, scales_d)
    except Exception as exc:
        print(f"dense variant FAILED: {type(exc).__name__}: {str(exc)[:600]}")
        return

    # map dense outputs back to flat order for comparison
    upd_cur = np.asarray(out_cur[0]).reshape(-1)
    upd_new = np.asarray(out_new[0]).reshape(-1)
    codes_cur = np.asarray(out_cur[1]).T.reshape(-1)          # (16,nb) -> flat
    codes_new = np.asarray(out_new[1]).reshape(-1)
    scales_cur = np.asarray(out_cur[2]).reshape(-1)           # (1,nb) -> flat
    scales_new = np.asarray(_scales_dense_to_flat(out_new[2], x))

    print(f"n={n/1e6:.1f}M  bitwise: upd={bool((upd_cur==upd_new).all())} "
          f"codes={bool((codes_cur==codes_new).all())} "
          f"scales={bool((scales_cur==scales_new).all())}")
    gb = (2 * grad.size * grad.dtype.itemsize + 2 * n + 2 * 4 * nb) / 1e9
    print(f"transposed (XLA transposes outside): {t_cur*1e3:8.2f} ms")
    print(f"dense (zero relayouts):              {t_new*1e3:8.2f} ms "
          f"({gb/t_new:6.1f} GB/s eff)  ratio {t_new/t_cur:.3f}x")


if __name__ == "__main__":
    main()
