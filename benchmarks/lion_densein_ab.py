"""A/B: fused Lion kernel with DENSE-natural grad input vs XLA transposes.

The round-3 trace shows ~103 ms/step of XLA copy/reshape around the
block-transposed Lion kernel: ``g2 = grad.reshape(nb, 16).T`` and the
``upd.T`` inverse both materialize full HBM round-trips with a 16-wide
minor dim (poor DMA pattern). Candidate fix: pass the grad to the kernel
as its FREE dense view ``(N/128, 128)`` and do the
``(cols/8, 128) -> reshape (cols, 16) -> transpose (16, cols)`` relayout
in VMEM, writing the sign update back through the inverse relayout so the
update also leaves in the dense natural layout.

Run on the TPU:  python benchmarks/lion_densein_ab.py [n_elems_millions]
Prints per-variant times and bitwise-parity checks vs the current kernel.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from stable_diffusion_training_tpu.ops.lion_kernel import (
    _dequantize,
    _quantize,
    fused_lion8bit_update_transposed,
)

BS = 16


def _kernel_dense_in(g_ref, codes_ref, scales_ref, upd_ref, new_codes_ref,
                     new_scales_ref, *, b1, b2, cols):
    # g_ref: (cols//8, 128) dense natural view of 16*cols flat elements
    g = g_ref[:].astype(jnp.float32)
    g2 = g.reshape(cols, BS).T                     # (16, cols) in VMEM
    mu = _dequantize(codes_ref[:], jnp.float32) / scales_ref[:]

    upd = jnp.sign((1.0 - b1) * g2 + b1 * mu)
    upd_ref[:] = upd.T.reshape(cols // 8, 128).astype(upd_ref.dtype)

    mu_new = (1.0 - b2) * g2 + b2 * mu
    absmax = jnp.max(jnp.abs(mu_new), axis=0, keepdims=True)
    scales = 1.0 / jnp.where(absmax <= 0.0, 1.0, absmax)
    new_codes_ref[:] = _quantize(mu_new * scales)
    new_scales_ref[:] = scales.astype(new_scales_ref.dtype)


def fused_dense_in(grad, codes_t, scales_t, b1=0.9, b2=0.99,
                   cols_per_tile=8192):
    bs, nb = codes_t.shape
    assert bs == BS and grad.size == bs * nb and nb % cols_per_tile == 0
    gd = grad.reshape(nb * bs // 128, 128)  # free bitcast view
    cols = cols_per_tile
    kernel = functools.partial(_kernel_dense_in, b1=float(b1), b2=float(b2),
                               cols=cols)
    upd, new_codes, new_scales = pl.pallas_call(
        kernel,
        grid=(nb // cols,),
        in_specs=[
            pl.BlockSpec((cols * bs // 128, 128), lambda i: (i, 0)),
            pl.BlockSpec((bs, cols), lambda i: (0, i)),
            pl.BlockSpec((1, cols), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((cols * bs // 128, 128), lambda i: (i, 0)),
            pl.BlockSpec((bs, cols), lambda i: (0, i)),
            pl.BlockSpec((1, cols), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb * bs // 128, 128), grad.dtype),
            jax.ShapeDtypeStruct((bs, nb), jnp.int8),
            jax.ShapeDtypeStruct((1, nb), jnp.float32),
        ],
    )(gd, codes_t, scales_t)
    return upd.reshape(grad.shape), new_codes, new_scales


def timed(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    m = float(sys.argv[1]) if len(sys.argv) > 1 else 29.5
    n = (int(m * 1e6) // (BS * 8192)) * BS * 8192
    nb = n // BS
    rng = np.random.default_rng(0)
    grad = jnp.asarray(rng.standard_normal(n, dtype=np.float32)
                       .astype(np.float16).astype(np.float32)).astype(jnp.bfloat16)
    codes = jnp.asarray(rng.integers(-127, 128, (BS, nb), dtype=np.int8))
    scales = jnp.asarray(1.0 / (rng.random((1, nb), dtype=np.float32) + 0.5))

    # current path: XLA transposes around the transposed-layout kernel,
    # mimicking what update_fn does (grad natural -> g2 -> kernel -> upd.T)
    cur = jax.jit(lambda g, c, s: fused_lion8bit_update_transposed(g, c, s))
    new = jax.jit(lambda g, c, s: fused_dense_in(g, c, s))

    t_cur, out_cur = timed(cur, grad, codes, scales)
    try:
        t_new, out_new = timed(new, grad, codes, scales)
    except Exception as exc:
        print(f"dense-in variant FAILED to lower/run: {type(exc).__name__}: "
              f"{str(exc)[:500]}")
        return

    ok_upd = bool(jnp.all(out_cur[0].reshape(-1) == out_new[0].reshape(-1)))
    ok_codes = bool(jnp.all(out_cur[1] == out_new[1]))
    ok_scales = bool(jnp.all(out_cur[2] == out_new[2]))
    gb = (2 * grad.size * grad.dtype.itemsize  # grad read + upd write
          + 2 * codes.size + 2 * 4 * scales.size) / 1e9
    print(f"n={n/1e6:.1f}M  bitwise: upd={ok_upd} codes={ok_codes} "
          f"scales={ok_scales}")
    print(f"current (XLA transposes): {t_cur*1e3:8.2f} ms "
          f"({gb/t_cur:6.1f} GB/s effective)")
    print(f"dense-in (VMEM relayout): {t_new*1e3:8.2f} ms "
          f"({gb/t_new:6.1f} GB/s effective)  ratio {t_new/t_cur:.3f}x")


if __name__ == "__main__":
    main()
