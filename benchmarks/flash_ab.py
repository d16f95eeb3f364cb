"""Flash-attention block-size sweep + XLA comparison at SD-relevant shapes.

Run from the repo root on the TPU: ``python benchmarks/flash_ab.py``.
Times fwd and fwd+bwd (value-forced syncs) for the Pallas flash kernel over
a (block_q, block_k) grid and for the fused XLA attention, at the sequence
lengths the SD1.5/SDXL UNets actually produce (512² image -> 4096 tokens at
d40, 1024 at d80, 256 at d160; 1024² SDXL -> 16384 at d64; text
cross-attention 227 keys). Informs DEFAULT_BLOCK_Q/K and the auto-dispatch
threshold in ``ops.attention``.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from stable_diffusion_training_tpu.ops.attention import dot_product_attention  # noqa: E402
from stable_diffusion_training_tpu.ops.flash_attention import flash_attention  # noqa: E402

SHAPES = [  # (batch, seq_q, seq_k, heads, dim)
    (8, 4096, 4096, 8, 40),     # SD1.5 512² level-0 self
    (8, 1024, 1024, 8, 80),     # SD1.5 512² level-1 self
    (8, 4096, 227, 8, 40),      # long-caption cross
    (4, 16384, 16384, 8, 64),   # SDXL-1024²-scale self
]
BLOCKS = [(256, 256), (512, 512), (1024, 512), (512, 1024), (1024, 1024)]


def _timed(fn, *args, steps=8):
    out = fn(*args)
    _ = float(jnp.sum(out))  # force
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / steps


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    for (b, sq, sk, h, d) in SHAPES:
        kq = jax.random.PRNGKey(0)
        q = jax.random.normal(kq, (b, sq, h, d), jnp.bfloat16)
        k = jax.random.normal(kq, (b, sk, h, d), jnp.bfloat16)
        v = jax.random.normal(kq, (b, sk, h, d), jnp.bfloat16)
        print(f"\nshape b{b} q{sq} k{sk} h{h} d{d}:")

        def loss_of(fn):
            return jax.jit(lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32)))

        def grad_of(fn):
            return jax.jit(jax.grad(
                lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32))
            ))

        # XLA baseline (skip the 16k case where it OOMs)
        if sq * sk <= 4096 * 4096:
            try:
                t_f = _timed(loss_of(dot_product_attention), q, k, v)
                t_b = _timed(grad_of(dot_product_attention), q, k, v)
                print(f"  xla:              fwd {t_f*1e3:7.2f} ms   fwd+bwd {t_b*1e3:7.2f} ms")
            except Exception as e:
                print(f"  xla: failed ({type(e).__name__})")

        for (bq, bk) in BLOCKS:
            if bq > sq + 127 or bk > sk + 127:
                continue
            fn = lambda q, k, v: flash_attention(q, k, v, block_q=bq, block_k=bk)  # noqa: E731
            try:
                t_f = _timed(loss_of(fn), q, k, v)
                t_b = _timed(grad_of(fn), q, k, v)
                print(f"  flash {bq:4d}x{bk:4d}:  fwd {t_f*1e3:7.2f} ms   fwd+bwd {t_b*1e3:7.2f} ms")
            except Exception as e:
                print(f"  flash {bq:4d}x{bk:4d}: failed ({type(e).__name__}: {e})")


if __name__ == "__main__":
    main()
