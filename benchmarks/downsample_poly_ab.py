"""A/B: polyphase stride-2 downsample conv vs the fused stride-2 form.

The round-4 per-kernel roofline audit (PERF_NOTES "roofline CORRECTION")
measured the VAE encoder's stride-2 downsample+GroupNorm fusions at
2.9-3.1x roofline (~23 ms/step total slack at the 512² b16 headline) while
the step's stride-1 convs run at ~96% of MXU spec. Prior attempts:
``optimization_barrier`` fusion split — no help; space-to-depth — rejected
(+78% contraction flops). This probe measures the third route,
``ops.conv.polyphase_stride2_conv`` (four stride-1 convs over the input
polyphases, identical 9-tap flop count, one extra read+write pass for the
phase slices), at the three headline-leg VAE downsample shapes.

Harness: chained ``fori_loop`` with a data-dependent ~identity perturbation
of the input (defeats loop-invariant hoisting and the tunneled chip's
same-input dedup), marginal-differenced across rep counts to cancel the
relay dispatch floor (same rationale as benchmarks/fusion_bw_audit.py). A
slice+mean null leg shows the perturbation overhead common to all legs;
the stride2-vs-poly DIFFERENCE is the honest quantity. Each shape is also
run with the trailing GroupNorm the real fusion carries, to check the
decomposition doesn't strand the GN out of a profitable fusion.

Run on the TPU:  python benchmarks/downsample_poly_ab.py [batch]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from stable_diffusion_training_tpu.ops.conv import (
    polyphase_stride2_conv,
    stride2_conv_reference,
)

# VAE encoder downsample shapes at the 512² headline leg: (H, W, C)
SHAPES = ((512, 128), (256, 256), (128, 512))


def group_norm(y, groups=32):
    n, h, w, c = y.shape
    g = y.reshape(n, h * w, groups, c // groups).astype(jnp.float32)
    mean = jnp.mean(g, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(g), axis=(1, 3), keepdims=True) - mean * mean
    return ((g - mean) * lax.rsqrt(var + 1e-6)).reshape(n, h, w, c).astype(
        y.dtype
    )


def mk(fn, reps):
    @jax.jit
    def run(x, k):
        def body(_, carry):
            x, acc = carry
            y = fn(x, k)
            acc = acc + jnp.mean(y.astype(jnp.float32))
            # data-dependent ~identity: (1 + 1e-12*acc) rounds to 1 in bf16
            # but cannot be folded at compile time
            x = (x.astype(jnp.float32) * (1.0 + 1e-12 * acc)).astype(x.dtype)
            return (x, acc)

        return lax.fori_loop(0, reps, body, (x, jnp.float32(0.0)))

    return run


def timed(fn, x, k):
    out = fn(x, k)
    _ = float(out[1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(x, k)
        _ = float(out[1])
        best = min(best, time.perf_counter() - t0)
    return best


def per_iter_ms(fn, x, k, lo=4, hi=12):
    t_lo = timed(mk(fn, lo), x, k)
    t_hi = timed(mk(fn, hi), x, k)
    return max(t_hi - t_lo, 1e-9) / (hi - lo) * 1e3


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    for res, c in SHAPES:
        rng = np.random.default_rng(res)
        x = jnp.asarray(
            rng.standard_normal((batch, res, res, c), np.float32)
        ).astype(jnp.bfloat16)
        k = jnp.asarray(
            rng.standard_normal((3, 3, c, c), np.float32) * 0.05
        ).astype(jnp.bfloat16)

        # correctness on this backend first
        ref = np.asarray(
            jax.jit(stride2_conv_reference)(x, k), np.float32
        )
        poly = np.asarray(
            jax.jit(partial(polyphase_stride2_conv))(x, k), np.float32
        )
        scale = np.abs(ref).max()
        max_rel = np.abs(poly - ref).max() / scale

        legs = {
            "null (slice+mean)": lambda x, k: x[:, 0::2, 0::2, :],
            "stride2": stride2_conv_reference,
            "poly": polyphase_stride2_conv,
            "stride2+gn": lambda x, k: group_norm(
                stride2_conv_reference(x, k)
            ),
            "poly+gn": lambda x, k: group_norm(polyphase_stride2_conv(x, k)),
        }
        times = {name: per_iter_ms(fn, x, k) for name, fn in legs.items()}
        flops = 2.0 * batch * (res // 2) ** 2 * c * 9 * c
        print(f"\n== b{batch} {res}x{res} C{c}  (max rel err {max_rel:.2e})")
        for name, t in times.items():
            note = ""
            if "null" not in name:
                ex_null = max(t - times["null (slice+mean)"], 1e-9)
                eff = flops / (ex_null * 1e-3) / 1e12
                note = f"  ~{eff:6.1f} TF/s ex-null"
            print(f"  {name:18s} {t:7.2f} ms/iter{note}")
        for suffix in ("", "+gn"):
            d = times[f"stride2{suffix}"] - times[f"poly{suffix}"]
            print(
                f"  poly{suffix} saves {d:+.2f} ms/iter "
                f"({times[f'stride2{suffix}']/max(times[f'poly{suffix}'],1e-9):.2f}x)"
            )


if __name__ == "__main__":
    main()
