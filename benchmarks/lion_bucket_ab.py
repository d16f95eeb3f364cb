"""A/B microbench: small-leaf BUCKETING for the fused 8-bit Lion.

The round-3 b16 trace attributed ~219 per-leaf Lion dispatches carrying
only 9% of the optimizer bytes (ROADMAP round-3 item 2): fixed dispatch
overhead dominates those leaves. The bucketed path concatenates all small
leaves (dense rows / transposed blocks) into ONE packed kernel call per
layout — bitwise-identical numerics (tests/test_lion8bit.py).

The trade is explicit: bucketing removes ~O(200) dispatch overheads but
pays concat/split copies of the bucketed grads+updates (~2x 91M elems f32
read+write ~ 1.5 GB extra traffic at SD1.5 scale) plus small scales
relayouts. At the round-3 measured ~150 GB/s effective HBM rate that is
~10 ms of copies vs an estimated 7-11 ms of dispatch overhead — too close
to call from the model, so this script decides the production default
(``lion_bucket_max_nb``) on-chip.

Run from the repo root: ``python benchmarks/lion_bucket_ab.py``.
Same-session relative numbers only (PERF_NOTES.md).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from stable_diffusion_training_tpu.optim.lion8bit import (  # noqa: E402
    scale_by_lion_8bit,
)

# the SD1.5+CLIP small-quantized-leaf population. Layout census over the
# REAL trees (block_size=16, exclusion list ["bias","scale","embedding"]):
# UNet has 280 dense + 2 transposed quantized leaves, CLIP 72 dense + 0 —
# and 196 of the dense leaves are <= 1M elements (91M elems, ~9% of
# optimizer bytes), matching the round-3 trace's ~219 small dispatches.
# So the bucketing win, if any, lives in the DENSE group; the two
# transposed leaves (conv_in/out channel edges) ride along.
SMALL_SHAPES = (
    [(3, 3, 4, 320), (3, 3, 320, 4)]     # the only transposed leaves
    + [(320, 320)] * 60                   # attention q/k/v/out (102k)
    + [(1, 1, 320, 320)] * 12             # proj_in/out 1x1 convs
    + [(640, 640)] * 40
    + [(320, 1280)] * 12                  # time_emb_proj rows
    + [(640, 1280)] * 6
    + [(768, 768)] * 48                   # CLIP attention kernels
    + [(768, 320)] * 18                   # cross-attn k/v projections
)


def build(block_size=16):
    params = {
        f"w{i}": jnp.zeros(s, jnp.float32) for i, s in enumerate(SMALL_SHAPES)
    }
    grads = {
        f"w{i}": jax.random.normal(jax.random.PRNGKey(i), s, jnp.float32)
        for i, s in enumerate(SMALL_SHAPES)
    }
    return params, grads


def bench(bucket_nb: int, steps: int = 30) -> float:
    params, grads = build()
    tx = scale_by_lion_8bit(
        block_size=16,
        excluded_layer_mask=True,
        use_pallas=True,
        bucket_max_nb=bucket_nb,
    )
    state = jax.jit(tx.init)(params)
    update = jax.jit(tx.update, donate_argnums=(1,))
    _, state = update(grads, state)  # compile + warm
    _ = float(jax.tree_util.tree_leaves(state.mu_quant)[0][1].sum())
    t0 = time.perf_counter()
    for _ in range(steps):
        upd, state = update(grads, state)
    _ = float(jax.tree_util.tree_leaves(upd)[0].sum())  # full sync
    return (time.perf_counter() - t0) / steps


def main():
    n = sum(int(np.prod(s)) for s in SMALL_SHAPES)
    print(
        f"device: {jax.devices()[0].device_kind}, "
        f"{len(SMALL_SHAPES)} small leaves, {n/1e6:.1f}M params"
    )
    t_off = bench(0)
    t_on = bench(65536)
    print(f"per-leaf dispatches: {t_off*1e3:8.2f} ms/update")
    print(f"bucketed (one call): {t_on*1e3:8.2f} ms/update  "
          f"({t_on/t_off:.2f}x)")
    print("-> default bucket_max_nb should be "
          + ("65536 (keep)" if t_on <= t_off else "0 (DISABLE: regression)"))


if __name__ == "__main__":
    main()
