"""A/B microbench: jnp (XLA-fused) vs Pallas fused 8-bit Lion update on the
current default device, at SD1.5-ish parameter scale.

Run from the repo root: ``python benchmarks/lion_ab.py``. Same-session
relative numbers only (PERF_NOTES.md: this rig's absolute throughput varies
between sessions). Informs the ``use_pallas`` auto default for
``optim.lion8bit`` at the config's ``block_size=16``.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from stable_diffusion_training_tpu.optim.lion8bit import scale_by_lion_8bit  # noqa: E402

SHAPES = [  # a representative slice of SD1.5 UNet leaves (~104M params)
    (1280, 1280, 3, 3),
    (1280, 1280, 3, 3),
    (640, 640, 3, 3),
    (1280, 1280),
    (1280, 5120),
    (5120, 1280),
    (320, 320, 3, 3),
    (768, 1280),
]


def bench(use_pallas: bool, block_size: int, steps: int = 20) -> float:
    params = {
        f"w{i}": jnp.zeros(s, jnp.float32) * 0 for i, s in enumerate(SHAPES)
    }
    grads = {
        f"w{i}": jax.random.normal(jax.random.PRNGKey(i), s, jnp.float32)
        for i, s in enumerate(SHAPES)
    }
    tx = scale_by_lion_8bit(
        block_size=block_size, excluded_layer_mask=True, use_pallas=use_pallas
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
    n = sum(int(np.prod(s)) for s in SHAPES)
    print(f"device: {jax.devices()[0].device_kind}, params: {n/1e6:.1f}M")
    for bs in (16, 64, 128):
        t_jnp = bench(False, bs)
        t_pal = bench(True, bs)
        print(
            f"block_size={bs:4d}: jnp {t_jnp*1e3:7.2f} ms  "
            f"pallas {t_pal*1e3:7.2f} ms  (pallas/jnp {t_pal/t_jnp:.2f}x)"
        )


if __name__ == "__main__":
    main()
