"""On-chip test of the head_dim-40 MXU-padding hypothesis (VERDICT r3 #2).

SD1.5 attention runs d_head=40 (320ch / 8 heads). The MXU contracts in
128-deep passes, so QK^T at d=40 uses 40/128 of each pass — the round-3
flash sweep plateaued at ~31% of the matmul roofline and attributed it to
this padding. The proposed fix was "pack 3 heads into 120 lanes".

Tile-model analysis says packing CANNOT win:
- QK^T: the logits tensor has h*sq*sk elements; every MXU output tile is
  (8 sublanes x 128 lanes) and needs ceil(d/128)=1 depth pass whether d is
  40 or 128. Lower bound = h*sq*sk/1024 tile-ops. Block-diagonal packing
  (q rows carry 3 heads' 120 lanes, K expanded block-diagonally to
  (120, 3*sk)) produces sq x 3sk outputs in 1 pass each = the SAME tile
  count; the zero blocks are multiplied anyway.
- PV: output (sq, 40) pads lanes 40->128 (1 col tile), with sk/128 depth
  passes; packing 3 heads' V block-diagonally to (3sk, 120) gives 1 col
  tile x 3sk/128 passes = again the same count.
So the kernel's pass count is fixed by the LOGITS AREA, not by d, and
d=40's "31% MFU" is a true hardware floor for this shape family; the only
real lever is reducing sq*sk work (sparsity — out of scope for numerics
parity).

This script is the empirical arbiter, run on the REAL Pallas flash kernel
(raw ``jax.lax.dot`` probes are useless here: XLA pushes the consuming
slice through the dot and DCEs the matmul — a first draft of this script
measured 0.4-1.3 "TF/s" flat across d, i.e. pure dispatch overhead).
Method: time ``flash_attention`` forward at (H=3, D=40) vs (H=3, D=128) —
identical logits area, identical predicted MXU pass count, only the
contraction/lane padding differs. Chaining feeds each iteration's output
back as the next query, so every step's full output is live (no DCE) with
no host round-trip between reps.

Decision rule:
- time(d=40) ~= time(d=128)  -> passes are the cost, padding is the floor,
  packing cannot help (it cannot reduce passes): negative result stands.
- time(d=40) << time(d=128) (toward the 40/128 useful-FLOPs ratio) -> the
  pad lanes are NOT being paid for, so a 3-head/120-lane packed variant
  could recover up to 3x: build it.

Run from the repo root on TPU: ``python benchmarks/headdim_pack_ab.py``.
Same-session relative numbers only (PERF_NOTES.md).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stable_diffusion_training_tpu.ops.flash_attention import (  # noqa: E402
    flash_attention,
)

B = 1
SQ = 4096  # 512² latents -> 64² spatial tokens
H = 3
REPS = 8  # chain length per dispatch (relay punishes short dispatches)


def flash_fwd_time(d: int, iters: int = 5) -> float:
    """Median-of-best time per flash forward at (B, SQ, H, d)."""
    k0 = jax.random.PRNGKey(d)
    kq, kk, kv = jax.random.split(k0, 3)
    q = jax.random.normal(kq, (B, SQ, H, d), jnp.bfloat16)
    k = jax.random.normal(kk, (B, SQ, H, d), jnp.bfloat16)
    v = jax.random.normal(kv, (B, SQ, H, d), jnp.bfloat16)

    @jax.jit
    def chain(q, k, v):
        # output feeds the next query: full output of every rep is live,
        # so nothing can be sliced away or reordered out of the timing
        def body(_, q):
            return flash_attention(q, k, v).astype(q.dtype)

        return jax.lax.fori_loop(0, REPS, body, q)

    out = chain(q, k, v)
    _ = float(jnp.sum(out[:, :1, :1, :1].astype(jnp.float32)))  # compile+sync
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = chain(q, k, v)
        _ = float(jnp.sum(out[:, :1, :1, :1].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best / REPS


def main():
    print(
        f"device: {jax.devices()[0].device_kind}, flash fwd, "
        f"B={B} SQ=SK={SQ} H={H}, bf16, chained x{REPS} (output->next query)"
    )
    results = {}
    for d in (40, 64, 128):
        t = flash_fwd_time(d)
        # useful FLOPs: 2*sq*sk*d (QK^T) + 2*sq*sk*d (PV) per head
        useful = 4 * B * H * SQ * SQ * d
        results[d] = t
        print(
            f"d={d:<4}: {t * 1e3:7.3f} ms   "
            f"({useful / t / 1e12:6.1f} TF/s useful, "
            f"{useful * 128 / d / t / 1e12:6.1f} TF/s incl. pad lanes)"
        )
    t40, t128 = results[40], results[128]
    if t40 < 0.8 * t128:
        print(
            f"-> d=40 is {t128 / t40:.2f}x faster than d=128 at equal logits "
            "area: the pad lanes are not fully paid for; a 3-head/120-lane "
            "packed kernel variant could win — build and A/B it"
        )
    else:
        print(
            f"-> time(d=40) = {t40 / t128:.2f}x time(d=128) at equal logits "
            "area: pass count (logits area), not useful FLOPs, sets the "
            "time; lane padding is a hardware floor at this shape and head "
            "packing cannot reduce tile count (negative result confirmed)"
        )


if __name__ == "__main__":
    main()
