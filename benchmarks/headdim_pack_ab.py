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
  passes; packing 3 heads' V to (3sk, 120) gives 1 col tile x 3sk/128
  passes = again the same count.
So d=40's "31% MFU" is a true hardware floor for this shape family; the
only real lever is reducing sq*sk work (sparsity — out of scope for
numerics parity).

This script is the empirical arbiter: if measured time(d=40) is materially
LESS than time(d=128) for equal output area, the padded pass is cheaper
than the model claims and a packed kernel variant is worth building; if
equal (predicted), the plateau is confirmed as hardware and the negative
result stands recorded.

Run from the repo root on TPU: ``python benchmarks/headdim_pack_ab.py``.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SQ = SK = 4096
REPS = 8  # chain length per dispatch (relay punishes short dispatches)


def _bench(fn, *args, iters=5):
    out = fn(*args)
    _ = float(jnp.sum(out[0][:1, :1].astype(jnp.float32)))  # compile+sync
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(out[0][:1, :1].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best / REPS


def qk_time(d: int):
    """(SQ, d) @ (d, SK) chained REPS times — one head's logits pass."""
    q = jnp.ones((SQ, d), jnp.bfloat16)
    k = jnp.ones((d, SK), jnp.bfloat16)

    @jax.jit
    def chain(q, k):
        def body(_, acc):
            s = jax.lax.dot(q, k, precision=jax.lax.Precision.DEFAULT)
            return acc + s[:1, :1].astype(jnp.float32)

        return jax.lax.fori_loop(
            0, REPS, body, jnp.zeros((1, 1), jnp.float32)
        ), q

    return _bench(chain, q, k)


def qk_packed_time():
    """Block-diagonal 3-head pack: (SQ, 120) @ (120, 3*SK) — produces the
    3 heads' logits in one matmul (useful blocks on the diagonal)."""
    q = jnp.ones((SQ, 120), jnp.bfloat16)
    kbd = jnp.ones((120, 3 * SK), jnp.bfloat16)

    @jax.jit
    def chain(q, kbd):
        def body(_, acc):
            s = jax.lax.dot(q, kbd)
            return acc + s[:1, :1].astype(jnp.float32)

        return jax.lax.fori_loop(
            0, REPS, body, jnp.zeros((1, 1), jnp.float32)
        ), q

    return _bench(chain, q, kbd) / 3.0  # per head


def pv_time(d: int):
    """(SQ, SK) @ (SK, d) — one head's PV pass (lane-padded output)."""
    p = jnp.ones((SQ, SK), jnp.bfloat16)
    v = jnp.ones((SK, d), jnp.bfloat16)

    @jax.jit
    def chain(p, v):
        def body(_, acc):
            o = jax.lax.dot(p, v)
            return acc + o[:1, :1].astype(jnp.float32)

        return jax.lax.fori_loop(
            0, REPS, body, jnp.zeros((1, 1), jnp.float32)
        ), p

    return _bench(chain, p, v)


def main():
    print(f"device: {jax.devices()[0].device_kind}, "
          f"sq=sk={SQ}, bf16, per-matmul times (chained x{REPS})")
    t40 = qk_time(40)
    t64 = qk_time(64)
    t128 = qk_time(128)
    tpk = qk_packed_time()
    print(f"QK^T d=40  : {t40*1e3:7.3f} ms   ({2*SQ*SK*40/t40/1e12:6.1f} TF/s useful)")
    print(f"QK^T d=64  : {t64*1e3:7.3f} ms   ({2*SQ*SK*64/t64/1e12:6.1f} TF/s useful)")
    print(f"QK^T d=128 : {t128*1e3:7.3f} ms   ({2*SQ*SK*128/t128/1e12:6.1f} TF/s useful)")
    print(f"QK^T 3-head block-diag pack, per head: {tpk*1e3:7.3f} ms")
    pv40 = pv_time(40)
    pv128 = pv_time(128)
    print(f"PV   d=40  : {pv40*1e3:7.3f} ms")
    print(f"PV   d=128 : {pv128*1e3:7.3f} ms")
    if t40 < 0.8 * t128:
        print("-> d=40 pass IS cheaper than d=128: packing could win; "
              "build the packed flash variant")
    else:
        print("-> time(d=40) ~= time(d=128): depth padding is a hardware "
              "floor at this shape; head packing cannot reduce tile count "
              "(negative result confirmed)")


if __name__ == "__main__":
    main()
