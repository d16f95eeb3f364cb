"""8-bit block-quantized Lion optimizer (optax GradientTransformation).

Numerics parity with ``/root/reference/lion_quant.py``:

- momentum leaves selected by ``quantize_mask`` are stored as a tuple
  ``(int8_codes, inv_absmax_scales)`` (detection: leaf is a tuple, L94-95);
- signed 5th-power companding quantizer with zero-crossing offset
  ``3.7398995e-09`` (L49-64): q = round(sign(x+off) * |x+off|^(1/5) * 127);
- blockwise scaling: flat reshape to (-1, block_size), per-block
  scales = 1/absmax with a zero guard, multiply before quantizing (L66-92) —
  parameter sizes must therefore be divisible by ``block_size``;
- Lion update: sign((1-b1) g + b1 dequant(mu)); new momentum
  quant((1-b2) g + b2 dequant(mu)) (L133-154);
- ``lion_8bit`` chains the transform with ``add_decayed_weights`` and the
  (negated) learning rate (L201-211). Default ``block_size`` differs between
  the two entry points on purpose (16 vs 64), matching the reference.

State layout is per-leaf, chosen for TPU DMA density (the reference's
logical view is ``(n_blocks, block_size)``; values are identical under
either relayout, parity-tested — use ``momentum_to_reference_layout`` to
compare):

- **dense** (leaves whose size is a multiple of 1024, with ``block_size``
  in {8,16}): int8 codes are the parameter's own ``(size/128, 128)``
  flat bitcast view — a quantization block is ``block_size`` consecutive
  LANES of one row, so block membership matches the reference flat
  blocking bit-for-bit — and scales are stored tile-grouped
  (``_scales_flat_to_dense``: shape ``(gpr * x/r, r)``, every kernel
  tile's scales a full-lane-width contiguous block).
  The fused kernel (``ops.lion_kernel.fused_lion8bit_update_dense``)
  consumes grads and emits updates in the parameter's natural layout:
  zero XLA transpose copies (the round-3 trace measured ~103 ms/step of
  them around the transposed layout below).
- **transposed** (all other quantized leaves): codes ``(block_size,
  n_blocks)``, scales ``(1, n_blocks)`` — block dim on VPU sublanes,
  block index on lanes. Still 3.0x faster than the narrow ``(rows, bs)``
  layout (which pads 16/128 lanes, measured as the single largest
  train-step sink, 430 ms/step, in the first round-3 xprof trace).
"""

import functools
from typing import Any, Callable, NamedTuple, Optional, Union

import chex
import jax
import jax.numpy as jnp
import optax

# offset ensuring x=0 round-trips to exactly 0 through the odd-power compander
_ZERO_CROSSING_OFFSET = 3.7398995e-09


class ScaleBy8bitLionState(NamedTuple):
    """Lion state: step count, quantized momentum tree, per-leaf quantize flags."""

    count: chex.Array
    mu_quant: chex.Array  # pytree; quantized leaves are (int8, scales) tuples
    mu_quant_flag: chex.Array


def _is_quantized(node) -> bool:
    return isinstance(node, tuple)


def _dense_ok(size: int, block_size: int) -> bool:
    """Dense-layout eligibility (re-exported as
    ``ops.lion_kernel.dense_layout_ok``): the flat leaf must bitcast-view
    as ``(size/128, 128)`` whole 8-row sublane tiles, and blocks must be
    whole lane groups with >=8 groups per row (the scales tile's sublane
    dim must satisfy Mosaic's divisible-by-8 block rule)."""
    return size % 1024 == 0 and block_size in (8, 16)


def dense_tile_rows(x: int, cap: int = 1024, divisor: int = 1) -> int:
    """Canonical dense-kernel tile height for a leaf with ``x = size/128``
    rows: the largest multiple-of-8 divisor of ``x`` that is <= cap. Also
    fixes the dense scales storage shape, so it must stay deterministic.

    ``divisor`` > 1 (the FSDP axis size at state-build time) additionally
    requires ``r`` to divide ``x/divisor`` when it can, so an even dim-0
    shard boundary always lands on a whole scales tile — the alignment the
    shard_map'd fused kernel needs (``fsdp_dense_eligible``). Leaves whose
    ``x`` the divisor doesn't divide keep the canonical grouping."""
    if divisor > 1 and x % divisor == 0:
        return dense_tile_rows(x // divisor, cap)
    best = 8
    for k in range(1, cap // 8 + 1):
        r = 8 * k
        if r > cap:
            break
        if x % r == 0:
            best = r
    return best


def _momentum_layout(codes, scales) -> str:
    """Classify a quantized momentum leaf's storage layout by its scales
    shape (the codes shape can be ambiguous between layouts):

    - ``"transposed"``: scales ``(1, nb)``, codes ``(block_size, nb)``;
    - ``"narrow"``: the LEGACY reference-order storage — scales
      ``(nb > 1, 1)``, codes ``(nb, block_size)`` (the reference's own
      view, ``/root/reference/lion_quant.py:66-92``); only appears in
      old full-state checkpoints, migrated on restore;
    - ``"dense"``: scales tile-grouped ``(gpr*x/r, r)`` with both dims
      >= 8 (``r = dense_tile_rows(x)`` is a multiple of 8 and
      ``gpr*x/r >= gpr >= 8``), codes ``(size/128, 128)``.

    A single-block leaf has ``(1, 1)`` scales in BOTH non-dense layouts;
    the codes shape disambiguates (narrow ``(1, bs)`` vs transposed
    ``(bs, 1)``)."""
    if scales.shape == (1, 1):
        return (
            "narrow"
            if codes.shape[0] == 1 and codes.shape[1] > 1
            else "transposed"
        )
    if scales.shape[0] == 1:
        return "transposed"
    if scales.shape[1] == 1:
        return "narrow"
    return "dense"


def _is_dense(codes, scales) -> bool:
    """True for the dense layout. Both non-dense layouts have a size-1
    scales dim (transposed ``(1, nb)``; legacy narrow ``(nb, 1)``) — a
    bare ``shape[0] != 1`` check would misclassify narrow as dense."""
    return _momentum_layout(codes, scales) == "dense"


def _scales_flat_to_dense(scales_flat, x: int, gpr: int, r: Optional[int] = None):
    """Flat per-block scales ``(nb,)`` -> tile-grouped dense storage
    ``(gpr * x/r, r)``: row ``t*gpr + j``, lane ``c`` holds the scale of
    block ``(t*r + c) * gpr + j`` (dense row ``t*r + c``, lane group j).
    Grouping by kernel tile keeps every scales block full-lane-width,
    which Mosaic requires of non-terminal block dims."""
    if r is None:
        r = dense_tile_rows(x)
    return (
        scales_flat.reshape(x // r, r, gpr)
        .transpose(0, 2, 1)
        .reshape(gpr * x // r, r)
    )


def _scales_dense_to_flat(scales_d, x: int):
    """Inverse of ``_scales_flat_to_dense``."""
    rows, r = scales_d.shape
    gpr = rows * r // x
    return (
        scales_d.reshape(x // r, gpr, r)
        .transpose(0, 2, 1)
        .reshape(-1)
    )


# FSDP mesh context for the fused Pallas Lion (set by train.states when
# states are placed FSDP-sharded, mirroring ops.attention.set_attention_mesh):
# the Pallas kernel is a custom call with no GSPMD partitioning rule, so on
# an fsdp-sharded mesh it must run inside jax.shard_map on each device's
# local shard. The dense layout makes that shard LOCAL-VALID: codes are the
# param's own flat view, so a dim-0 param shard is a contiguous row range of
# the codes, and (with tile-aligned boundaries, see fsdp_dense_eligible) the
# tile-grouped scales shard to the matching contiguous row range — each
# device's (codes, scales) shard is itself a well-formed dense layout for
# its local rows, consumed by the unmodified kernel with zero collectives.
_LION_FSDP_MESH = None  # (mesh, axis_name) | None


def _mesh_axis_size(mesh, axis: str) -> int:
    return dict(mesh.shape).get(axis, 1)


def set_lion_fsdp_mesh(mesh, axis: str = "fsdp") -> None:
    """Register (or clear, with ``mesh=None``) the mesh context that routes
    eligible quantized leaves through the shard_map'd fused dense kernel.

    The registration is read ONCE, when ``scale_by_lion_8bit`` is
    constructed — building another state later (with a different or no
    mesh) cannot silently flip an existing transform's dispatch."""
    global _LION_FSDP_MESH
    if mesh is None or _mesh_axis_size(mesh, axis) <= 1:
        _LION_FSDP_MESH = None
    else:
        _LION_FSDP_MESH = (mesh, axis)


# TP mesh context (set by train.states for tensor-parallel runs WITHOUT
# fsdp momentum sharding). Under TP the quantized momentum is replicated
# (parallel.sharding.train_state_tp_sharding: only params carry Megatron
# specs), so producing the replicated new momentum forces GSPMD to gather
# each Megatron-sharded grad leaf no matter which math computes the update.
# That makes an ALL-REPLICATED shard_map around the unmodified fused kernels
# collective-neutral with the jnp path (replicated leaves: zero collectives;
# Megatron leaves: the same inherent gather) while keeping the single-pass
# Pallas update — so, unlike FSDP, no per-leaf shape eligibility is needed
# and every quantized leaf (dense, transposed, bucketed) stays fused.
_LION_TP_MESH = None  # Mesh | None


def set_lion_tp_mesh(mesh) -> None:
    """Register (or clear, with ``mesh=None``) the tensor-parallel mesh that
    wraps the fused kernels in an all-replicated ``shard_map``. Read ONCE at
    ``scale_by_lion_8bit`` construction, like ``set_lion_fsdp_mesh``."""
    global _LION_TP_MESH
    _LION_TP_MESH = mesh


def fsdp_dense_eligible(param_shape, codes_shape, scales_shape, k: int) -> bool:
    """True when a dense-layout quantized leaf can run the fused kernel
    shard_map'd over an fsdp axis of size ``k`` with dim-0 sharding on
    param/grad, codes, and scales — all purely static shape checks:

    - the param's dim 0 splits evenly and meaningfully (``% k == 0``,
      ``>= 2k`` — mirroring ``parallel.sharding``'s divisibility rule), so
      a shard is a contiguous flat range;
    - each shard is a whole number of 128-lane code rows;
    - shard boundaries land on whole scales tiles (``x_local % r == 0``),
      so the dim-0 scales shard is the matching tile-grouped storage.

    Used by BOTH the sharding rule (``parallel.sharding.
    train_state_fsdp_sharding``) and the optimizer's update dispatch, so
    placement and execution can never disagree."""
    if k <= 1 or not param_shape:
        return False
    if len(codes_shape) != 2 or codes_shape[1] != 128:
        return False  # not the dense layout
    d0 = param_shape[0]
    if d0 % k or d0 < 2 * k:
        return False
    rest = 1
    for s in param_shape[1:]:
        rest *= s
    n_local = (d0 // k) * rest
    if n_local % 128:
        return False
    srows, r = scales_shape
    if srows == 1 or r == 1:
        return False  # transposed / narrow layouts
    x_local = n_local // 128
    if x_local % r or srows % k:
        return False
    return True


def momentum_to_reference_layout(node):
    """Map a quantized momentum leaf (any layout) to the reference's
    ``(n_blocks, block_size)`` codes + ``(n_blocks, 1)`` scales view."""
    codes, scales = node
    layout = _momentum_layout(codes, scales)
    if layout == "dense":
        x = codes.shape[0]
        nb = scales.size
        bs = codes.size // nb
        return (
            codes.reshape(-1, bs),
            _scales_dense_to_flat(scales, x).reshape(-1, 1),
        )
    if layout == "narrow":
        return node  # legacy narrow storage IS the reference view
    return (jnp.transpose(codes), jnp.transpose(scales))


def scale_by_lion_8bit(
    b1: float = 0.9,
    b2: float = 0.99,
    mu_scale_dtype: Optional[chex.ArrayDType] = None,
    block_size: Optional[int] = 16,
    excluded_layer_mask: Optional[Any] = None,
    use_pallas: Optional[bool] = None,
    dense_fsdp_factor: int = 1,
    bucket_max_nb: int = 0,
    compander: str = "exact",
    momentum_layout: str = "auto",
) -> optax.GradientTransformation:
    """Lion update direction with int8 block-quantized momentum.

    ``excluded_layer_mask``: boolean pytree (or prefix); True leaves get
    quantized momentum, False leaves keep a dense momentum in
    ``mu_scale_dtype``.

    ``use_pallas``: route quantized leaves through the fused single-pass
    Pallas kernel (``ops.lion_kernel``; identical numerics). ``None`` = auto
    (on when the default backend is TPU).

    ``dense_fsdp_factor``: the fsdp mesh-axis size the states will be
    sharded over (1 = no FSDP). Dense scales tiles are sized so even dim-0
    shard boundaries land on whole tiles (``dense_tile_rows`` divisor) —
    required for the shard_map'd fused kernel under FSDP. A pure storage
    re-grouping: values and block membership are unchanged.

    ``bucket_max_nb``: quantized leaves with at most this many quantization
    blocks are concatenated into ONE fused kernel dispatch per layout
    instead of one per leaf (the round-3 trace counted ~219 small-leaf
    dispatches carrying only 9% of the optimizer bytes); 0 disables.
    Bitwise-identical either way — block membership is per-leaf and
    unchanged by the concat, and scales move through exact relayouts.
    The on-chip A/B (benchmarks/lion_bucket_ab.py, v5e 2026-08-18) measured
    bucketing 2.1x faster on the isolated small-leaf population
    (27.3 -> 13.0 ms/update) and -9 ms/step at the SD1.5-512 headline —
    the concat/split copies cost less than the ~200 saved dispatch
    overheads, so the production default (TrainingConfig.lion_bucket_max_nb)
    is 65536 (bucket leaves <= 1M elements).

    ``compander``: ``"exact"`` (default) reproduces the reference's
    5th-power compander op-for-op (``/root/reference/lion_quant.py:49-92``,
    bitwise vs the unmodified reference source). ``"fast"`` is an opt-in
    reassociation of the SAME math with fewer full-width VPU ops — the
    ``/127`` folded into one ``127^-5`` constant on the 5th power and the
    full-width divide by the stored inverse-absmax scales replaced by a
    multiply with a reciprocal taken on the 16x-smaller scales array —
    applied identically in the Pallas kernels and this jnp path (update
    signs and requantized codes stay bitwise pallas==jnp within the fast
    mode; scales agree to ulp-level rounding, the same caveat the exact
    mode's interpret parity carries), but NOT bitwise vs "exact":
    elementwise values differ by rounding (ulps). Training equivalence is
    covered by the fast-vs-exact golden loss-curve test; the on-chip win
    is recorded in PERF_NOTES (round-5 Lion op-count surgery).
    """
    if compander not in ("exact", "fast"):
        raise ValueError(
            f"unknown compander {compander!r}; use 'exact' or 'fast'"
        )
    fast = compander == "fast"
    # momentum_layout="reference": store EVERY quantized leaf in the
    # reference's own order — codes ``(n_blocks, block_size)``, scales
    # ``(n_blocks, 1)`` (/root/reference/lion_quant.py:66-92) — and keep it
    # through requantization. This is the STRICT-FAITHFUL benchmark anchor
    # (bench.py's ref-strict leg): it measures the reference's actual
    # storage layout, without the framework's dense/transposed relayout
    # optimization the default anchor inherits. jnp path only.
    if momentum_layout not in ("auto", "reference"):
        raise ValueError(
            f"unknown momentum_layout {momentum_layout!r}; "
            "use 'auto' or 'reference'"
        )
    reference_layout = momentum_layout == "reference"
    if reference_layout and (use_pallas or fast):
        raise ValueError(
            "momentum_layout='reference' is the strict-faithful anchor: "
            "jnp path with the exact compander only"
        )
    if reference_layout:
        use_pallas = False  # None would resolve to the Pallas path on TPU
    mu_scale_dtype = jax.dtypes.canonicalize_dtype(mu_scale_dtype)
    # mesh dispatch contexts, captured at CONSTRUCTION (see
    # set_lion_fsdp_mesh / set_lion_tp_mesh); mutually exclusive by
    # train.states' routing — tp+fsdp runs register the FSDP context only
    # (momentum is fsdp-sharded, so the dim-0 shard_map dispatch applies
    # unchanged; the Megatron grad reshard at its boundary is inherent)
    fsdp_ctx = _LION_FSDP_MESH
    tp_ctx = _LION_TP_MESH
    assert fsdp_ctx is None or tp_ctx is None, (
        "set_lion_fsdp_mesh and set_lion_tp_mesh are mutually exclusive"
    )

    def _quantize(x: chex.Array) -> chex.Array:
        shifted = x + _ZERO_CROSSING_OFFSET
        sign = jnp.sign(shifted)
        code = jnp.power(jnp.abs(shifted), 1 / 5) * sign * 127
        return jnp.round(code).astype(jnp.int8)

    def _dequantize(q: chex.Array) -> chex.Array:
        return ((q / 127) ** 5).astype(mu_scale_dtype) - _ZERO_CROSSING_OFFSET

    def _block_quantize(
        leaf: chex.Array,
        dense: Optional[bool] = None,
        dense_r: Optional[int] = None,
    ):
        # requantization must stay in the layout the incoming state uses
        # (update_fn passes it, incl. the storage's own tile height so a
        # non-canonical FSDP-aligned grouping round-trips shape-stable);
        # init-time callers omit them -> predicate + build-time grouping
        if reference_layout:
            dense = False
        elif dense is None:
            dense = _dense_ok(leaf.size, block_size)
        if dense:
            # dense: codes (size/128, 128), scales tile-grouped (see
            # _scales_flat_to_dense)
            gpr = 128 // block_size
            blocks = leaf.reshape(-1, block_size)  # (nb, bs) flat blocks
            absmax = jnp.max(jnp.abs(blocks), axis=1)
            scales = 1 / jnp.where(
                absmax <= 0.0,
                jnp.ones_like(absmax, dtype=mu_scale_dtype),
                absmax,
            )
            codes = _quantize(blocks * scales[:, None]).reshape(-1, 128)
            if dense_r is None:
                dense_r = dense_tile_rows(
                    leaf.size // 128, divisor=dense_fsdp_factor
                )
            return codes, _scales_flat_to_dense(
                scales, leaf.size // 128, gpr, r=dense_r
            )
        if reference_layout:
            # reference order: codes (n_blocks, block_size), scales
            # (n_blocks, 1) — lion_quant.py:66-92 verbatim semantics
            blocks = leaf.reshape(-1, block_size)
            absmax = jnp.max(jnp.abs(blocks), axis=1, keepdims=True)
            scales = 1 / jnp.where(
                absmax <= 0.0,
                jnp.ones_like(absmax, dtype=mu_scale_dtype),
                absmax,
            )
            return _quantize(blocks * scales), scales
        # block-transposed: (block_size, n_blocks), scales (1, n_blocks)
        blocks = leaf.reshape(-1, block_size).T
        absmax = jnp.max(jnp.abs(blocks), axis=0, keepdims=True)
        # inverse scales with zero-block guard (divide-by-zero -> scale 1)
        scales = 1 / jnp.where(
            absmax <= 0.0, jnp.ones_like(absmax, dtype=mu_scale_dtype), absmax
        )
        return _quantize(blocks * scales), scales

    def _block_dequantize(shape_struct, codes: chex.Array, scales: chex.Array):
        if fast:
            # same reassociated op sequence as ops.lion_kernel's fast
            # kernels (folded 127^-5, multiply by reciprocal scales) so
            # pallas==jnp parity holds bitwise within the fast mode
            from ..ops.lion_kernel import _dequantize_fast

            if _is_dense(codes, scales):
                nb = scales.size
                bs = codes.size // nb
                scales_flat = _scales_dense_to_flat(scales, codes.shape[0])
                blocks = _dequantize_fast(
                    codes.reshape(-1, bs), (1.0 / scales_flat)[:, None]
                ).astype(mu_scale_dtype)
                return blocks.reshape(shape_struct.shape)
            if _momentum_layout(codes, scales) == "narrow":
                # construction already rejects fast+reference layout, and
                # restore migrates narrow checkpoints before any update —
                # but falling through to the transposed branch would
                # SILENTLY scramble every momentum value, so fail loudly
                # if a narrow leaf ever reaches the fast path
                raise ValueError(
                    "lion_compander='fast' cannot consume the reference "
                    "narrow (n_blocks, block_size) momentum layout; migrate "
                    "the state or use the exact compander"
                )
            blocks = _dequantize_fast(codes, 1.0 / scales).astype(
                mu_scale_dtype
            )
            return blocks.T.reshape(shape_struct.shape)
        if _is_dense(codes, scales):
            nb = scales.size
            bs = codes.size // nb
            scales_flat = _scales_dense_to_flat(scales, codes.shape[0])
            blocks = _dequantize(codes.reshape(-1, bs)) / scales_flat[:, None]
            return blocks.reshape(shape_struct.shape)
        if _momentum_layout(codes, scales) == "narrow":
            # reference order (momentum_layout="reference" / legacy
            # checkpoints): (n_blocks, block_size) / (n_blocks, 1)
            blocks = _dequantize(codes) / scales
            return blocks.reshape(shape_struct.shape)
        blocks = _dequantize(codes) / scales  # (block_size, n_blocks)
        return blocks.T.reshape(shape_struct.shape)

    def _shape_tree(tree):
        return jax.tree.map(lambda x: jax.eval_shape(lambda y: y, x), tree)

    def init_fn(params):
        # allow a plain bool as a broadcast-to-all-leaves mask
        mask = excluded_layer_mask
        if isinstance(mask, bool) or mask is None:
            flag_value = bool(mask)
            mask = jax.tree_util.tree_map(lambda _: flag_value, params)

        # quantized zero momentum is a constant: every block quantizes to
        # _quantize(0) (code 3 via the zero-crossing offset) with the
        # absmax<=0 guard scale of 1 — identical to _block_quantize(zeros)
        # element-for-element, but O(1) to build instead of minutes of XLA
        # constant-folding the compander over 10^8-element zero trees
        zero_code = _quantize(jnp.zeros((), jnp.float32))

        def _init_leaf(_path, leaf, flag):
            if not flag:
                return jnp.zeros_like(leaf, dtype=mu_scale_dtype)
            if leaf.size % block_size:
                # same loud failure as the reference's reshape(-1, block_size)
                raise TypeError(
                    f"parameter at {_path} has {leaf.size} elements, not "
                    f"divisible by block_size={block_size}; add it to the "
                    "quantization exclusion list"
                )
            n_blocks = leaf.size // block_size
            if reference_layout:
                return (
                    jnp.full((n_blocks, block_size), zero_code, jnp.int8),
                    jnp.ones((n_blocks, 1), mu_scale_dtype),
                )
            if _dense_ok(leaf.size, block_size):
                x = leaf.size // 128
                gpr = 128 // block_size
                r = dense_tile_rows(x, divisor=dense_fsdp_factor)
                return (
                    jnp.full((x, 128), zero_code, jnp.int8),
                    jnp.ones((gpr * x // r, r), mu_scale_dtype),
                )
            return (
                jnp.full((block_size, n_blocks), zero_code, jnp.int8),
                jnp.ones((1, n_blocks), mu_scale_dtype),
            )

        mu_quant = jax.tree_util.tree_map_with_path(_init_leaf, params, mask)
        return ScaleBy8bitLionState(
            count=jnp.zeros([], jnp.int32),
            mu_quant=mu_quant,
            mu_quant_flag=mask,
        )

    def _lion_core(g, mu):
        """Update direction + new momentum for one leaf. The fast
        compander keeps these exact two-multiply lerps: the shared-lerp
        rewrite ``g + b2*(mu - g)`` cancels catastrophically for fresh
        momentum (|mu| << |g|, b2=0.99) — see the negative-result note in
        ops.lion_kernel."""
        return (
            jnp.sign((1.0 - b1) * g + b1 * mu),
            (1 - b2) * g + b2 * mu,
        )

    def _jnp_leaf(g, m, shape):
        """One leaf of the jnp (XLA-fused, GSPMD-partitionable) update:
        returns (update_direction, new_momentum)."""
        if not _is_quantized(m):
            return _lion_core(g, m)
        dense = _is_dense(*m)
        mu = _block_dequantize(shape, *m)
        upd, mu_new = _lion_core(g, mu)
        new_m = _block_quantize(
            mu_new,
            dense=dense,
            dense_r=m[1].shape[1] if dense else None,
        )
        return upd, new_m

    def update_fn(updates, state, params=None):
        del params
        shapes = _shape_tree(updates)
        pallas = use_pallas
        if pallas is None:
            pallas = jax.default_backend() == "tpu"

        if pallas:
            from ..ops.lion_kernel import (
                fused_lion8bit_update_dense,
                fused_lion8bit_update_transposed,
                fused_lion8bit_update_transposed_packed,
            )

            if tp_ctx is not None:
                # TP mesh: the Pallas custom calls have no GSPMD partitioning
                # rule, so run them inside an all-replicated shard_map — each
                # device updates the full (replicated) momentum locally. See
                # the _LION_TP_MESH comment for why this is collective-neutral
                # with the jnp path under TP.
                from jax.sharding import PartitionSpec as _P

                def _replicated_on_mesh(fn):
                    @functools.wraps(fn)
                    def call(g, codes, scales, **kw):
                        return jax.shard_map(
                            functools.partial(fn, **kw),
                            mesh=tp_ctx,
                            in_specs=(_P(), _P(), _P()),
                            out_specs=(_P(), _P(), _P()),
                            # pallas_call out_shapes carry no varying-mesh-
                            # axes info (same as the FSDP wrapper)
                            check_vma=False,
                        )(g, codes, scales)

                    return call

                fused_lion8bit_update_dense = _replicated_on_mesh(
                    fused_lion8bit_update_dense
                )
                fused_lion8bit_update_transposed = _replicated_on_mesh(
                    fused_lion8bit_update_transposed
                )
                fused_lion8bit_update_transposed_packed = _replicated_on_mesh(
                    fused_lion8bit_update_transposed_packed
                )

            def _fused_fsdp_dense(g, codes, scales, mesh, axis):
                # each device's dim-0 shard is itself a valid dense layout
                # (see set_lion_fsdp_mesh) -> run the unmodified kernel on
                # the local block inside shard_map: zero collectives
                from jax.sharding import PartitionSpec as P

                gspec = P(axis, *([None] * (g.ndim - 1)))
                mspec = P(axis, None)
                local = functools.partial(
                    fused_lion8bit_update_dense,
                    b1=b1, b2=b2, mu_scale_dtype=mu_scale_dtype,
                    compander=compander,
                )
                upd, new_codes, new_scales = jax.shard_map(
                    local,
                    mesh=mesh,
                    in_specs=(gspec, mspec, mspec),
                    out_specs=(gspec, mspec, mspec),
                    # pallas_call out_shapes carry no varying-mesh-axes info
                    check_vma=False,
                )(g, codes, scales)
                return upd, (new_codes, new_scales)

            def _fused(g, m, shape):
                if not _is_quantized(m):
                    return _lion_core(g, m)
                codes, scales = m
                if fsdp_ctx is not None:
                    mesh, axis = fsdp_ctx
                    k = _mesh_axis_size(mesh, axis)
                    if fsdp_dense_eligible(
                        g.shape, codes.shape, scales.shape, k
                    ):
                        return _fused_fsdp_dense(g, codes, scales, mesh, axis)
                    # FSDP-sharded but shard-misaligned (conv kernels whose
                    # dim 0 is 3, transposed-layout leaves, ...): the
                    # unpartitioned kernel would force GSPMD to all-gather
                    # the leaf — the jnp math partitions elementwise instead
                    return _jnp_leaf(g, m, shape)
                fused_update = (
                    fused_lion8bit_update_dense
                    if _is_dense(codes, scales)
                    else fused_lion8bit_update_transposed
                )
                upd, new_codes, new_scales = fused_update(
                    g, codes, scales, b1=b1, b2=b2,
                    mu_scale_dtype=mu_scale_dtype, compander=compander,
                )
                return upd, (new_codes, new_scales)

            flat_g, treedef = jax.tree_util.tree_flatten(updates)
            flat_m = treedef.flatten_up_to(state.mu_quant)
            flat_s = treedef.flatten_up_to(shapes)
            results = [None] * len(flat_g)

            # small-leaf bucketing: concatenate all small quantized leaves
            # (per layout / block size) and update them in ONE kernel
            # dispatch each — the round-3 trace counted ~219 per-leaf
            # dispatches carrying only 9% of the optimizer bytes; in the
            # real SD1.5 tree those are almost all small DENSE leaves
            # (196 of 352 quantized leaves are dense <= 1M elements; only
            # conv_in/out edges are transposed). Block membership per leaf
            # is unchanged and scales move through exact relayouts ->
            # bitwise-identical. The price is concat/split copies of the
            # bucketed grads/updates; benchmarks/lion_bucket_ab.py decides
            # the on-chip default. Skipped under FSDP (sharded leaves).
            if bucket_max_nb and fsdp_ctx is None:
                t_groups = {}
                d_group = []
                for i, m in enumerate(flat_m):
                    if not _is_quantized(m):
                        continue
                    if _is_dense(*m):
                        x_i = m[0].shape[0]
                        nb_i = m[1].size
                        if nb_i <= bucket_max_nb:
                            d_group.append(i)
                    else:
                        bs_i, nb_i = m[0].shape
                        if nb_i <= bucket_max_nb:
                            t_groups.setdefault(bs_i, []).append(i)

                for bs_i, idxs in t_groups.items():
                    if len(idxs) < 2:
                        continue  # a lone leaf gains nothing from packing
                    g_t = jnp.concatenate(
                        [flat_g[i].reshape(-1, bs_i).T for i in idxs], axis=1
                    )
                    c_t = jnp.concatenate([flat_m[i][0] for i in idxs], axis=1)
                    s_t = jnp.concatenate([flat_m[i][1] for i in idxs], axis=1)
                    upd_t, nc, ns = fused_lion8bit_update_transposed_packed(
                        g_t, c_t, s_t, b1=b1, b2=b2,
                        mu_scale_dtype=mu_scale_dtype, compander=compander,
                    )
                    off = 0
                    for i in idxs:
                        nb_i = flat_m[i][0].shape[1]
                        sl = slice(off, off + nb_i)
                        results[i] = (
                            upd_t[:, sl].T.reshape(flat_g[i].shape),
                            (nc[:, sl], ns[:, sl]),
                        )
                        off += nb_i

                if len(d_group) >= 2:
                    # dense pack: codes rows concat directly (each leaf's
                    # (x_i, 128) view is a whole number of rows); per-leaf
                    # tile-grouped scales go through the flat order and are
                    # regrouped at the packed width, then back per leaf —
                    # pure permutations, values exact
                    gpr = 128 // block_size
                    xs = [flat_m[i][0].shape[0] for i in d_group]
                    x_sum = sum(xs)
                    g_d = jnp.concatenate(
                        [flat_g[i].reshape(-1, 128) for i in d_group], axis=0
                    )
                    c_d = jnp.concatenate(
                        [flat_m[i][0] for i in d_group], axis=0
                    )
                    s_flat = jnp.concatenate(
                        [
                            _scales_dense_to_flat(
                                flat_m[i][1], flat_m[i][0].shape[0]
                            )
                            for i in d_group
                        ]
                    )
                    r_pack = dense_tile_rows(x_sum)
                    s_d = _scales_flat_to_dense(s_flat, x_sum, gpr, r=r_pack)
                    upd_d, nc_d, ns_d = fused_lion8bit_update_dense(
                        g_d, c_d, s_d, b1=b1, b2=b2,
                        mu_scale_dtype=mu_scale_dtype, compander=compander,
                    )
                    ns_flat = _scales_dense_to_flat(ns_d, x_sum)
                    row_off = 0
                    blk_off = 0
                    for i, x_i in zip(d_group, xs):
                        nb_i = x_i * gpr
                        r_i = flat_m[i][1].shape[1]
                        results[i] = (
                            upd_d[row_off:row_off + x_i].reshape(
                                flat_g[i].shape
                            ),
                            (
                                nc_d[row_off:row_off + x_i],
                                _scales_flat_to_dense(
                                    ns_flat[blk_off:blk_off + nb_i],
                                    x_i, gpr, r=r_i,
                                ),
                            ),
                        )
                        row_off += x_i
                        blk_off += nb_i

            for i, r in enumerate(results):
                if r is None:
                    results[i] = _fused(flat_g[i], flat_m[i], flat_s[i])
            updates_new = treedef.unflatten([r[0] for r in results])
            mu_quant = treedef.unflatten([r[1] for r in results])
            count_inc = optax.safe_int32_increment(state.count)
            return updates_new, ScaleBy8bitLionState(
                count=count_inc,
                mu_quant=mu_quant,
                mu_quant_flag=state.mu_quant_flag,
            )

        # jnp path: sign of the b1-interpolation + b2-EMA requantization,
        # one tree_map over _jnp_leaf (XLA CSEs the shared dequantize).
        # `updates` (first arg) defines the tree structure, so the
        # (int8, scales) tuples inside mu_quant arrive at the lambda whole.
        fused = jax.tree_util.tree_map(
            _jnp_leaf, updates, state.mu_quant, shapes
        )
        treedef = jax.tree_util.tree_structure(updates)
        pairs = treedef.flatten_up_to(fused)
        updates_new = treedef.unflatten([p[0] for p in pairs])
        mu_quant = treedef.unflatten([p[1] for p in pairs])
        count_inc = optax.safe_int32_increment(state.count)
        return updates_new, ScaleBy8bitLionState(
            count=count_inc, mu_quant=mu_quant, mu_quant_flag=state.mu_quant_flag
        )

    return optax.GradientTransformation(init_fn, update_fn)


def lion_8bit(
    learning_rate: Union[float, Callable],
    b1: float = 0.9,
    b2: float = 0.99,
    mu_scale_dtype: Optional[Any] = None,
    block_size: int = 64,
    weight_decay: float = 1e-3,
    mask: Optional[Union[Any, Callable]] = None,
    excluded_layer_mask: Optional[Any] = None,
    use_pallas: Optional[bool] = None,
    dense_fsdp_factor: int = 1,
    bucket_max_nb: int = 0,
    compander: str = "exact",
    momentum_layout: str = "auto",
) -> optax.GradientTransformation:
    """Lion with int8 momentum: quantized-Lion -> decoupled weight decay -> lr.

    ``mask`` selects which leaves receive weight decay; ``excluded_layer_mask``
    selects which leaves get quantized momentum. Note the decay here is
    multiplied by the learning rate downstream (PyTorch-style), matching the
    reference chain order.
    """
    return optax.chain(
        scale_by_lion_8bit(
            b1=b1,
            b2=b2,
            mu_scale_dtype=mu_scale_dtype,
            block_size=block_size,
            excluded_layer_mask=excluded_layer_mask,
            use_pallas=use_pallas,
            dense_fsdp_factor=dense_fsdp_factor,
            bucket_max_nb=bucket_max_nb,
            compander=compander,
            momentum_layout=momentum_layout,
        ),
        optax.add_decayed_weights(weight_decay, mask),
        optax.scale_by_learning_rate(learning_rate),
    )


def momentum_dense_retile(node, r_new: int):
    """Re-group a DENSE momentum leaf's scales to tile height ``r_new``
    (pure storage relayout, values exact). Needed when restoring a
    checkpoint across ``dense_fsdp_factor`` settings: the codes are layout-
    identical, only the scales tile grouping differs."""
    codes, scales = node
    x = codes.shape[0]
    gpr = scales.shape[0] * scales.shape[1] // x
    flat = _scales_dense_to_flat(scales, x)
    return (codes, _scales_flat_to_dense(flat, x, gpr, r=r_new))


def momentum_to_canonical_layout(node):
    """Re-layout a quantized momentum leaf (codes, scales) from any storage
    layout to the CURRENT canonical one (dense where eligible, else
    transposed). Values are preserved exactly — this is a pure relayout,
    used to migrate full-state checkpoints written by older layouts
    (block-transposed, and the original narrow reference-order storage)."""
    codes, scales = node
    layout = _momentum_layout(codes, scales)
    if layout == "dense":
        return node  # dense is already canonical where it appears
    if layout == "narrow":
        nb, bs = codes.shape
        codes_flat = codes.reshape(-1)  # already flat element order
    else:  # transposed
        bs, nb = codes.shape
        codes_flat = jnp.transpose(codes).reshape(-1)  # flat element order
    size = bs * nb
    scales_flat = scales.reshape(-1)  # flat block order in both layouts
    if not _dense_ok(size, bs):
        if layout == "narrow":
            # narrow -> transposed (the canonical non-dense layout)
            return (jnp.transpose(codes), scales_flat.reshape(1, nb))
        return node  # transposed is canonical for this leaf
    gpr = 128 // bs
    return (
        codes_flat.reshape(-1, 128),
        _scales_flat_to_dense(scales_flat, size // 128, gpr).astype(
            scales.dtype
        ),
    )
