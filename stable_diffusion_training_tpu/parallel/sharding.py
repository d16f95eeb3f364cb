"""Sharding rules over the named mesh.

Design (scaling-book recipe): pick a mesh with axes ``data_parallel`` /
``fsdp`` / ``model_parallel``, annotate params/batch with PartitionSpecs, and
let GSPMD insert the collectives (all-gather for FSDP params, reduce-scatter
for grads, all-reduce for DP) over ICI.

FSDP rule: shard each leaf's largest axis whose size divides the ``fsdp`` axis
size; leaves too small stay replicated. This is ZeRO-3-style param+optimizer
sharding without any resharding code — XLA handles gather/scatter.

TP rule (UNet/CLIP matmuls): column-parallel on to_q/k/v + FF-in kernels
(shard output axis), row-parallel on to_out / FF-out (shard input axis),
replicated elsewhere — the Megatron layout expressed as PartitionSpecs.
"""

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def _axis_size(mesh: Mesh, name: str) -> int:
    return dict(zip(mesh.axis_names, mesh.devices.shape)).get(name, 1)


def replicated_tree(tree: Any, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, PartitionSpec()), tree
    )


def batch_sharding_tree(tree: Any, mesh: Mesh, axis: str = "data_parallel"):
    """Leading-axis batch sharding for every leaf
    (reference ``training_utils.py:835-840``)."""
    return jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, PartitionSpec(axis)), tree
    )


def params_fsdp_sharding(tree: Any, mesh: Mesh, axis: str = "fsdp"):
    """Per-leaf FSDP NamedShardings: shard the largest divisible dim."""
    n = _axis_size(mesh, axis)

    def _leaf_spec(leaf) -> PartitionSpec:
        shape = getattr(leaf, "shape", ())
        if n <= 1 or not shape:
            return PartitionSpec()
        # prefer the largest axis; require divisibility so layouts stay dense
        order = sorted(range(len(shape)), key=lambda i: -shape[i])
        for i in order:
            if shape[i] % n == 0 and shape[i] >= 2 * n:
                spec = [None] * len(shape)
                spec[i] = axis
                return PartitionSpec(*spec)
        return PartitionSpec()

    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, _leaf_spec(leaf)), tree
    )


def _lion_fsdp_plan(state, mesh: Mesh, axis: str = "fsdp"):
    """Shared FSDP momentum plan for the quantized Lion state: returns
    ``(eligible_fn, mu_quant_state, opt_state_shardings)`` or ``None`` when
    the state has no Lion node (or the axis is trivial).

    Dense-eligible momentum leaves (``optim.lion8bit.fsdp_dense_eligible`` —
    the same predicate the optimizer's update dispatch uses, so placement
    and execution agree by construction) are CO-SHARDED dim-0: the dense
    codes shard is the param's matching contiguous flat row range and the
    tile-grouped scales shard the matching tile range — each device holds a
    self-contained dense layout the unmodified kernel consumes locally.
    Everything else follows the generic largest-divisible-dim rule."""
    n = _axis_size(mesh, axis)
    if n <= 1 or not hasattr(state, "params"):
        return None
    from ..optim import lion8bit as l8

    def _is_lion(node):
        return isinstance(node, l8.ScaleBy8bitLionState)

    lions = [
        x
        for x in jax.tree_util.tree_leaves(state.opt_state, is_leaf=_is_lion)
        if _is_lion(x)
    ]
    if not lions:
        return None

    def _eligible(param, m):
        return l8._is_quantized(m) and l8.fsdp_dense_eligible(
            param.shape, m[0].shape, m[1].shape, n
        )

    def _mu_sh(p, m):
        if _eligible(p, m):
            s = NamedSharding(mesh, PartitionSpec(axis, None))
            return (s, s)
        return params_fsdp_sharding(m, mesh, axis)

    def _opt_node(node):
        if not _is_lion(node):
            return params_fsdp_sharding(node, mesh, axis)
        return l8.ScaleBy8bitLionState(
            count=NamedSharding(mesh, PartitionSpec()),
            mu_quant=jax.tree_util.tree_map(_mu_sh, state.params, node.mu_quant),
            mu_quant_flag=params_fsdp_sharding(node.mu_quant_flag, mesh, axis),
        )

    opt_sh = jax.tree_util.tree_map(
        _opt_node, state.opt_state, is_leaf=_is_lion
    )
    return _eligible, lions[0].mu_quant, opt_sh


def train_state_fsdp_sharding(state, mesh: Mesh, axis: str = "fsdp"):
    """FSDP shardings for a full TrainState, with param + quantized-momentum
    leaves CO-SHARDED dim-0 wherever the fused Pallas Lion can run
    shard_map'd (``_lion_fsdp_plan``). For such a leaf the param/grad shard
    is a contiguous flat range matching the momentum shard, so the kernel
    needs zero collectives. Everything else follows the generic
    largest-divisible-dim rule."""
    generic = params_fsdp_sharding(state, mesh, axis)
    plan = _lion_fsdp_plan(state, mesh, axis)
    if plan is None:
        return generic
    eligible, mu, opt_sh = plan

    def _dim0(leaf):
        return NamedSharding(
            mesh, PartitionSpec(axis, *([None] * (leaf.ndim - 1)))
        )

    params_sh = jax.tree_util.tree_map(
        lambda p, m: _dim0(p)
        if eligible(p, m)
        else params_fsdp_sharding(p, mesh, axis),
        state.params,
        mu,
    )
    return generic.replace(params=params_sh, opt_state=opt_sh)


_TP_COLUMN = ("to_q", "to_k", "to_v", "q_proj", "k_proj", "v_proj", "mlp_fc1")
_TP_ROW = ("to_out", "out_proj", "mlp_fc2")
_TP_GEGLU = ("net_0",)  # GEGLU proj: output axis, but split in (value, gate)


def params_tp_sharding(
    tree: Any, mesh: Mesh, axis: str = "model_parallel"
):
    """Megatron-style tensor-parallel PartitionSpecs for attention/FF kernels."""
    n = _axis_size(mesh, axis)

    def _spec_for(path, leaf) -> PartitionSpec:
        shape = getattr(leaf, "shape", ())
        if n <= 1 or len(shape) != 2:
            return PartitionSpec()
        names = tuple(getattr(k, "key", str(k)) for k in path)
        parent = names[-2] if len(names) >= 2 else ""
        if parent in _TP_COLUMN or parent in _TP_GEGLU:
            return (
                PartitionSpec(None, axis) if shape[1] % n == 0 else PartitionSpec()
            )
        if parent in _TP_ROW:
            return (
                PartitionSpec(axis, None) if shape[0] % n == 0 else PartitionSpec()
            )
        return PartitionSpec()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf)), tree
    )


def train_state_tp_sharding(
    state, mesh: Mesh, axis: str = "model_parallel", fsdp_rest: bool = False
):
    """Shardings for a full TrainState under tensor parallelism: Megatron
    specs on ``params``; optimizer state and counters stay replicated, or —
    with ``fsdp_rest`` (tp+fsdp runs) — follow the FSDP rule, with
    dense-eligible quantized momentum dim-0 co-sharded over ``fsdp``
    (``_lion_fsdp_plan``, the same plan pure-FSDP placement uses) so the
    fused Pallas Lion runs shard_map'd on local momentum shards. Unlike
    pure FSDP the params keep their Megatron specs, so GSPMD reshards each
    grad leaf Megatron->dim-0 at the optimizer boundary — an inherent cost
    both the fused and jnp paths pay, since new momentum must land
    fsdp-sharded either way (tests/test_parallel.py::TestTPFSDPFusedLion)."""
    if not fsdp_rest:
        rest = replicated_tree(state, mesh)
        return rest.replace(
            params=params_tp_sharding(state.params, mesh, axis)
        )
    rest = params_fsdp_sharding(state, mesh)
    plan = _lion_fsdp_plan(state, mesh)
    if plan is not None:
        rest = rest.replace(opt_state=plan[2])
    return rest.replace(params=params_tp_sharding(state.params, mesh, axis))
