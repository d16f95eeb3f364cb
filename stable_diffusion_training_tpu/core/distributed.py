"""Multi-host (pod) initialization and DCN-aware mesh construction.

The reference is single-process single-host by construction (SURVEY.md §2.14
"Distributed communication backend"): its mesh covers ``jax.device_count()``
local devices and all collectives are GSPMD-emitted over ICI. This module
adds the pod story: ``jax.distributed.initialize`` for multi-host runs and a
hybrid mesh builder that keeps the fast axes (tensor/fsdp) inside a slice
(ICI) and the data axis across slices (DCN), per the scaling-book recipe.
"""

from typing import Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX distributed runtime for multi-host pods.

    On Cloud TPU pods the arguments are auto-detected from the metadata
    server; pass them explicitly elsewhere. Safe to call on single host
    (no-op when num_processes == 1).
    """
    if num_processes == 1:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def create_hybrid_mesh(
    ici_shape: Sequence[int],
    dcn_shape: Optional[Sequence[int]] = None,
    axis_names: Tuple[str, ...] = ("data_parallel", "fsdp", "model_parallel"),
) -> Mesh:
    """Mesh whose leading axes span slices (DCN) and trailing axes stay
    within a slice (ICI) — bandwidth-hungry collectives (TP all-gathers,
    FSDP reduce-scatters) ride ICI; only DP gradient all-reduce crosses DCN.
    """
    from jax.experimental import mesh_utils

    if dcn_shape is None:
        devices = mesh_utils.create_device_mesh(tuple(ici_shape))
    else:
        devices = mesh_utils.create_hybrid_device_mesh(
            tuple(ici_shape), dcn_mesh_shape=tuple(dcn_shape)
        )
    return Mesh(devices, axis_names=tuple(axis_names)[: devices.ndim])


def process_local_batch_slice(global_batch_size: int) -> slice:
    """The per-host slice of a globally-sharded batch (per-host data
    loading: each host feeds only its shard of the data axis)."""
    per_host = global_batch_size // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


def slice_batch_for_process(batch: dict) -> dict:
    """Cut a global batch down to this host's shard.

    Every leaf's leading dim is batch-derived (``pixel_values`` B;
    ids/mask B*concat), so the proportional slice is correct for all keys.
    No-op on single process."""
    n = jax.process_count()
    if n == 1:
        return batch

    def _slice(leaf):
        per = leaf.shape[0] // n
        start = jax.process_index() * per
        return leaf[start : start + per]

    return jax.tree_util.tree_map(_slice, batch)


def put_global_batch(batch: dict, mesh: Mesh, axis: str = "data_parallel"):
    """device_put a PER-PROCESS batch as GLOBAL arrays sharded on the data
    axis.

    Single process: a plain sharded ``device_put`` (the reference layout).
    Multi-process: each host contributes only its local shard and
    ``jax.make_array_from_process_local_data`` assembles the global array —
    the per-host loader glue the reference lacks (it is single-host by
    construction, SURVEY.md §5.8)."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec

    n = jax.process_count()

    def _put(leaf):
        leaf = np.asarray(leaf)
        spec = PartitionSpec(axis, *([None] * (leaf.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        if n == 1:
            return jax.device_put(leaf, sharding)
        global_shape = (leaf.shape[0] * n, *leaf.shape[1:])
        return jax.make_array_from_process_local_data(
            sharding, leaf, global_shape
        )

    return jax.tree_util.tree_map(_put, batch)
