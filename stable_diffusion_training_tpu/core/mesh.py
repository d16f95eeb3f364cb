"""Device mesh construction and named-sharding helpers.

The reference pins a ``(device_count, 1)`` mesh with axes
``("data_parallel", "model_parallel")`` at import time
(``/root/reference/training_utils.py:24-37``) and only ever uses data
parallelism. Here the mesh is built explicitly (no import side effects) with
three named axes — ``data`` (DP), ``fsdp`` (sharded-DP/ZeRO), ``tensor``
(TP) — over which GSPMD emits ICI collectives; the reference axis names are
accepted as aliases so its public sharding behavior is reproducible exactly.
"""

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec

AXIS_DATA = "data_parallel"
AXIS_FSDP = "fsdp"
AXIS_TENSOR = "model_parallel"

_default_mesh: Optional[Mesh] = None


def create_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = (AXIS_DATA, AXIS_TENSOR),
    devices=None,
) -> Mesh:
    """Build a device mesh.

    Default shape is ``(device_count, 1)`` — pure DP, matching the reference.
    Pass e.g. ``shape=(n_data, n_fsdp, n_tensor)``, ``axis_names=("data_parallel",
    "fsdp", "model_parallel")`` for hybrid sharding; GSPMD lays collectives on
    ICI within a slice.
    """
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (len(devices), 1)
    device_array = mesh_utils.create_device_mesh(shape, devices=list(devices))
    return Mesh(device_array, axis_names=tuple(axis_names))


def set_default_mesh(mesh: Mesh) -> None:
    global _default_mesh
    _default_mesh = mesh


def get_default_mesh() -> Mesh:
    """Lazily build the DP default mesh on first use."""
    global _default_mesh
    if _default_mesh is None:
        _default_mesh = create_mesh()
    return _default_mesh


def replicated(mesh: Optional[Mesh] = None) -> NamedSharding:
    """Fully replicated NamedSharding (reference uses this for all states)."""
    return NamedSharding(mesh or get_default_mesh(), PartitionSpec())


def batch_sharding(mesh: Optional[Mesh] = None, axis: str = AXIS_DATA) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh or get_default_mesh(), PartitionSpec(axis))


def tree_replicated(tree, mesh: Optional[Mesh] = None):
    """Per-leaf replicated sharding tree (for in_shardings/out_shardings)."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda _: sharding, tree)


def tree_device_put_replicated(tree, mesh: Optional[Mesh] = None):
    """device_put every leaf with replicated sharding
    (reference ``training_utils.py:446-483``)."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, device=sharding), tree
    )


def tree_batch_sharded_put(tree, mesh: Optional[Mesh] = None, axis: str = AXIS_DATA):
    """device_put a batch pytree sharded on the leading axis."""
    mesh = mesh or get_default_mesh()
    sharding = NamedSharding(mesh, PartitionSpec(axis, *([None] * 0)))

    def _put(leaf):
        leaf = np.asarray(leaf)
        spec = PartitionSpec(axis, *([None] * (leaf.ndim - 1)))
        return jax.device_put(leaf, device=NamedSharding(mesh, spec))

    del sharding
    return jax.tree_util.tree_map(_put, tree)
