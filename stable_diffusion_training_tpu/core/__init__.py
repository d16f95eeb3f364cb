"""Core runtime: device mesh, sharding helpers, dtype policy, compile cache."""

from .mesh import (
    AXIS_DATA,
    AXIS_FSDP,
    AXIS_TENSOR,
    batch_sharding,
    create_mesh,
    get_default_mesh,
    replicated,
    set_default_mesh,
)

__all__ = [
    "AXIS_DATA",
    "AXIS_FSDP",
    "AXIS_TENSOR",
    "create_mesh",
    "get_default_mesh",
    "set_default_mesh",
    "replicated",
    "batch_sharding",
]
