"""Parallelism: named-mesh sharding rules (DP / FSDP / TP).

The reference trains pure-DP with fully replicated states over a
``(device_count, 1)`` mesh (``/root/reference/training_utils.py:24-37,
835-932``; SURVEY.md §2.13). This package keeps that as the default and adds
what the reference only scaffolded: FSDP/ZeRO param sharding and tensor-
parallel PartitionSpecs for SDXL-scale runs (BASELINE configs 4-5). All
collectives are GSPMD-emitted over ICI from these annotations — no explicit
communication code.
"""

from .sharding import (
    params_fsdp_sharding,
    params_tp_sharding,
    batch_sharding_tree,
    replicated_tree,
)

__all__ = [
    "params_fsdp_sharding",
    "params_tp_sharding",
    "batch_sharding_tree",
    "replicated_tree",
]
