"""Parallelism layer: device meshes + sharding rules (SPMD over ICI).

The reference is single-device (SURVEY.md §2.10 — no DP/TP/PP/SP/EP anywhere);
this package is the *new* TPU-native parallelism surface: a thin owner of the
jax.sharding.Mesh, NamedSharding rules for transformer backbones (TP over
heads/FFN, DP over batch), and helpers to shard param pytrees. Collectives are
inserted by XLA from the sharding annotations (scaling-book recipe) — no
hand-written NCCL analogs.
"""

from .mesh import get_mesh, make_mesh
from .sharding import (
    data_sharding,
    expert_parallel_rules,
    replicate,
    shard_params,
    transformer_param_rules,
)

__all__ = [
    "make_mesh", "get_mesh", "shard_params", "transformer_param_rules",
    "expert_parallel_rules", "data_sharding", "replicate",
]
