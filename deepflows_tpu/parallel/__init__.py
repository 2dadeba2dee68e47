"""Mesh-parallel training over jax.sharding (TPU-native scale-out; the
reference has no distributed code — SURVEY §2.3)."""

from .mesh import auto_mesh, batch_sharding, make_mesh, replicated
from .pipeline import PipelinedTrainStep, PipelineStack, pipeline_apply
from .ring import ring_attention
from .sequence import ShardConstraint, sequence_sharding
from .sharded import (
    ShardedEvalStep,
    ShardedTrainStep,
    expert_parallel_rules,
    fsdp_rules,
    tensor_parallel_rules,
)

__all__ = [
    "make_mesh",
    "auto_mesh",
    "replicated",
    "batch_sharding",
    "ShardedTrainStep",
    "ShardedEvalStep",
    "tensor_parallel_rules",
    "PipelineStack",
    "PipelinedTrainStep",
    "pipeline_apply",
    "ShardConstraint",
    "ring_attention",
    "sequence_sharding",
    "expert_parallel_rules",
    "fsdp_rules",
]
