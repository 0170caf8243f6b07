"""Distributed execution: mesh helpers, data-parallel training via
shard_map + psum (the TPU-native replacement for the reference's Lightning
Fabric NCCL DDP, finetune_gat2_pl.py:230-260), and the edge-partitioned
large-graph mode."""

from fragnet_tpu.dist.data_parallel import (
    make_dp_train_step,
    make_mesh,
    stack_for_dp,
)
from fragnet_tpu.dist.edge_partition import (
    edge_partitioned_gat_pass,
    edge_partitioned_segment_sum,
    shard_edges,
)

__all__ = [
    "make_dp_train_step", "make_mesh", "stack_for_dp",
    "edge_partitioned_gat_pass", "edge_partitioned_segment_sum",
    "shard_edges",
]
