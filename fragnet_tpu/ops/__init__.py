"""Compute primitives: masked segment ops (XLA) and Pallas fused kernels.

The TPU-native replacement for torch-scatter's ``scatter_add`` /
``scatter_softmax`` (reference call sites: fragnet/model/gat/gat2.py:153,162,
210,216,234,257,265,303,309,820-821).
"""

from fragnet_tpu.ops.segment import (
    gat_attention_pass,
    segment_softmax,
    segment_sum,
)

__all__ = ["segment_softmax", "segment_sum", "gat_attention_pass"]
