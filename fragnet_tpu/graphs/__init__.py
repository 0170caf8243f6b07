"""Four-level hierarchical molecular graphs with TPU-friendly static shapes.

* ``build``     — host-side molecule → ragged numpy arrays (the analog of
  fragnet/dataset/data.py CreateData.create_data_point)
* ``hiergraph`` — the padded ``HierGraphBatch`` pytree + batcher (the
  XLA-friendly replacement for PyG ``Data`` + ``collate_fn``)
"""

from fragnet_tpu.graphs.build import GraphBuilder, MolGraph
from fragnet_tpu.graphs.hiergraph import HierGraphBatch, PadSpec, pad_batch, spec_for

__all__ = ["GraphBuilder", "MolGraph", "HierGraphBatch", "PadSpec", "pad_batch", "spec_for"]
