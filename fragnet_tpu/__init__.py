"""fragnet_tpu — a TPU-native molecular property prediction framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of pnnl/FragNet
(reference: /root/reference, JACS doi 10.1021/jacs.5c22620, arXiv:2410.12156):
a four-level hierarchical molecular GNN (atom / bond / fragment /
fragment-connection graphs) with GAT-style attention message passing at every
level, UniMol-style 3D pretraining, MoleculeNet finetuning, DTA / CDRP
extensions, four levels of interpretability, and HP search.

Design stance (TPU-first, not a port):
  * static padded shapes everywhere — one XLA compilation per bucket
  * segment ops (softmax/sum) as the message-passing primitive, with Pallas
    fused kernels for the hot path and pure-XLA reference implementations
  * pure functional model (flax.linen), masking/attention extraction as
    function outputs instead of object mutation
  * multi-chip via jax.sharding.Mesh + shard_map (data parallel and
    edge-partitioned modes) instead of NCCL DDP
  * host-side chemistry with a pure-Python engine (`minichem`) and an RDKit
    backend that is used automatically when rdkit is importable
"""

__version__ = "0.1.0"

# Some TPU pods register their PJRT plugin via sitecustomize and set
# jax_platforms through jax.config, which silently overrides the
# JAX_PLATFORMS env var. FRAGNET_PLATFORM provides a reliable escape hatch
# (e.g. FRAGNET_PLATFORM=cpu for host-only featurization / debugging).
import os as _os

if _os.environ.get("FRAGNET_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["FRAGNET_PLATFORM"])
