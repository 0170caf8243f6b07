"""Production fast-path policy: make the bench-grade path the default path.

The round-2 performance stack (TCSR tile metadata for the fused Pallas GAT
kernel, bf16 compute, HBM-resident dataset caching) was previously reachable
only from bench.py; a plain ``python -m fragnet_tpu.train.finetune`` ran the
slow XLA segment path. This module centralizes the policy so every training
entry (finetune / pretrain / dta / cdrp) resolves the same defaults:

  * ``dtype``  — config key in the finetune/pretrain section; defaults to
    bf16 compute on TPU (params stay f32), f32 elsewhere.
  * ``tcsr``   — auto-enabled on TPU for the model families built on the
    gat2 FragNet core (the only consumers of the tile metadata,
    model/layers.py:143,205). Falls back per-batch to the XLA segment path
    when a batch exceeds the pinned tile windows (hiergraph.py pad_batch).
  * ``cache``  — 'auto' wraps loaders in DeviceCacheLoader when the padded
    dataset fits a conservative HBM budget; 'on'/'off' force it.

Reference equivalence: the reference's DataLoader + CUDA kernels ARE its
production path (finetune_gat2.py:240-242); this makes ours match.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fragnet_tpu.model.layers import KernelPolicy, set_kernel_policy

# model families whose layers consume TCSR tile metadata (FragNet core)
TCSR_FAMILIES = frozenset({
    "gat2", "gat2_transformer", "gat2_transformer2", "gat2_multitask",
    "gat2_masked", "gat2_masked2",
})

# families that accept a compute-dtype constructor arg
_DTYPE_FAMILIES = TCSR_FAMILIES

# conservative HBM budget for dataset caching (v5e has 16 GB; leave room
# for params/activations/XLA workspace)
CACHE_BUDGET_BYTES = 4 << 30


@dataclasses.dataclass(frozen=True)
class FastPath:
    tcsr: bool
    dtype: Any
    cache: str          # 'auto' | 'on' | 'off'
    on_tpu: bool
    kernel: KernelPolicy = KernelPolicy()

    @property
    def dtype_name(self) -> str:
        return "bf16" if self.dtype == jnp.bfloat16 else "f32"


def resolve_kernel_policy(section) -> KernelPolicy:
    """Per-level kernel strategy from the config subtree's ``kernel.*`` keys
    (``kernel.bond=planes|tcsr``, ``kernel.fc=planes|attr|tcsr``,
    ``kernel.attr=true|false``), with the legacy ``FRAGNET_DENSE_*`` env
    vars as overrides only. ``bond='attr'`` is refused by KernelPolicy
    itself (known chip hang, BASELINE.md). The resolved policy is INSTALLED
    (model/layers.get_kernel_policy) so bench and every training entry
    provably select kernels through this one resolver (VERDICT r4 #7)."""
    ksec = section.get("kernel", {}) if hasattr(section, "get") else {}
    getk = ksec.get if hasattr(ksec, "get") else (lambda k, d: d)
    bond = os.environ.get("FRAGNET_DENSE_BOND") or str(getk("bond", "planes"))
    fc = os.environ.get("FRAGNET_DENSE_FC") or str(getk("fc", "planes"))
    attr_env = os.environ.get("FRAGNET_DENSE_ATTR")
    attr = (attr_env == "1") if attr_env is not None \
        else bool(getk("attr", False))
    policy = KernelPolicy(bond=bond, fc=fc, attr=attr)
    set_kernel_policy(policy)
    return policy


def resolve(section, model_version: str = "gat2",
            dist_mode: str = "none") -> FastPath:
    """``section`` is the finetune/pretrain config subtree (supports .get)."""
    on_tpu = jax.default_backend() == "tpu"
    dname = str(section.get("dtype", "bf16" if on_tpu else "f32")).lower()
    if dname in ("bf16", "bfloat16"):
        dtype = jnp.bfloat16
    elif dname in ("f32", "fp32", "float32"):
        dtype = jnp.float32
    else:
        raise ValueError(f"unknown dtype {dname!r} (bf16|f32)")
    # TCSR composes with single-device training AND the edge-partitioned
    # mode (per-shard EPTileMeta, dist/edge_partition.py:EPMetaLoader +
    # ops/pallas_gat.py:pallas_gat_pass_ep); DP keeps its own spec plumbing.
    tcsr_default = (on_tpu and model_version in TCSR_FAMILIES
                    and dist_mode in ("none", "ep"))
    tcsr = bool(section.get("tcsr", tcsr_default))
    cache = str(section.get("cache", "auto")).lower()
    if cache not in ("auto", "on", "off"):
        raise ValueError(f"unknown cache policy {cache!r} (auto|on|off)")
    kernel = resolve_kernel_policy(section)
    return FastPath(tcsr=tcsr, dtype=dtype, cache=cache, on_tpu=on_tpu,
                    kernel=kernel)


def supports_dtype(model_version: str) -> bool:
    return model_version in _DTYPE_FAMILIES


def padded_batch_bytes(spec, n_tasks: int = 1) -> int:
    """Upper-bound bytes of one padded HierGraphBatch (f32/i32 leaves)."""
    b = 0
    b += spec.n_atoms * (167 + 1 + 1 + 1) * 4           # x_atoms, masks, segs
    b += spec.n_edges * (2 + 17 + 1 + 17) * 4           # ei, attr, mask, nf
    b += spec.n_bg_edges * (2 + 1 + 1) * 4
    b += spec.n_frags * (167 + 1 + 1) * 4
    b += spec.n_fconn * (2 + 6 + 1 + 6) * 4
    b += spec.n_fc_edges * (2 + 6 + 1) * 4
    b += spec.n_graphs * (n_tasks + 1) * 4
    return b


def maybe_cache(loader, spec=None, n_tasks: int = 1, policy: str = "auto",
                seed: int = 0, budget: int = CACHE_BUDGET_BYTES):
    """Wrap a BatchLoader in DeviceCacheLoader when the padded dataset fits
    the HBM budget (or the policy forces it). Returns the loader unchanged
    when caching is off / doesn't fit."""
    if policy == "off":
        return loader
    if policy == "auto":
        spec = spec if spec is not None else getattr(loader, "spec", None)
        if spec is None:
            return loader
        n_batches = len(loader)
        if padded_batch_bytes(spec, n_tasks) * max(1, n_batches) > budget:
            return loader
    from fragnet_tpu.data.batcher import DeviceCacheLoader

    return DeviceCacheLoader(loader, seed=seed)


def epoch_message_edges(graphs, num_layer: int) -> float:
    """Real message edges processed per epoch over all four graph levels
    (incl. atom self-loops) × num_layer — the bench.py metric definition."""
    total = 0
    for g in graphs:
        total += (g.n_edges + g.n_atoms + g.n_bg_edges
                  + g.n_fconn + g.n_fc_edges)
    return float(total) * num_layer
