"""CPU-torch shims for the reference's native dependencies.

The reference model (fragnet/model/gat/gat2.py) needs exactly five symbols
from torch_scatter / torch_geometric:

  * torch_scatter.scatter_add       (gat2.py:5)
  * torch_scatter.scatter_softmax   (gat2.py:5)
  * torch_geometric.utils.add_self_loops / degree  (gat2.py:2)
  * torch_geometric.nn.norm.BatchNorm (gat2.py:10, import-only)
  * torch_geometric.nn.TransformerConv (gat2.py:829)

Each is re-implemented here in plain torch with the semantics of the real
packages (output sizing, broadcasting, numerically-stable softmax), so the
reference forward can run unmodified on CPU and serve as the ground truth
for activation parity tests. This file deliberately contains no JAX.
"""

from __future__ import annotations

import importlib
import sys
import types
from typing import Optional

import torch
import torch.nn as nn

REFERENCE_ROOT = "/root/reference"


# ---------------------------------------------------------------------------
# torch_scatter
# ---------------------------------------------------------------------------

def _expand_index(index: torch.Tensor, src: torch.Tensor, dim: int) -> torch.Tensor:
    """torch_scatter broadcasts a 1-D index over the trailing dims of src."""
    if index.dim() == src.dim():
        return index
    for _ in range(src.dim() - index.dim()):
        index = index.unsqueeze(-1)
    return index.expand_as(src)


def scatter_add(src: torch.Tensor, index: torch.Tensor, dim: int = 0,
                out: Optional[torch.Tensor] = None,
                dim_size: Optional[int] = None) -> torch.Tensor:
    """torch_scatter.scatter_add: output extent along ``dim`` is
    ``dim_size`` or ``index.max()+1`` (the sizing rule the reference model
    implicitly relies on, e.g. gat2.py:162,234)."""
    idx = _expand_index(index, src, dim)
    if out is None:
        size = list(src.shape)
        size[dim] = int(dim_size) if dim_size is not None else (
            int(index.max()) + 1 if index.numel() else 0
        )
        out = torch.zeros(size, dtype=src.dtype, device=src.device)
    return out.scatter_add_(dim, idx, src)


def scatter_max(src: torch.Tensor, index: torch.Tensor, dim: int = 0,
                dim_size: Optional[int] = None):
    idx = _expand_index(index, src, dim)
    size = list(src.shape)
    size[dim] = int(dim_size) if dim_size is not None else int(index.max()) + 1
    out = torch.full(size, float("-inf"), dtype=src.dtype, device=src.device)
    out = out.scatter_reduce_(dim, idx, src, reduce="amax", include_self=True)
    return out, None  # real torch_scatter also returns argmax; unused here


def scatter_softmax(src: torch.Tensor, index: torch.Tensor,
                    dim: int = 0) -> torch.Tensor:
    """Numerically-stable per-segment softmax, matching torch_scatter's
    composite (scatter_max → exp → scatter_sum → div)."""
    idx = _expand_index(index, src, dim)
    mx, _ = scatter_max(src, index, dim=dim)
    ex = (src - mx.gather(dim, idx)).exp()
    den = scatter_add(ex, index, dim=dim)
    return ex / den.gather(dim, idx)


# ---------------------------------------------------------------------------
# torch_geometric.utils
# ---------------------------------------------------------------------------

def add_self_loops(edge_index: torch.Tensor, edge_attr: Optional[torch.Tensor] = None,
                   fill_value=None, num_nodes: Optional[int] = None):
    """PyG semantics: num_nodes defaults to edge_index.max()+1; self-loops are
    APPENDED after the real edges (ordering matters for gat2.py:179-185)."""
    n = int(num_nodes) if num_nodes is not None else (
        int(edge_index.max()) + 1 if edge_index.numel() else 0
    )
    loop = torch.arange(n, dtype=edge_index.dtype, device=edge_index.device)
    ei = torch.cat([edge_index, torch.stack([loop, loop])], dim=1)
    return ei, edge_attr


def degree(index: torch.Tensor, num_nodes: Optional[int] = None,
           dtype=None) -> torch.Tensor:
    n = int(num_nodes) if num_nodes is not None else (
        int(index.max()) + 1 if index.numel() else 0
    )
    out = torch.zeros(n, dtype=dtype or torch.float32, device=index.device)
    return out.scatter_add_(0, index, torch.ones_like(index, dtype=out.dtype))


# ---------------------------------------------------------------------------
# torch_geometric.nn
# ---------------------------------------------------------------------------

class TransformerConv(nn.Module):
    """UniMP-style graph transformer conv (PyG defaults: concat=True,
    root_weight=True, beta=False). Parameter names (lin_key/lin_query/
    lin_value/lin_skip) match PyG so checkpoints remain loadable."""

    def __init__(self, in_channels: int, out_channels: int, heads: int = 1,
                 concat: bool = True, dropout: float = 0.0, bias: bool = True):
        super().__init__()
        self.out_channels = out_channels
        self.heads = heads
        self.concat = concat
        self.lin_key = nn.Linear(in_channels, heads * out_channels)
        self.lin_query = nn.Linear(in_channels, heads * out_channels)
        self.lin_value = nn.Linear(in_channels, heads * out_channels)
        skip_out = heads * out_channels if concat else out_channels
        self.lin_skip = nn.Linear(in_channels, skip_out, bias=bias)

    def forward(self, x: torch.Tensor, edge_index: torch.Tensor) -> torch.Tensor:
        src, dst = edge_index[0], edge_index[1]
        H, D = self.heads, self.out_channels
        q = self.lin_query(x).view(-1, H, D)
        k = self.lin_key(x).view(-1, H, D)
        v = self.lin_value(x).view(-1, H, D)
        logits = (q[dst] * k[src]).sum(dim=-1) / (D ** 0.5)     # (E, H)
        alpha = scatter_softmax(logits, dst, dim=0)
        out = scatter_add(alpha.unsqueeze(-1) * v[src], dst, dim=0,
                          dim_size=x.size(0))                    # (N, H, D)
        out = out.reshape(-1, H * D) if self.concat else out.mean(dim=1)
        return out + self.lin_skip(x)


class BatchNorm(nn.BatchNorm1d):
    """PyG BatchNorm == BatchNorm1d over node features."""


# ---------------------------------------------------------------------------
# module injection + reference import
# ---------------------------------------------------------------------------

def install_shims() -> None:
    """Register fake torch_scatter / torch_geometric packages in sys.modules
    (idempotent; no-op if the real packages are importable)."""
    if "torch_scatter" not in sys.modules:
        ts = types.ModuleType("torch_scatter")
        ts.scatter_add = scatter_add
        ts.scatter_softmax = scatter_softmax
        ts.scatter_max = scatter_max
        sys.modules["torch_scatter"] = ts

    if "torch_geometric" not in sys.modules:
        tg = types.ModuleType("torch_geometric")
        utils = types.ModuleType("torch_geometric.utils")
        utils.add_self_loops = add_self_loops
        utils.degree = degree
        tgnn = types.ModuleType("torch_geometric.nn")
        tgnn.TransformerConv = TransformerConv
        norm = types.ModuleType("torch_geometric.nn.norm")
        norm.BatchNorm = BatchNorm
        tgnn.norm = norm
        data_mod = types.ModuleType("torch_geometric.data")

        class Data(dict):  # minimal PyG Data stand-in (attr-style access)
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

            def __setattr__(self, k, v):
                self[k] = v

        data_mod.Data = Data
        tg.utils = utils
        tg.nn = tgnn
        tg.data = data_mod
        sys.modules["torch_geometric"] = tg
        sys.modules["torch_geometric.utils"] = utils
        sys.modules["torch_geometric.nn"] = tgnn
        sys.modules["torch_geometric.nn.norm"] = norm
        sys.modules["torch_geometric.data"] = data_mod


def load_reference_module(dotted: str):
    """Import a reference module by dotted path (e.g.
    'fragnet.model.gat.gat2') with the shims installed. fragnet/ and
    fragnet/model/ are PEP-420 namespace packages in the reference tree, so
    plain importlib resolution works once /root/reference is on sys.path."""
    install_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    prev = sys.dont_write_bytecode
    sys.dont_write_bytecode = True  # the reference tree is read-only
    try:
        return importlib.import_module(dotted)
    finally:
        sys.dont_write_bytecode = prev
