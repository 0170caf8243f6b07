"""Checkpointing: flax msgpack serialization (always available) with a
documented pytree layout, plus the torch-state_dict importer for reference
checkpoints.

Reference behaviors covered: torch.save(state_dict) on val improvement
(train/utils.py:51-56), pretrain→finetune transfer that copies only the
encoder (finetune_gat2.py:213-230), partial/filtered loading (viz.py:562-574).

Name mapping (torch reference → this pytree); the reference's constructed-but-
unused modules (gat2.py:64-85: atom_embed, frag_embed, edge_embed,
bond_edge_embed, frag_message_mlp, atom_mlp, frag_mlp, bias,
edge_attr_bond_embed2) are skipped on import:

  pretrain.layers.{i}.projection_b.{weight,bias}  → pretrain/layers_{i}/projection_b/{kernel.T,bias}
  pretrain.layers.{i}.projection_a.*              → .../projection_a/*
  pretrain.layers.{i}.projection_fb.*             → .../projection_fb/*
  pretrain.layers.{i}.edge_attr_bond_embed.*      → .../edge_attr_bond_embed/*
  pretrain.layers.{i}.edge_attr_fbond_embed.*     → .../edge_attr_fbond_embed/*
  pretrain.layers.{i}.{a_b,a,f,f_a_b}             → .../{a_b,a,f,f_a_b}
  fthead.predictor.{k}.*                          → head/predictor_{k}/*
  fthead.{lin1,out,dense,out_proj}.*              → head/...
  head.{bl_reduce_layer,bl_layers.k,...}          → head/...
"""

from __future__ import annotations

import os
import pickle
import re
from typing import Any, Dict, Optional

import numpy as np
from flax import serialization
from flax import traverse_util


def save_params(params: Any, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(template: Any, path: str) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_pickle(obj: Any, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(obj, f)


# ---------------------------------------------------------------------------
# torch state_dict import
# ---------------------------------------------------------------------------

_SKIP_MODULES = (
    "atom_embed", "frag_embed", "edge_embed", "bond_edge_embed",
    "frag_message_mlp", "atom_mlp", "frag_mlp", "edge_attr_bond_embed2",
)


def _torch_key_to_flax(key: str) -> Optional[tuple]:
    """Map a reference state_dict key to a flax param path tuple, or None to
    skip (unused modules / bare layer bias)."""
    parts = key.split(".")
    # pretrain encoder layers
    m = re.match(r"pretrain\.layers\.(\d+)\.(.+)", key)
    if m:
        i, rest = m.group(1), m.group(2)
        rparts = rest.split(".")
        if rparts[0] in _SKIP_MODULES or rest == "bias":
            return None
        base = ("pretrain", f"layers_{i}")
        if rparts[0] in ("a_b", "a", "f", "f_a_b"):
            return base + (rparts[0],)
        if rparts[0] in (
            "projection_b", "projection_a", "projection_fb",
            "edge_attr_bond_embed", "edge_attr_fbond_embed",
        ):
            leaf = {"weight": "kernel", "bias": "bias"}[rparts[1]]
            return base + (rparts[0], leaf)
        return None
    # finetune heads
    m = re.match(r"fthead\.predictor\.(\d+)\.(weight|bias)", key)
    if m:
        leaf = {"weight": "kernel", "bias": "bias"}[m.group(2)]
        return ("head", "_MLPHead_0", f"predictor_{m.group(1)}", leaf)
    m = re.match(r"fthead\.(lin1|out|dense|out_proj)\.(weight|bias)", key)
    if m:
        leaf = {"weight": "kernel", "bias": "bias"}[m.group(2)]
        return ("head", m.group(1), leaf)
    # pretrain heads
    m = re.match(r"head\.bl_reduce_layer\.(weight|bias)", key)
    if m:
        leaf = {"weight": "kernel", "bias": "bias"}[m.group(1)]
        return ("head", "bl_reduce_layer", leaf)
    m = re.match(r"head\.(bl|ba|da|FC)_layers\.(\d+)\.(weight|bias)", key)
    if m:
        group = {"bl": "bl_layers", "ba": "ba_layers", "da": "da_layers",
                 "FC": "FC_layers"}[m.group(1)]
        leaf = {"weight": "kernel", "bias": "bias"}[m.group(3)]
        return ("head", group, f"layers_{m.group(2)}", leaf)
    return None


_LEAF = {"weight": "kernel", "bias": "bias"}


def _torch_key_to_flax_gcn2(key: str) -> Optional[tuple]:
    """gcn2 family (model/gcn/gcn2.py): atom_embed/edge_embed/frag_mlp are
    LIVE here (unlike gat2 where they are constructed-but-unused);
    frag_embed/frag_message_mlp/atom_mlp and the unused top-level lin1 are
    skipped."""
    m = re.match(r"pretrain\.layers\.(\d+)\.(.+)", key)
    if m:
        i, rest = m.group(1), m.group(2)
        rparts = rest.split(".")
        base = ("pretrain", f"layers_{i}")
        if rparts[0] in ("atom_embed", "edge_embed") and len(rparts) == 2:
            return base + (rparts[0], _LEAF[rparts[1]])
        m2 = re.match(r"frag_mlp\.([02])\.(weight|bias)", rest)
        if m2:
            idx = {"0": "frag_mlp_0", "2": "frag_mlp_1"}[m2.group(1)]
            return base + (idx, _LEAF[m2.group(2)])
        return None
    m = re.match(r"fthead\.predictor\.(\d+)\.(weight|bias)", key)
    if m:
        return ("head", "_MLPHead_0", f"predictor_{m.group(1)}",
                _LEAF[m.group(2)])
    m = re.match(r"fthead\.(lin1|out|dense|out_proj)\.(weight|bias)", key)
    if m:
        return ("head", m.group(1), _LEAF[m.group(2)])
    return None  # lin1/out at top level are unused in gcn2 forward


def _torch_key_to_flax_gat1(key: str) -> Optional[tuple]:
    """v1 family (model/gat/gat.py): fixed attributes layer1..layer4 →
    layers_0..3; live modules: projection_b/a_b (bond GAT), atom_embed,
    edge_embed (computed-unused but present in our tree too), frag_mlp;
    skipped: frag_embed/frag_message_mlp/atom_mlp/bias (uninitialized)."""
    m = re.match(r"pretrain\.layer(\d+)\.(.+)", key)
    if m:
        i = int(m.group(1)) - 1
        rest = m.group(2)
        rparts = rest.split(".")
        base = ("pretrain", f"layers_{i}")
        if rest == "a_b":
            return base + ("a_b",)
        if rparts[0] in ("projection_b", "atom_embed", "edge_embed") \
                and len(rparts) == 2:
            return base + (rparts[0], _LEAF[rparts[1]])
        m2 = re.match(r"frag_mlp\.([02])\.(weight|bias)", rest)
        if m2:
            idx = {"0": "frag_mlp_0", "2": "frag_mlp_1"}[m2.group(1)]
            return base + (idx, _LEAF[m2.group(2)])
        return None
    m = re.match(r"(lin1|out)\.(weight|bias)", key)
    if m:
        return (m.group(1), _LEAF[m.group(2)])
    return None


_FAMILY_MAPPERS = {
    "gat2": _torch_key_to_flax,
    "gcn2": _torch_key_to_flax_gcn2,
    "gat": _torch_key_to_flax_gat1,
}


def import_torch_state_dict(state_dict: Dict[str, Any],
                            template: Optional[Any] = None,
                            strict: bool = False,
                            family: str = "gat2") -> Dict:
    """Convert a reference torch state_dict (tensor or ndarray values) into a
    flax params dict {'params': ...}. Linear weights are transposed
    (torch [out,in] → flax kernel [in,out]). ``family`` selects the name
    mapping: 'gat2' (default), 'gcn2', or 'gat' (v1).

    With ``template`` given, entries are validated against its shapes and the
    result contains template values for any params the checkpoint lacks."""
    mapper = _FAMILY_MAPPERS[family]
    flat: Dict[tuple, np.ndarray] = {}
    skipped = []
    for key, val in state_dict.items():
        path = mapper(key)
        if path is None:
            skipped.append(key)
            continue
        arr = np.asarray(getattr(val, "detach", lambda: val)())
        if hasattr(val, "cpu"):
            arr = np.asarray(val.detach().cpu())
        if path[-1] == "kernel":
            arr = arr.T
        # Copy: np.asarray on a torch tensor is a zero-copy VIEW of the
        # tensor's storage (and .T is a view of that view). Without a copy,
        # any later in-place mutation of the torch model (e.g. opt.step())
        # silently changes these imported params too.
        flat[path] = np.array(arr, copy=True)

    if template is not None:
        tflat = traverse_util.flatten_dict(
            serialization.to_state_dict(template)["params"]
        )
        merged = {}
        for k, v in tflat.items():
            if k in flat:
                if flat[k].shape != np.asarray(v).shape:
                    raise ValueError(
                        f"shape mismatch at {'/'.join(k)}: "
                        f"ckpt {flat[k].shape} vs model {np.asarray(v).shape}"
                    )
                merged[k] = flat[k]
            else:
                if strict:
                    raise KeyError(f"missing param {'/'.join(k)} in checkpoint")
                merged[k] = v
        return {"params": traverse_util.unflatten_dict(merged)}
    return {"params": traverse_util.unflatten_dict(flat)}


def transfer_pretrained_encoder(finetune_params: Dict, pretrain_params: Dict) -> Dict:
    """Copy the encoder subtree from a pretrain checkpoint into finetune
    params (reference: model.pretrain.load_state_dict, finetune_gat2.py:216-229)."""
    import copy

    out = copy.deepcopy(serialization.to_state_dict(finetune_params))
    pt = serialization.to_state_dict(pretrain_params)
    out["params"]["pretrain"] = copy.deepcopy(pt["params"]["pretrain"])
    return serialization.from_state_dict(finetune_params, out)
