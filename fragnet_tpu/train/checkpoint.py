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


def _torch_key_to_flax_lite(key: str) -> Optional[tuple]:
    """gat2_lite family (model/gat/gat2_lite.py): atom+bond passes only.
    Live modules: projection_b / projection_a / edge_attr_bond_embed / a_b / a
    (gat2_lite.py:80-147); constructed-but-unused in the lite forward:
    projection_fb, edge_attr_fbond_embed, f, f_a_b, plus the gat2 unused set."""
    m = re.match(r"pretrain\.layers\.(\d+)\.(.+)", key)
    if m:
        i, rest = m.group(1), m.group(2)
        rparts = rest.split(".")
        base = ("pretrain", f"layers_{i}")
        if rparts[0] in ("a_b", "a"):
            return base + (rparts[0],)
        if rparts[0] in ("projection_b", "projection_a",
                         "edge_attr_bond_embed"):
            return base + (rparts[0], _LEAF[rparts[1]])
        return None  # f / f_a_b / projection_fb / edge_attr_fbond_embed / unused
    return _torch_key_to_flax(key)  # fthead mappings are shared


def _torch_key_to_flax_edge(key: str) -> Optional[tuple]:
    """gat2_edge family (model/gat/gat2_edge.py): fragment graph attends
    over transformed raw connection attrs. Live modules: projection_b /
    projection_a / edge_attr_bond_embed / cnx_attr_transform / a_b / a / f
    (gat2_edge.py:43-57,78-176)."""
    m = re.match(r"pretrain\.layers\.(\d+)\.(.+)", key)
    if m:
        i, rest = m.group(1), m.group(2)
        rparts = rest.split(".")
        base = ("pretrain", f"layers_{i}")
        if rparts[0] in ("a_b", "a", "f"):
            return base + (rparts[0],)
        if rparts[0] in ("projection_b", "projection_a",
                         "edge_attr_bond_embed", "cnx_attr_transform"):
            return base + (rparts[0], _LEAF[rparts[1]])
        return None
    return _torch_key_to_flax(key)


def _torch_key_to_flax_transformer(key: str) -> Optional[tuple]:
    """gat2_transformer family (gat2.py:832-890): gat2 encoder +
    TransformerConv post-processing (atom_transformer / frag_transformer,
    PyG param names lin_{query,key,value,skip}) + lin1/out head."""
    m = re.match(
        r"(atom_transformer|frag_transformer)\."
        r"(lin_query|lin_key|lin_value|lin_skip)\.(weight|bias)", key)
    if m:
        return (m.group(1), m.group(2), _LEAF[m.group(3)])
    m = re.match(r"(lin1|out)\.(weight|bias)", key)
    if m:
        return (m.group(1), _LEAF[m.group(2)])
    return _torch_key_to_flax(key)


_FAMILY_MAPPERS = {
    "gat2": _torch_key_to_flax,
    "gcn2": _torch_key_to_flax_gcn2,
    "gat": _torch_key_to_flax_gat1,
    "gat2_lite": _torch_key_to_flax_lite,
    "gat2_edge": _torch_key_to_flax_edge,
    "gat2_transformer": _torch_key_to_flax_transformer,
}


def _torch_key_to_flax_cdrp(key: str) -> Optional[tuple]:
    """cdrp family (model/cdrp/model.py:25-43): FragNetFineTuneBase drug
    encoder (its constructed-but-unused fthead is skipped —
    finetune_dta.py:95-104 returns the pooled concat) + gene-expression MLP
    (predictor.0..3, model.py:6-22) + fc1/fc2."""
    m = re.match(r"drug_model\.(.+)", key)
    if m:
        rest = m.group(1)
        if rest.startswith("fthead."):
            return None
        sub = _torch_key_to_flax(rest)
        return ("drug_model",) + sub if sub is not None else None
    m = re.match(r"cell_model\.predictor\.(\d+)\.(weight|bias)", key)
    if m:
        return ("cell_model", f"predictor_{m.group(1)}", _LEAF[m.group(2)])
    m = re.match(r"(fc1|fc2)\.(weight|bias)", key)
    if m:
        return (m.group(1), _LEAF[m.group(2)])
    return None


_FAMILY_MAPPERS["cdrp"] = _torch_key_to_flax_cdrp

# DTA protein transformer (model/dta/model.py:50-81 + drug_encoder.py): keys
# inside one encoder layer → (flax subpath, kind). kind drives the transform:
# 'kernel' = transpose, 'none' = as-is, 'attn_qkv'/'attn_out' = transpose then
# reshape to the template's DenseGeneral shape ((emb,H,Dh) / (H,Dh,emb)).
_DTA_LAYER_LEAVES = {
    "attention.self.query.weight": (("attn", "query", "kernel"), "attn_qkv"),
    "attention.self.query.bias": (("attn", "query", "bias"), "attn_bias"),
    "attention.self.key.weight": (("attn", "key", "kernel"), "attn_qkv"),
    "attention.self.key.bias": (("attn", "key", "bias"), "attn_bias"),
    "attention.self.value.weight": (("attn", "value", "kernel"), "attn_qkv"),
    "attention.self.value.bias": (("attn", "value", "bias"), "attn_bias"),
    "attention.output.dense.weight": (("attn", "out", "kernel"), "attn_out"),
    "attention.output.dense.bias": (("attn", "out", "bias"), "none"),
    "attention.output.LayerNorm.gamma": (("ln1", "scale"), "none"),
    "attention.output.LayerNorm.beta": (("ln1", "bias"), "none"),
    "intermediate.dense.weight": (("ffn1", "kernel"), "kernel"),
    "intermediate.dense.bias": (("ffn1", "bias"), "none"),
    "output.dense.weight": (("ffn2", "kernel"), "kernel"),
    "output.dense.bias": (("ffn2", "bias"), "none"),
    "output.LayerNorm.gamma": (("ln2", "scale"), "none"),
    "output.LayerNorm.beta": (("ln2", "bias"), "none"),
}


def import_dta_state_dict(state_dict: Dict[str, Any], template: Any,
                          strict: bool = False) -> Dict:
    """Import a reference DTAModel state_dict (model/dta/model.py:83-104:
    FragNetFineTuneBase drug encoder + DeepTTC protein transformer + fc1/fc2)
    into the flax DTAModel pytree. The 8 torch encoder layers
    (drug_encoder.py:166-172) are STACKED along a leading axis to match the
    ``nn.scan`` layout of ProteinTransformer.layers; q/k/v/out projections are
    reshaped to flax DenseGeneral shapes. Requires ``template`` (shapes are
    taken from it)."""
    tflat = traverse_util.flatten_dict(
        serialization.to_state_dict(template)["params"])

    def to_np(val):
        if hasattr(val, "cpu"):
            return np.array(val.detach().cpu(), copy=True)
        return np.array(val, copy=True)

    flat: Dict[tuple, np.ndarray] = {}
    stacked: Dict[tuple, Dict[int, np.ndarray]] = {}
    for key, val in state_dict.items():
        m = re.match(r"drug_model\.(.+)", key)
        if m:
            rest = m.group(1)
            if rest.startswith("fthead."):
                continue
            sub = _torch_key_to_flax(rest)
            if sub is None:
                continue
            arr = to_np(val)
            flat[("drug_model",) + sub] = arr.T if sub[-1] == "kernel" else arr
            continue
        m = re.match(r"target_model\.emb\.(word|position)_embeddings\.weight",
                     key)
        if m:
            flat[("target_model", f"{m.group(1)}_embeddings", "embedding")] = \
                to_np(val)
            continue
        m = re.match(r"target_model\.emb\.LayerNorm\.(gamma|beta)", key)
        if m:
            leaf = {"gamma": "scale", "beta": "bias"}[m.group(1)]
            flat[("target_model", "LayerNorm_0", leaf)] = to_np(val)
            continue
        m = re.match(r"target_model\.encoder\.layer\.(\d+)\.(.+)", key)
        if m:
            k, rest = int(m.group(1)), m.group(2)
            if rest not in _DTA_LAYER_LEAVES:
                raise KeyError(f"unmapped DTA encoder leaf {key!r}")
            sub, kind = _DTA_LAYER_LEAVES[rest]
            path = ("target_model", "layers") + sub
            tshape = tflat[path].shape  # (L, ...)
            arr = to_np(val)
            if kind == "kernel":
                arr = arr.T
            elif kind == "attn_qkv":
                arr = arr.T.reshape(tshape[1:])     # (emb, H, Dh)
            elif kind == "attn_out":
                arr = arr.T.reshape(tshape[1:])     # (H, Dh, emb)
            elif kind == "attn_bias":
                arr = arr.reshape(tshape[1:])       # (H, Dh)
            stacked.setdefault(path, {})[k] = arr
            continue
        m = re.match(r"(fc1|fc2)\.(weight|bias)", key)
        if m:
            arr = to_np(val)
            flat[(m.group(1), _LEAF[m.group(2)])] = \
                arr.T if m.group(2) == "weight" else arr
            continue
        # DTAModel2's CNN protein encoder (dta/model.py:107-146) keeps its
        # modules directly on the model; ours live under target_model.
        if key == "embedding_xt.weight":
            flat[("target_model", "embedding_xt", "embedding")] = to_np(val)
            continue
        m = re.match(r"conv_xt_1\.(weight|bias)", key)
        if m:
            arr = to_np(val)
            # torch Conv1d weight (out, in, k) → flax Conv kernel (k, in, out)
            if m.group(1) == "weight":
                arr = arr.transpose(2, 1, 0)
            flat[("target_model", "conv_xt_1", _LEAF[m.group(1)])] = arr
            continue
        m = re.match(r"fc1_xt\.(weight|bias)", key)
        if m:
            arr = to_np(val)
            flat[("target_model", "fc1_xt", _LEAF[m.group(1)])] = \
                arr.T if m.group(1) == "weight" else arr
            continue
        raise KeyError(f"unmapped DTA checkpoint key {key!r}")

    for path, by_layer in stacked.items():
        n_layers = tflat[path].shape[0]
        if strict and sorted(by_layer) != list(range(n_layers)):
            raise KeyError(f"missing encoder layers for {'/'.join(path)}")
        flat[path] = np.stack([by_layer[i] for i in range(n_layers)])

    merged = {}
    for k, v in tflat.items():
        if k in flat:
            if flat[k].shape != np.asarray(v).shape:
                raise ValueError(
                    f"shape mismatch at {'/'.join(k)}: "
                    f"ckpt {flat[k].shape} vs model {np.asarray(v).shape}")
            merged[k] = flat[k]
        else:
            if strict:
                raise KeyError(f"missing param {'/'.join(k)} in checkpoint")
            merged[k] = v
    return {"params": traverse_util.unflatten_dict(merged)}


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
