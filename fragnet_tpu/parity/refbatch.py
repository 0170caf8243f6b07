"""Convert this framework's MolGraph objects into the reference's batch-dict
format (the 17-key dict produced by fragnet/dataset/data.py:877-948
collate_fn), so the unmodified reference model can run on identical inputs.

Index-row conventions (documented at graphs/hiergraph.py pad_batch):
  * edge_index rows are (source, target)            — gat2.py:187
  * edge_index_bonds_graph rows are (target, source) — gat2.py:138
  * frag_index rows are (source, target)            — gat2.py:283
  * edge_index_fbonds rows are (target, source)     — gat2.py:239
MolGraph stores each in the reference's row order already.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np
import torch


def reference_batch(graphs: Sequence, n_tasks: int = 1,
                    with_targets: bool = False) -> Dict[str, torch.Tensor]:
    """Concatenate MolGraphs with cumulative index offsets — the exact
    collate_fn semantics (data.py:877-948) — as torch tensors."""
    f32 = lambda arrs: torch.from_numpy(
        np.concatenate([np.asarray(a, np.float32) for a in arrs], axis=0))
    i64 = lambda arrs: torch.from_numpy(
        np.concatenate([np.asarray(a, np.int64) for a in arrs], axis=-1))

    a0 = e0 = f0 = c0 = 0
    ei, fi, bi, ci, a2f, ab, fb = [], [], [], [], [], [], []
    for gi, g in enumerate(graphs):
        ei.append(np.asarray(g.edge_index, np.int64) + a0)
        bi.append(np.asarray(g.ei_bonds, np.int64) + e0)
        fi.append(np.asarray(g.frag_index, np.int64) + f0)
        ci.append(np.asarray(g.ei_fbonds, np.int64) + c0)
        a2f.append(np.asarray(g.atom_to_frag, np.int64) + f0)
        ab.append(np.full(g.n_atoms, gi, np.int64))
        fb.append(np.full(g.n_frags, gi, np.int64))
        a0 += g.n_atoms
        e0 += g.n_edges
        f0 += g.n_frags
        c0 += g.n_fconn

    y = np.zeros((len(graphs), n_tasks), np.float32)
    for gi, g in enumerate(graphs):
        yv = np.asarray(g.y, np.float32).reshape(-1)
        y[gi, : yv.shape[0]] = yv

    batch = {
        "x_atoms": f32([g.x_atoms for g in graphs]),
        "edge_index": i64(ei),
        "frag_index": i64(fi),
        "x_frags": f32([g.x_frags for g in graphs]),
        "edge_attr": f32([g.edge_attr for g in graphs]),
        "cnx_attr": f32([g.cnx_attr for g in graphs]),
        "batch": i64(ab),
        "frag_batch": i64(fb),
        "atom_to_frag_ids": i64(a2f),
        "node_features_bonds": f32([g.nf_bonds for g in graphs]),
        "edge_index_bonds_graph": i64(bi),
        "edge_attr_bonds": f32([g.ea_bonds for g in graphs]),
        "node_features_fbonds": f32([g.nf_fbonds for g in graphs]),
        "edge_index_fbonds": i64(ci),
        "edge_attr_fbonds": f32([g.ea_fbonds for g in graphs]),
        "y": torch.from_numpy(y),
    }
    if with_targets:  # collate_fn_pt extras (data.py:951-1032)
        batch["bnd_lngth"] = f32([g.bnd_lngth for g in graphs])
        batch["bnd_angl"] = f32([g.bnd_angl for g in graphs])
        batch["dh_angl"] = f32([g.dh_angl for g in graphs])
    return batch


def exact_padspec(graphs: Sequence, tcsr: bool = False, ell: bool = False):
    """A PadSpec with NO padding (exact totals), so the padded JAX batch is
    row-for-row identical to the reference collate output."""
    from fragnet_tpu.graphs.hiergraph import PadSpec

    return PadSpec(
        n_graphs=len(graphs),
        n_atoms=sum(g.n_atoms for g in graphs),
        n_edges=sum(g.n_edges for g in graphs),
        n_frags=sum(g.n_frags for g in graphs),
        n_fconn=sum(g.n_fconn for g in graphs),
        n_bg_edges=sum(g.n_bg_edges for g in graphs),
        n_fc_edges=sum(g.n_fc_edges for g in graphs),
    )
