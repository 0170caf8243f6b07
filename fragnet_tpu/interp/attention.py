"""FragNetInterpreter — the serving façade for interpretability.

The analog of FragNetVizApp (fragnet/vizualize/viz.py:576-691): featurize one
SMILES on the fly, run the model once with attention extraction, and expose
the four weight levels (atoms / bonds / fragments / fragment-connections)
plus masking contributions. Bond weights fold the two directed edges by
averaging and are min-max scaled (viz.py:684-690).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fragnet_tpu.chem import engine
from fragnet_tpu.graphs.build import GraphBuilder, MolGraph
from fragnet_tpu.graphs.hiergraph import pad_batch, spec_for


def _minmax(x: np.ndarray) -> np.ndarray:
    lo, hi = float(x.min()), float(x.max())
    if hi - lo < 1e-12:
        return np.zeros_like(x)
    return (x - lo) / (hi - lo)


@dataclasses.dataclass
class InterpResult:
    smiles: str
    prediction: float
    atom_weights: np.ndarray      # (n_atoms,) min-max scaled attention
    bond_weights: np.ndarray      # (n_bonds,) directed-pair-averaged, scaled
    frag_weights: np.ndarray      # (n_frags,)
    fconn_weights: np.ndarray     # (n_connections,)
    atom_contrib: Optional[np.ndarray] = None
    bond_contrib: Optional[np.ndarray] = None
    frag_contrib: Optional[np.ndarray] = None
    fconn_contrib: Optional[np.ndarray] = None
    graph: Optional[MolGraph] = None
    mol: Optional[object] = None
    # per folded connection k: the (atom_i, atom_j) of the REAL bond it cuts
    # (self_cn/iso_cn3 fall back to one atom from each fragment) — the
    # reference's connection→bond highlight map (viz.py:366-393)
    fconn_bonds: Optional[list] = None


def fconn_real_bonds(fragmented) -> list:
    """Map each fragment connection to a pair of real atom indices
    (reference get_regbond_ids_for_fragbond_ids, viz.py:366-393). Ordering
    matches the builder's connection order, i.e. the folded fconn weight
    index."""
    out = []
    for cn in fragmented.connections:
        if cn.bond_id is not None:
            out.append(tuple(cn.atom_indices))
        else:
            # no real bond (self_cn single-fragment loop / iso_cn3 between
            # disconnected components): arbitrary representative atoms
            # (viz.py:389-393)
            f1, f2 = cn.frags
            out.append((sorted(f1.atom_indices)[0],
                        sorted(f2.atom_indices)[0]))
    return out


class FragNetInterpreter:
    """Wraps a finetuned model + params for single-molecule interpretation."""

    def __init__(self, model, params, data_type: str = "exp1s",
                 frag_type: str = "brics"):
        self.model = model
        self.params = params
        self.builder = GraphBuilder(data_type)
        self.frag_type = frag_type
        # jit the attention forward — eager apply dispatches op-by-op, which
        # is pathologically slow over a tunneled-TPU backend
        self._apply_attn = jax.jit(
            lambda p, b: model.apply(p, b, deterministic=True,
                                     return_attentions=True)
        )

    def featurize(self, smiles: str):
        r = engine.mol_3d(smiles)
        if r is None:
            raise ValueError(f"could not parse/embed {smiles!r}")
        mol, conf = r
        g = self.builder.build(mol, conf, [0.0], smiles=smiles,
                               frag_type=self.frag_type)
        if g is None:
            raise ValueError(f"could not featurize {smiles!r}")
        spec = spec_for([g], batch_size=1)
        batch = pad_batch([g], spec)
        batch = jax.tree.map(
            lambda x: jnp.asarray(x) if x is not None else None, batch
        )
        return g, mol, batch

    def interpret(self, smiles: str, with_contributions: bool = True) -> InterpResult:
        g, mol, batch = self.featurize(smiles)
        pred, attn = self._apply_attn(self.params, batch)
        n_atoms, n_edges = g.n_atoms, g.n_edges
        n_frags, n_conn = g.n_frags, g.n_fconn

        atom_w = np.asarray(attn.atoms)[:n_atoms].sum(axis=1)
        frag_w = np.asarray(attn.frags)[:n_frags].sum(axis=1)
        bond_dir_w = np.asarray(attn.bonds)[:n_edges].sum(axis=1)
        fconn_dir_w = np.asarray(attn.fbonds)[:n_conn].sum(axis=1)

        # fold directed pairs (2k, 2k+1) by averaging (viz.py:684-689)
        bond_w = 0.5 * (bond_dir_w[0::2] + bond_dir_w[1::2])
        if n_conn >= 2 and n_frags > 1:
            fconn_w = 0.5 * (fconn_dir_w[0::2] + fconn_dir_w[1::2])
        else:
            fconn_w = fconn_dir_w

        from fragnet_tpu.chem.fragments import FragmentedMol

        fm = FragmentedMol(mol, None, self.frag_type)
        result = InterpResult(
            smiles=smiles,
            prediction=float(np.asarray(pred)[0, 0]),
            atom_weights=_minmax(atom_w),
            bond_weights=_minmax(bond_w),
            frag_weights=_minmax(frag_w),
            fconn_weights=_minmax(fconn_w),
            graph=g,
            mol=mol,
            fconn_bonds=fconn_real_bonds(fm),
        )

        if with_contributions:
            from fragnet_tpu.interp.attribution import (
                atom_contributions,
                bond_contributions,
                fconn_contributions,
                fragment_contributions,
            )

            result.atom_contrib = atom_contributions(
                self.model, self.params, batch, n_atoms
            )
            result.bond_contrib = bond_contributions(
                self.model, self.params, batch, n_edges // 2
            )
            result.frag_contrib = fragment_contributions(
                self.model, self.params, batch, n_frags
            )
            n_fold = n_conn // 2 if (n_conn >= 2 and n_frags > 1) else n_conn
            result.fconn_contrib = fconn_contributions(
                self.model, self.params, batch, max(n_fold, 1)
            )
        return result
