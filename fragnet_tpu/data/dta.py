"""DTA dataset creation: SMILES + protein sequence + affinity.

Reference: fragnet/dataset/data.py:541-714 (CreateDataDTA: protein
int-encoding with vocab "ABCDEFGHIKLMNOPQRSTUVWXYZ" → 1..25, max_seq_len
1000) and fragnet/dataset/dta.py (Davis/KIBA creators). Real Davis/KIBA
CSVs (columns: smiles, protein, y) drop in; a synthetic generator keeps the
pipeline runnable with zero egress.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd

SEQ_VOC = "ABCDEFGHIKLMNOPQRSTUVWXYZ"
SEQ_DICT = {v: i + 1 for i, v in enumerate(SEQ_VOC)}
MAX_SEQ_LEN = 1000


def encode_protein(seq: str, max_len: int = MAX_SEQ_LEN) -> np.ndarray:
    """Integer-encode + zero-pad (data.py:703-714)."""
    x = np.zeros(max_len, dtype=np.int32)
    for i, ch in enumerate(seq[:max_len]):
        x[i] = SEQ_DICT.get(ch, 0)
    return x


def build_dta_graphs(df: pd.DataFrame, data_type: str = "exp1s",
                     frag_type: str = "brics", seed: int = 42,
                     max_seq_len: int = MAX_SEQ_LEN):
    """df columns: smiles, protein, y → MolGraphs with .protein set."""
    from fragnet_tpu.chem import engine
    from fragnet_tpu.graphs.build import GraphBuilder

    builder = GraphBuilder(data_type)
    out = []
    for _, row in df.iterrows():
        r = engine.mol_3d(row["smiles"], seed=seed)
        if r is None:
            continue
        mol, conf = r
        g = builder.build(
            mol, conf, [row["y"]], smiles=row["smiles"], frag_type=frag_type,
            protein=encode_protein(str(row["protein"]), max_seq_len),
        )
        if g is not None:
            out.append(g)
    return out


_AA = "ACDEFGHIKLMNPQRSTVWY"  # the 20 standard residues


def synthetic_dta_dataset(n: int = 128, seed: int = 0,
                          seq_len_range=(50, 300)) -> pd.DataFrame:
    """Synthetic drug–target pairs with a deterministic affinity surrogate:
    affinity ~ interaction of drug logP with protein hydrophobic fraction."""
    from fragnet_tpu.data.synthetic import pseudo_logp, random_smiles
    from fragnet_tpu.chem.smiles import MolFromSmiles

    rng = np.random.default_rng(seed)
    rows = []
    hydrophobic = set("AVILMFWC")
    while len(rows) < n:
        s = random_smiles(rng)
        if MolFromSmiles(s) is None:
            continue
        L = int(rng.integers(*seq_len_range))
        prot = "".join(rng.choice(list(_AA), L))
        hfrac = sum(c in hydrophobic for c in prot) / L
        y = 5.0 + 0.8 * pseudo_logp(s) * (hfrac - 0.4) * 4.0 + 0.3 * hfrac
        rows.append({"smiles": s, "protein": prot, "y": y})
    return pd.DataFrame(rows)
