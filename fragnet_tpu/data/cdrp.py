"""CDRP dataset creation: SMILES + gene-expression vector + drug response.

Reference: fragnet/dataset/cdrp.py (GDSC via the vendored DeepTTC pipeline,
dataset/ext_data_utils/) and data.py:717-874 (CreateDataCDRP). Real GDSC
tables (drug CSV + cell-line RMA expression table) drop in via
``build_cdrp_graphs``; the synthetic generator keeps the pipeline runnable.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

GENE_DIM = 903  # GDSC RMA subset size used by the reference (cdrp/model.py:7)


def build_cdrp_graphs(df: pd.DataFrame, gene_expr: pd.DataFrame,
                      data_type: str = "exp1s", frag_type: str = "brics",
                      seed: int = 42):
    """df columns: smiles, cell_line, y; gene_expr indexed by cell_line with
    GENE_DIM numeric columns."""
    from fragnet_tpu.chem import engine
    from fragnet_tpu.graphs.build import GraphBuilder

    builder = GraphBuilder(data_type)
    out = []
    for _, row in df.iterrows():
        if row["cell_line"] not in gene_expr.index:
            continue
        r = engine.mol_3d(row["smiles"], seed=seed)
        if r is None:
            continue
        mol, conf = r
        expr = gene_expr.loc[row["cell_line"]].to_numpy(dtype=np.float32)
        g = builder.build(
            mol, conf, [row["y"]], smiles=row["smiles"], frag_type=frag_type,
            gene_expr=expr,
        )
        if g is not None:
            out.append(g)
    return out


def synthetic_cdrp_dataset(n: int = 128, n_cells: int = 10,
                           gene_dim: int = GENE_DIM, seed: int = 0):
    """Synthetic (drug, cell) pairs: response = drug logP × cell sensitivity
    factor (a fixed linear readout of its expression vector)."""
    from fragnet_tpu.chem.smiles import MolFromSmiles
    from fragnet_tpu.data.synthetic import pseudo_logp, random_smiles

    rng = np.random.default_rng(seed)
    cells = [f"CELL_{i:03d}" for i in range(n_cells)]
    expr = rng.standard_normal((n_cells, gene_dim)).astype(np.float32)
    readout = rng.standard_normal(gene_dim) / np.sqrt(gene_dim)
    sensitivity = expr @ readout

    rows = []
    while len(rows) < n:
        s = random_smiles(rng)
        if MolFromSmiles(s) is None:
            continue
        ci = int(rng.integers(0, n_cells))
        y = 2.0 + pseudo_logp(s) * 0.5 + float(sensitivity[ci])
        rows.append({"smiles": s, "cell_line": cells[ci], "y": y})
    df = pd.DataFrame(rows)
    gene_df = pd.DataFrame(expr, index=cells)
    return df, gene_df
