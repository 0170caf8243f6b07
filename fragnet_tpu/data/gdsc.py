"""GDSC drug-response data pipeline — the native rebuild of the reference's
vendored DeepTTC stack (fragnet/dataset/ext_data_utils/Step1_getData.py:13-290,
deepttc.py:5-29, cdrp.py:9-66).

Input files (same names the reference expects in ``data_dir``):

* ``GDSC2_fitted_dose_response_25Feb20.xlsx`` — drug/cell response pairs
  (``.csv`` with the same stem is accepted; xlsx needs openpyxl which this
  image lacks).
* ``Drug_listTue_Aug10_2021.csv`` — drug info incl. the PubCHEM column used
  for filtering.
* ``smile_inchi.csv`` — drug_id → SMILES.
* ``Cell_line_RMA_proc_basalExp.txt`` — TSV, genes as rows, ``DATA.<COSMIC>``
  expression columns.

All splits are reproduced: per-cancer stratified (ByCancer), per-drug,
per-cell, and the 5-fold leave-out variants (Step1_getData.py:181-232).
"""

from __future__ import annotations

import os
import random
from typing import List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

# COSMIC ids whose expression columns are absent from the RMA table
# (Step1_getData.py:38)
BAD_COSMIC_IDS = [908134, 1789883, 908120, 908442]
PAIR_COLS = ["DRUG_ID", "COSMIC_ID", "TCGA_DESC", "LN_IC50", "AUC"]


def _train_test_split(df: pd.DataFrame, test_size: float, seed: int):
    """Deterministic row split (sklearn.model_selection.train_test_split
    analog; shuffled by seed, last ceil(n*test_size) rows to test)."""
    n = len(df)
    n_test = int(np.ceil(n * test_size)) if test_size < 1 else int(test_size)
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    test_idx = perm[:n_test]
    train_idx = perm[n_test:]
    return df.iloc[train_idx], df.iloc[test_idx]


class GDSCData:
    """Reference ``GetData`` (Step1_getData.py:13): load + filter + split."""

    def __init__(self, data_dir: str):
        self.data_dir = data_dir
        self.rnafile = os.path.join(data_dir, "Cell_line_RMA_proc_basalExp.txt")
        self.smilefile = os.path.join(data_dir, "smile_inchi.csv")
        self.pairfile = os.path.join(
            data_dir, "GDSC2_fitted_dose_response_25Feb20.xlsx")
        self.drugfile = os.path.join(data_dir, "Drug_listTue_Aug10_2021.csv")

    # -- raw tables --------------------------------------------------------
    def read_pairs(self) -> pd.DataFrame:
        csv_alt = os.path.splitext(self.pairfile)[0] + ".csv"
        if os.path.exists(csv_alt):
            return pd.read_csv(csv_alt)
        return pd.read_excel(self.pairfile)  # needs openpyxl

    def get_drug(self) -> pd.DataFrame:
        """smile_inchi.csv with drug_id/smiles columns (Step1:30-32 reads
        with index_col=0 — the real file has a leading unnamed index)."""
        df = pd.read_csv(self.smilefile, index_col=0)
        if "drug_id" not in df.columns:  # no leading index column
            df = df.reset_index()
        return df

    def filter_pairs(self, df: pd.DataFrame) -> pd.DataFrame:
        """Drop known-bad COSMIC ids + drugs without a usable PubCHEM entry
        (Step1_getData.py:34-50)."""
        df = df[~df["COSMIC_ID"].isin(BAD_COSMIC_IDS)]
        pub = pd.read_csv(self.drugfile)
        pub = pub.dropna(subset=["PubCHEM"])
        pub = pub[(pub["PubCHEM"] != "none") & (pub["PubCHEM"] != "several")]
        return df[df["DRUG_ID"].isin(pub["drug_id"])]

    # -- splits ------------------------------------------------------------
    def _split(self, df: pd.DataFrame, col: str, ratio: float, seed: int):
        """Stratified per-value split (Step1_getData.py:77-100)."""
        trains, tests = [], []
        for value in df[col].value_counts().index:
            sub = df[df[col] == value][PAIR_COLS]
            tr, te = _train_test_split(sub, ratio, seed)
            trains.append(tr)
            tests.append(te)
        return (pd.concat(trains, axis=0, ignore_index=True),
                pd.concat(tests, axis=0, ignore_index=True))

    def by_cancer(self, seed: int = 1, test_size: float = 0.05):
        df = self.filter_pairs(self.read_pairs())
        return self._split(df, "TCGA_DESC", test_size, seed)

    def by_drug(self, seed: int = 1, test_size: float = 0.2):
        df = self.filter_pairs(self.read_pairs())
        return self._split(df, "DRUG_ID", test_size, seed)

    def by_cell(self, seed: int = 1, test_size: float = 0.2):
        df = self.filter_pairs(self.read_pairs())
        return self._split(df, "COSMIC_ID", test_size, seed)

    def _leave_out(self, df: pd.DataFrame, col: str, fold: int):
        """5-fold leave-out over distinct values (Step1_getData.py:181-204)."""
        values = list(dict.fromkeys(df[col]))
        per = len(values) // 5
        lo = per * fold
        hi = len(values) if fold == 4 else per * (fold + 1)
        held = set(values[lo:hi])
        keep = df[["DRUG_ID", "COSMIC_ID", "TCGA_DESC", "LN_IC50"]]
        return (keep[~df[col].isin(held)], keep[df[col].isin(held)])

    def cell_leave_out(self, fold: int):
        df = self.filter_pairs(self.read_pairs())
        return self._leave_out(df, "COSMIC_ID", fold)

    def drug_leave_out(self, fold: int):
        df = self.filter_pairs(self.read_pairs())
        return self._leave_out(df, "DRUG_ID", fold)

    # -- expression --------------------------------------------------------
    def get_rna(self, use_genes: Optional[Sequence[str]] = None) -> pd.DataFrame:
        """RMA expression, transposed to cell-line-indexed: index =
        COSMIC_ID (int), columns = genes (Step1_getData.py:279-290 reads the
        per-split DATA.<id> columns; the cell-indexed transpose is the
        batcher-friendly layout here)."""
        rna = pd.read_csv(self.rnafile, sep="\t")
        if use_genes is not None and "GENE_SYMBOLS" in rna.columns:
            rna = rna[rna["GENE_SYMBOLS"].isin(list(use_genes))]
        data_cols = [c for c in rna.columns if c.startswith("DATA.")]
        mat = rna[data_cols].to_numpy(dtype=np.float32).T
        index = [int(c.split(".", 1)[1]) for c in data_cols]
        genes = (list(rna["GENE_SYMBOLS"])
                 if "GENE_SYMBOLS" in rna.columns
                 else [f"g{i}" for i in range(mat.shape[1])])
        return pd.DataFrame(mat, index=index, columns=genes)


def encode_pairs(gdsc: GDSCData, *frames: pd.DataFrame) -> List[pd.DataFrame]:
    """DeepTTC ``DataEncoding.encode2`` (deepttc.py:9-29): attach SMILES by
    DRUG_ID and Label = LN_IC50."""
    drug_smiles = gdsc.get_drug()
    id2smi = dict(zip(drug_smiles["drug_id"], drug_smiles["smiles"]))
    out = []
    for df in frames:
        df = df[df["DRUG_ID"].isin(id2smi)].reset_index(drop=True)
        df = df.copy()
        df["smiles"] = [id2smi[i] for i in df["DRUG_ID"]]
        df["Label"] = df["LN_IC50"]
        out.append(df)
    return out


def create_gdsc_cdrp_dataset(
    data_dir: str,
    output_dir: str,
    data_type: str = "exp1s",
    frag_type: str = "brics",
    use_genes: Optional[Sequence[str]] = None,
    seed: int = 1,
    test_size: float = 0.05,
    val_size: float = 0.1,
):
    """Reference ``create_cdrp_dataset`` (fragnet/dataset/cdrp.py:9-66):
    ByCancer split → val carve-out → encode → featurize → train/val/test.pkl.
    """
    from fragnet_tpu.data.cdrp import build_cdrp_graphs
    from fragnet_tpu.data.datasets import save_pickle_dataset

    os.makedirs(output_dir, exist_ok=True)
    gdsc = GDSCData(data_dir)
    train, test = gdsc.by_cancer(seed=seed, test_size=test_size)
    train, val = _train_test_split(train, val_size, seed)
    train, val, test = encode_pairs(gdsc, train, val, test)
    rna = gdsc.get_rna(use_genes=use_genes)

    counts = {}
    for name, df in (("train", train), ("val", val), ("test", test)):
        df.to_csv(os.path.join(output_dir, f"{name}.csv"), index=False)
        feat = df.rename(columns={"COSMIC_ID": "cell_line", "Label": "y"})
        graphs = build_cdrp_graphs(
            feat, rna, data_type=data_type, frag_type=frag_type)
        save_pickle_dataset(
            graphs, os.path.join(output_dir, f"{name}.pkl"))
        counts[name] = len(graphs)
    return counts
