"""Real-data ingestion tests: pure-Python LMDB reader/writer, the GDSC
DeepTTC pipeline, Davis/KIBA fold creation, scaffold-from-df and simsgt
creators, and the custom-dataset routing façade."""

import argparse
import os
import pickle
import random

import numpy as np
import pandas as pd
import pytest

from fragnet_tpu.data.lmdb_io import (
    LMDBReader, read_unimol_lmdb, write_lmdb, write_unimol_lmdb,
)


class TestLMDB:
    def test_roundtrip_single_leaf(self, tmp_path):
        items = {f"k{i}".encode(): f"value-{i}".encode() for i in range(10)}
        p = str(tmp_path / "t.lmdb")
        write_lmdb(p, items)
        r = LMDBReader(p)
        assert dict(r.items()) == items
        assert len(r) == 10
        assert r.get(b"k3") == b"value-3"
        assert r.get(b"missing") is None

    def test_roundtrip_branch_and_overflow(self, tmp_path):
        rng = random.Random(0)
        items = {
            f"key-{i:05d}".encode():
                bytes(rng.getrandbits(8)
                      for _ in range(rng.choice([10, 100, 5000, 9000])))
            for i in range(400)
        }
        p = str(tmp_path / "big.lmdb")
        write_lmdb(p, items)
        r = LMDBReader(p)
        got = dict(r.items())
        assert got == items
        # keys come back in sorted (memcmp) order, as liblmdb guarantees
        ks = r.keys()
        assert ks == sorted(ks)

    def test_empty_db(self, tmp_path):
        p = str(tmp_path / "empty.lmdb")
        write_lmdb(p, {})
        r = LMDBReader(p)
        assert list(r.items()) == []
        assert len(r) == 0

    def test_unimol_semantics(self, tmp_path):
        recs = [{"smiles": f"C{'C' * (i % 5)}O", "target": [float(i)]}
                for i in range(30)]
        p = str(tmp_path / "ligands.lmdb")
        write_unimol_lmdb(p, recs)
        out = read_unimol_lmdb(p)
        assert len(out) == 30
        assert set(out[0]) == {"smiles", "target"}
        # multi-task datasets get the extra list level (utils.py:99-102)
        wrapped = read_unimol_lmdb(p, name="tox21")
        assert isinstance(wrapped[0]["target"], list)
        assert isinstance(wrapped[0]["target"][0], list)

    def test_rejects_garbage(self, tmp_path):
        p = str(tmp_path / "bad.lmdb")
        with open(p, "wb") as f:
            f.write(b"\x00" * 8192)
        with pytest.raises(ValueError):
            LMDBReader(p)


@pytest.fixture()
def gdsc_dir(tmp_path):
    """Synthetic GDSC file set in the reference's exact layout."""
    d = tmp_path / "gdsc"
    d.mkdir()
    rng = np.random.default_rng(0)
    cosmic = [100 + i for i in range(12)] + [908134]  # one known-bad id
    drugs = [1, 2, 3, 4]
    rows = []
    for c in cosmic:
        for dr in drugs:
            rows.append(dict(
                DRUG_ID=dr, COSMIC_ID=c,
                TCGA_DESC=["BRCA", "LUAD"][c % 2],
                LN_IC50=float(rng.normal()), AUC=float(rng.uniform()),
            ))
    pd.DataFrame(rows).to_csv(
        d / "GDSC2_fitted_dose_response_25Feb20.csv", index=False)
    pd.DataFrame({
        "drug_id": drugs, "PubCHEM": ["11", "22", "none", "44"],
    }).to_csv(d / "Drug_listTue_Aug10_2021.csv", index=False)
    pd.DataFrame({
        "drug_id": drugs,
        "smiles": ["CCO", "c1ccccc1", "CCN", "CC(=O)O"],
    }).to_csv(d / "smile_inchi.csv", index=False)
    genes = [f"G{j}" for j in range(7)]
    rna = pd.DataFrame({"GENE_SYMBOLS": genes})
    for c in cosmic[:-1]:
        rna[f"DATA.{c}"] = rng.normal(size=len(genes)).astype(np.float32)
    rna.to_csv(d / "Cell_line_RMA_proc_basalExp.txt", sep="\t", index=False)
    return str(d)


class TestGDSC:
    def test_filter_and_split(self, gdsc_dir):
        from fragnet_tpu.data.gdsc import GDSCData

        g = GDSCData(gdsc_dir)
        raw = g.read_pairs()
        filt = g.filter_pairs(raw)
        assert 908134 not in set(filt["COSMIC_ID"])  # bad id dropped
        assert 3 not in set(filt["DRUG_ID"])         # PubCHEM 'none' dropped
        tr, te = g.by_cancer(seed=1, test_size=0.2)
        assert len(tr) + len(te) == len(filt)
        assert len(te) > 0
        # leave-out folds over cells partition the cell set
        tr0, te0 = g.cell_leave_out(0)
        assert set(tr0["COSMIC_ID"]).isdisjoint(set(te0["COSMIC_ID"]))

    def test_rna_layout(self, gdsc_dir):
        from fragnet_tpu.data.gdsc import GDSCData

        g = GDSCData(gdsc_dir)
        rna = g.get_rna()
        assert rna.shape[1] == 7
        assert 100 in rna.index
        sub = g.get_rna(use_genes=["G0", "G3"])
        assert sub.shape[1] == 2

    def test_end_to_end_creation(self, gdsc_dir, tmp_path):
        from fragnet_tpu.data.gdsc import create_gdsc_cdrp_dataset

        out = str(tmp_path / "cdrp_out")
        counts = create_gdsc_cdrp_dataset(
            gdsc_dir, out, seed=1, test_size=0.2, val_size=0.2)
        for fold in ("train", "val", "test"):
            assert os.path.exists(os.path.join(out, f"{fold}.csv"))
            with open(os.path.join(out, f"{fold}.pkl"), "rb") as f:
                graphs = pickle.load(f)
            assert len(graphs) == counts[fold]
            assert counts[fold] > 0
            g0 = graphs[0]
            assert g0.gene_expr is not None and g0.gene_expr.shape[-1] == 7


class TestCreators:
    def _common(self, out, **kw):
        base = dict(out=out, csv=None, data_type="exp1s", frag_type="brics",
                    seed=42, n_synthetic=16, workers=0)
        base.update(kw)
        return argparse.Namespace(**base)

    def test_scaffold_from_df(self, tmp_path):
        from fragnet_tpu.data.create import create_scaffold_from_df
        from fragnet_tpu.data.synthetic import synthetic_dataset

        df = synthetic_dataset(n=24, seed=0)
        csv = str(tmp_path / "cep.csv")
        df.to_csv(csv, index=False)
        out = str(tmp_path / "cep_out")
        create_scaffold_from_df(
            self._common(out, csv=csv, target_name=None))
        for fold in ("train", "val", "test"):
            assert os.path.exists(os.path.join(out, f"{fold}.pkl"))
            assert os.path.exists(os.path.join(out, f"{fold}.csv"))

    def test_simsgt(self, tmp_path):
        from fragnet_tpu.data.create import create_simsgt

        out = str(tmp_path / "sim_out")
        create_simsgt(self._common(
            out, dataset="bbbp", data_dir=None))
        base = os.path.join(out, "simsgt", "bbbp")
        for fold in ("train", "val", "test"):
            assert os.path.exists(os.path.join(base, f"{fold}.pkl"))

    def test_dta_folds(self, tmp_path):
        from fragnet_tpu.data.create import create_dta
        from fragnet_tpu.data.dta import synthetic_dta_dataset

        df = synthetic_dta_dataset(n=12, seed=0)
        tr = str(tmp_path / "davis_train.csv")
        te = str(tmp_path / "davis_test.csv")
        df.iloc[:8].to_csv(tr, index=False)
        df.iloc[8:].to_csv(te, index=False)
        out = str(tmp_path / "dta_out")
        create_dta(self._common(
            out, train_csv=tr, val_csv=None, test_csv=te))
        assert os.path.exists(os.path.join(out, "train.pkl"))
        assert os.path.exists(os.path.join(out, "test.pkl"))
        assert not os.path.exists(os.path.join(out, "val.pkl"))


class TestCustomFacade:
    def test_routing(self, tmp_path):
        from fragnet_tpu.data.moleculenet import MoleculeDataset

        with pytest.raises(KeyError):
            MoleculeDataset("esol")  # not routed (custom_dataset.py:12-27)
        ds = MoleculeDataset("tox21", data_dir=None)
        data = ds.get_data()
        assert len(data) > 0
        assert "smiles" in data[0] and "y" in data[0]
        assert isinstance(data[0]["y"][0], list)  # [[...]] MoleBert shape

    def test_raw_layout(self, tmp_path):
        from fragnet_tpu.data.moleculenet import MoleculeDataset

        raw = tmp_path / "bbbp" / "raw"
        raw.mkdir(parents=True)
        pd.DataFrame({
            "smiles": ["CCO", "c1ccccc1"], "p_np": [1, 0],
        }).to_csv(raw / "bbbp.csv", index=False)
        ds = MoleculeDataset("bbbp", data_dir=str(tmp_path))
        data = ds.get_data()
        assert len(data) == 2
        assert data[0]["y"] == [[1.0]]


def test_gdsc_split_matches_sklearn_exactly():
    """_train_test_split must reproduce sklearn.model_selection.
    train_test_split membership bit-for-bit (the reference's splitter,
    Step1_getData.py:86) — RandomState(seed).permutation, ceil test size,
    test = perm[:n_test]."""
    import numpy as np
    import pandas as pd
    from sklearn.model_selection import train_test_split

    from fragnet_tpu.data.gdsc import _train_test_split

    rng = np.random.default_rng(0)
    for n in (7, 23, 100):
        for ts in (0.05, 0.2):
            for seed in (1, 42):
                df = pd.DataFrame({"a": np.arange(n),
                                   "b": rng.random(n)})
                tr1, te1 = train_test_split(df, test_size=ts,
                                            random_state=seed)
                tr2, te2 = _train_test_split(df, ts, seed)
                assert list(tr1.index) == list(tr2.index)
                assert list(te1.index) == list(te2.index)
