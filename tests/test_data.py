"""Data-layer tests: splitters, batcher, synthetic generator, MoleculeNet
registry, persistence."""

import numpy as np
import pytest

from fragnet_tpu.data.batcher import BatchLoader
from fragnet_tpu.data.splitters import (
    cv_random_split,
    deepchem_scaffold_split,
    random_scaffold_split,
    random_split,
    scaffold_split,
)
from fragnet_tpu.data.synthetic import pseudo_solubility, synthetic_dataset
from fragnet_tpu.graphs.hiergraph import spec_for


@pytest.fixture(scope="module")
def smiles_pool():
    df = synthetic_dataset(n=60, task="regression", seed=3)
    return list(df["smiles"])


class TestSplitters:
    def test_scaffold_split_disjoint_and_complete(self, smiles_pool):
        tr, va, te = scaffold_split(smiles_pool)
        all_idx = sorted(tr + va + te)
        assert all_idx == list(range(len(smiles_pool)))
        assert not (set(tr) & set(va)) and not (set(va) & set(te))
        assert len(tr) > len(va) and len(tr) > len(te)

    def test_scaffold_split_deterministic(self, smiles_pool):
        a = scaffold_split(smiles_pool)
        b = scaffold_split(smiles_pool)
        assert a == b

    def test_scaffolds_not_shared_across_splits(self, smiles_pool):
        from fragnet_tpu.data.splitters import generate_scaffold

        tr, va, te = scaffold_split(smiles_pool)
        s_tr = {generate_scaffold(smiles_pool[i]) for i in tr}
        s_te = {generate_scaffold(smiles_pool[i]) for i in te}
        assert not (s_tr & s_te)

    def test_random_split_seeded(self):
        a = random_split(100, seed=1)
        b = random_split(100, seed=1)
        c = random_split(100, seed=2)
        assert a == b and a != c
        assert len(a[0]) == 80 and len(a[1]) == 10

    def test_random_scaffold_and_deepchem(self, smiles_pool):
        tr, va, te = random_scaffold_split(smiles_pool, seed=0)
        assert len(tr) + len(va) + len(te) == len(smiles_pool)
        tr2, va2, te2 = deepchem_scaffold_split(smiles_pool)
        assert len(tr2) + len(va2) + len(te2) == len(smiles_pool)

    def test_random_split_reference_semantics(self):
        """Membership must reproduce splitters_molebert.py:249-258 exactly:
        random.seed(seed) + random.shuffle + int-truncated slicing."""
        import random as pyrandom

        for n, seed in [(97, 0), (100, 7), (31, 3)]:
            all_idx = list(range(n))
            pyrandom.seed(seed)
            pyrandom.shuffle(all_idx)
            want = (all_idx[: int(0.8 * n)],
                    all_idx[int(0.8 * n): int(0.8 * n) + int(0.1 * n)],
                    all_idx[int(0.8 * n) + int(0.1 * n):])
            assert random_split(n, seed=seed) == want

    def test_random_scaffold_split_reference_semantics(self, smiles_pool):
        """Fill order valid → test → train with RandomState(seed) group
        permutation and floor cutoffs (splitters_molebert.py:180-204)."""
        from fragnet_tpu.data.splitters import _scaffold_sets

        n = len(smiles_pool)
        groups = list(_scaffold_sets(smiles_pool, True).values())
        perm = np.random.RandomState(5).permutation(len(groups))
        n_valid, n_test = int(np.floor(0.1 * n)), int(np.floor(0.1 * n))
        train, valid, test = [], [], []
        for gi in perm:
            g = groups[gi]
            if len(valid) + len(g) <= n_valid:
                valid.extend(g)
            elif len(test) + len(g) <= n_test:
                test.extend(g)
            else:
                train.extend(g)
        got = random_scaffold_split(smiles_pool, seed=5)
        assert got == (train, valid, test)

    def test_scaffold_split_chirality_aware(self):
        """Stereo SMILES panel: enantiomeric ring scaffolds must land in
        DIFFERENT scaffold sets (include_chirality=True, the reference
        default at splitters_molebert.py:79), while re-ordered writings of
        the SAME stereoisomer share a set."""
        from fragnet_tpu.chem.smiles import canonical_smiles
        from fragnet_tpu.data.splitters import generate_scaffold

        # decalin diastereomers (ring-fusion stereocenters survive scaffold
        # extraction) → distinct chirality-aware keys
        m1 = "C1CC[C@H]2CCCC[C@H]2C1"
        m2 = "C1CC[C@H]2CCCC[C@@H]2C1"
        a = generate_scaffold(m1, include_chirality=True)
        e = generate_scaffold(m2, include_chirality=True)
        assert a != e and "@" in a
        # without chirality they collapse (legacy behavior)
        assert generate_scaffold(m1, False) == generate_scaffold(m2, False)
        # a methyl side chain strips away; the fusion tags survive and the
        # key equals the bare decalin's
        assert generate_scaffold("CC1CC[C@H]2CCCC[C@H]2C1", True) == a
        # a stereocenter whose side chains are stripped gains 2 Hs and must
        # LOSE its tag (no phantom stereo keys)
        s = generate_scaffold("CC[C@H](C)c1ccccc1", include_chirality=True)
        assert s is not None and "@" not in s
        # writer invariance: re-ordered writings of ONE stereoisomer
        # canonicalize identically; the enantiomer stays distinct
        assert (canonical_smiles("C[C@H](N)O")
                == canonical_smiles("C[C@@H](O)N")
                == canonical_smiles("O[C@@H](N)C"))
        assert canonical_smiles("C[C@H](N)O") != canonical_smiles("C[C@@H](N)O")
        assert (canonical_smiles("C[C@](N)(O)F")
                == canonical_smiles("N[C@@](C)(O)F"))

    def test_split_membership_diverges_on_stereo_pairs(self):
        """A diastereomer pair plus achiral fillers: with chirality-aware
        keys the pair may split apart; with legacy keys they always travel
        together. Checks the keys really differ inside scaffold_split."""
        pool = (["C1CC[C@H]2CCCC[C@H]2C1", "C1CC[C@H]2CCCC[C@@H]2C1"]
                + [f"{'C' * k}c1ccccc1" for k in range(1, 9)])
        from fragnet_tpu.data.splitters import _scaffold_sets

        sets_chiral = _scaffold_sets(pool, True)
        sets_legacy = _scaffold_sets(pool, False)
        in_same_legacy = any({0, 1} <= set(v) for v in sets_legacy.values())
        in_same_chiral = any({0, 1} <= set(v) for v in sets_chiral.values())
        assert in_same_legacy and not in_same_chiral

    def test_cv_stratified_matches_sklearn(self):
        from sklearn.model_selection import StratifiedKFold

        from fragnet_tpu.data.splitters import cv_stratified_split

        labels = [i % 2 for i in range(40)]
        skf = StratifiedKFold(n_splits=10, shuffle=True, random_state=3)
        want = list(skf.split(np.zeros(40), labels))[2]
        tr, va = cv_stratified_split(labels, fold_idx=2, seed=3)
        assert tr == want[0].tolist() and va == want[1].tolist()

    def test_cv(self):
        folds = cv_random_split(50, n_folds=5, seed=0)
        assert len(folds) == 5
        for tr, va in folds:
            assert len(tr) + len(va) == 50
            assert not (set(tr) & set(va))


class TestSynthetic:
    def test_regression_dataset(self):
        df = synthetic_dataset(n=40, task="regression", seed=0)
        assert len(df) == 40
        assert df["smiles"].is_unique
        assert np.isfinite(df["y"]).all()
        # labels vary with structure
        assert df["y"].std() > 0.1

    def test_classification_multitask(self):
        df = synthetic_dataset(n=40, task="classification", seed=0, n_tasks=3)
        for c in ["y0", "y1", "y2"]:
            vals = set(df[c].unique())
            assert vals.issubset({0.0, 1.0, -1.0})

    def test_deterministic(self):
        a = synthetic_dataset(n=20, seed=5)
        b = synthetic_dataset(n=20, seed=5)
        assert list(a["smiles"]) == list(b["smiles"])

    def test_property_function(self):
        # more polar → more soluble
        assert pseudo_solubility("OCCO") > pseudo_solubility("c1ccc2ccccc2c1")


class TestMoleculeNetRegistry:
    def test_csv_loading(self, tmp_path):
        import pandas as pd

        from fragnet_tpu.data.moleculenet import load_moleculenet_csv

        p = tmp_path / "esol.csv"
        pd.DataFrame({
            "smiles": ["CCO", "CCC"],
            "measured log solubility in mols per litre": [-0.77, -1.5],
            "Compound ID": ["a", "b"],
        }).to_csv(p, index=False)
        df = load_moleculenet_csv("esol", str(p))
        assert list(df.columns) == [
            "smiles", "measured log solubility in mols per litre"
        ]

    def test_classification_nan_to_missing(self, tmp_path):
        import pandas as pd

        from fragnet_tpu.data.moleculenet import load_moleculenet_csv

        p = tmp_path / "tox21.csv"
        pd.DataFrame({
            "smiles": ["CCO", "CCC"],
            "NR-AR": [1.0, None],
            "mol_id": ["x", "y"],
        }).to_csv(p, index=False)
        df = load_moleculenet_csv("tox21", str(p))
        assert df["NR-AR"].tolist() == [1.0, -1.0]

    def test_synthetic_fallback(self):
        from fragnet_tpu.data.moleculenet import load_moleculenet

        df = load_moleculenet("bbbp", data_dir=None, n_synthetic=16)
        assert df.attrs.get("synthetic")
        assert "p_np" in df.columns

    def test_unknown_raises(self):
        from fragnet_tpu.data.moleculenet import load_moleculenet

        with pytest.raises(KeyError):
            load_moleculenet("nope")


class TestBatchLoader:
    def test_covers_all_and_masks(self, ft_graphs):
        spec = spec_for(ft_graphs, batch_size=3)
        loader = BatchLoader(ft_graphs, 3, spec=spec, to_device=False)
        total = 0
        for b in loader:
            total += int(b.graph_mask.sum())
        assert total == len(ft_graphs)

    def test_shuffle_deterministic_per_epoch(self, ft_graphs):
        spec = spec_for(ft_graphs, batch_size=4)
        l1 = BatchLoader(ft_graphs, 4, spec=spec, shuffle=True, seed=9,
                         to_device=False)
        l2 = BatchLoader(ft_graphs, 4, spec=spec, shuffle=True, seed=9,
                         to_device=False)
        b1 = [b.y[:, 0].tolist() for b in l1]
        b2 = [b.y[:, 0].tolist() for b in l2]
        assert b1 == b2
        # next epoch differs
        b3 = [b.y[:, 0].tolist() for b in l1]
        assert b1 != b3

    def test_drop_last(self, ft_graphs):
        spec = spec_for(ft_graphs, batch_size=3)
        loader = BatchLoader(ft_graphs, 3, spec=spec, drop_last=True,
                             to_device=False)
        for b in loader:
            assert int(b.graph_mask.sum()) == 3


class TestPersistence:
    def test_shards_roundtrip_and_dedup(self, ft_graphs, tmp_path):
        from fragnet_tpu.data.datasets import load_data_parts, save_ds_parts

        save_ds_parts(list(ft_graphs) + [ft_graphs[0]], str(tmp_path),
                      shard_size=3)
        loaded = load_data_parts(str(tmp_path), dedup=True)
        assert len(loaded) == len(ft_graphs)
        loaded2 = load_data_parts(str(tmp_path), dedup=False)
        assert len(loaded2) == len(ft_graphs) + 1


class TestMultiConfFinetune:
    def test_multiple_conformers_share_label(self):
        import pandas as pd

        from fragnet_tpu.data.datasets import FinetuneMultiConfData

        df = pd.DataFrame({"smiles": ["CCO", "CCN"], "y": [1.5, -2.0]})
        maker = FinetuneMultiConfData("y", num_conf=3, max_iters=50)
        graphs = maker.get_ft_dataset(df)
        assert len(graphs) >= 2  # at least one conformer per molecule
        per = {}
        for g in graphs:
            per.setdefault(g.smiles, []).append(float(g.y[0]))
        assert set(per) == {"CCO", "CCN"}
        for s, ys in per.items():
            assert len(set(ys)) == 1  # all conformers share the label


class TestSizeProfiles:
    """Realistic MoleculeNet size distributions (data/synthetic.py profiles;
    stats from the reference's loader_molebert.py datasets)."""

    def test_profile_shapes(self):
        import numpy as np

        from fragnet_tpu.chem.smiles import MolFromSmiles
        from fragnet_tpu.data.synthetic import synthetic_dataset

        df = synthetic_dataset(n=120, seed=2, profile="esol")
        sz = np.array([MolFromSmiles(s).GetNumAtoms() for s in df["smiles"]])
        assert 10 <= np.median(sz) <= 20       # published median ~13
        assert 25 <= np.percentile(sz, 95) <= 45   # published p95 ~35
        dfh = synthetic_dataset(n=120, seed=2, profile="hiv")
        szh = np.array([MolFromSmiles(s).GetNumAtoms() for s in dfh["smiles"]])
        assert szh.max() > sz.max()            # heavier tail than esol

    def test_profiles_featurize(self):
        from fragnet_tpu.data.datasets import build_graphs
        from fragnet_tpu.data.synthetic import synthetic_dataset

        df = synthetic_dataset(n=6, seed=3, profile="lipo")
        graphs = build_graphs(list(df["smiles"]), [[v] for v in df["y"]])
        assert len(graphs) >= 5
