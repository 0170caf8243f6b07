"""External-ground-truth guard for minichem perception (VERDICT r2 item 7).

Unlike tests/test_chem_golden.py (which pins minichem against ITSELF), every
expectation here was derived BY HAND from documented RDKit semantics — the
properties the reference one-hots encode (fragnet/dataset/features.py:39-162:
degree, total Hs, hybridization, aromaticity, ring membership, formal charge;
:95-125: bond type, conjugation, ring, E/Z stereo). If minichem perception
diverges from RDKit chemistry on this panel, featurization diverges from the
reference data pipeline — this file is the tripwire.

When RDKit IS importable, test_rdkit_agrees runs the same panel through real
RDKit and must produce identical values (engine.py auto-dispatches; in this
image the minichem branch is exercised, under RDKit both are).
"""

from __future__ import annotations

import numpy as np
import pytest

from fragnet_tpu.chem.smiles import MolFromSmiles

# per-molecule: {"atoms": [(symbol, degree, totalHs, hyb, aromatic, in_ring,
#                charge), ...] (None = don't check that slot),
#                "bonds": [(begin, end, type, conjugated, in_ring, stereo)]}
PANEL = {
    # -- acyclic basics ------------------------------------------------------
    "CCO": {
        "atoms": [("C", 1, 3, "SP3", False, False, 0),
                  ("C", 2, 2, "SP3", False, False, 0),
                  ("O", 1, 1, "SP3", False, False, 0)],
        "bonds": [(0, 1, "SINGLE", False, False, "STEREONONE"),
                  (1, 2, "SINGLE", False, False, "STEREONONE")],
    },
    "C=C": {
        "atoms": [("C", 1, 2, "SP2", False, False, 0),
                  ("C", 1, 2, "SP2", False, False, 0)],
        # an ISOLATED double bond is NOT conjugated (RDKit GetIsConjugated)
        "bonds": [(0, 1, "DOUBLE", False, False, "STEREONONE")],
    },
    "C#N": {
        "atoms": [("C", 1, 1, "SP", False, False, 0),
                  ("N", 1, 0, "SP", False, False, 0)],
        "bonds": [(0, 1, "TRIPLE", False, False, "STEREONONE")],
    },
    "C=CC=C": {  # butadiene: ALL THREE bonds conjugated
        "atoms": None,
        "bonds": [(0, 1, "DOUBLE", True, False, "STEREONONE"),
                  (1, 2, "SINGLE", True, False, "STEREONONE"),
                  (2, 3, "DOUBLE", True, False, "STEREONONE")],
    },
    "CC(=O)O": {  # acetic acid: C–C not conjugated; C=O and C–OH are
        "atoms": [("C", 1, 3, "SP3", False, False, 0),
                  ("C", 3, 0, "SP2", False, False, 0),
                  ("O", 1, 0, "SP2", False, False, 0),
                  ("O", 1, 1, None, False, False, 0)],
        "bonds": [(0, 1, "SINGLE", False, False, "STEREONONE"),
                  (1, 2, "DOUBLE", True, False, "STEREONONE"),
                  (1, 3, "SINGLE", True, False, "STEREONONE")],
    },
    "CC(=O)NC": {  # amide: N lone pair conjugates C=O and C–N
        "atoms": [("C", 1, 3, "SP3", False, False, 0),
                  ("C", 3, 0, "SP2", False, False, 0),
                  ("O", 1, 0, "SP2", False, False, 0),
                  ("N", 2, 1, None, False, False, 0),
                  ("C", 1, 3, "SP3", False, False, 0)],
        "bonds": [(0, 1, "SINGLE", False, False, "STEREONONE"),
                  (1, 2, "DOUBLE", True, False, "STEREONONE"),
                  (1, 3, "SINGLE", True, False, "STEREONONE"),
                  (3, 4, "SINGLE", False, False, "STEREONONE")],
    },
    # -- charge / saturation -------------------------------------------------
    "[NH4+]": {
        "atoms": [("N", 0, 4, None, False, False, 1)],
        "bonds": [],
    },
    "CC(C)(C)C": {
        "atoms": [("C", 1, 3, "SP3", False, False, 0),
                  ("C", 4, 0, "SP3", False, False, 0),
                  ("C", 1, 3, "SP3", False, False, 0),
                  ("C", 1, 3, "SP3", False, False, 0),
                  ("C", 1, 3, "SP3", False, False, 0)],
        "bonds": None,
    },
    "ClC(Br)I": {
        "atoms": [("Cl", 1, 0, None, False, False, 0),
                  ("C", 3, 1, "SP3", False, False, 0),
                  ("Br", 1, 0, None, False, False, 0),
                  ("I", 1, 0, None, False, False, 0)],
        "bonds": None,
    },
    # -- aromatics, lowercase AND Kekulé (must perceive identically) ---------
    "c1ccccc1": {
        "atoms": [("C", 2, 1, "SP2", True, True, 0)] * 6,
        "bonds": [(0, 1, "AROMATIC", True, True, "STEREONONE")],
    },
    "C1=CC=CC=C1": {  # benzene written Kekulé → identical perception
        "atoms": [("C", 2, 1, "SP2", True, True, 0)] * 6,
        "bonds": [(0, 1, "AROMATIC", True, True, "STEREONONE")],
    },
    "c1ccncc1": {
        "atoms": [("C", 2, 1, "SP2", True, True, 0)] * 3
        + [("N", 2, 0, "SP2", True, True, 0)]
        + [("C", 2, 1, "SP2", True, True, 0)] * 2,
        "bonds": None,
    },
    "C1=CC=CO1": {  # furan written Kekulé: aromatic, O contributes the pair
        "atoms": [("C", 2, 1, "SP2", True, True, 0)] * 4
        + [("O", 2, 0, "SP2", True, True, 0)],
        "bonds": [(0, 1, "AROMATIC", True, True, "STEREONONE")],
    },
    "c1cc[nH]c1": {  # pyrrole: aromatic N keeps its H
        "atoms": [("C", 2, 1, "SP2", True, True, 0)] * 3
        + [("N", 2, 1, "SP2", True, True, 0),
           ("C", 2, 1, "SP2", True, True, 0)],
        "bonds": None,
    },
    "C1=CC=CS1": {  # thiophene Kekulé: aromatic, S has 0 Hs
        "atoms": [("C", 2, 1, "SP2", True, True, 0)] * 4
        + [("S", 2, 0, None, True, True, 0)],
        "bonds": None,
    },
    "C1=CC=C2C=CC=CC2=C1": {  # naphthalene Kekulé: all 10 aromatic
        "atoms": [("C", 2, 1, "SP2", True, True, 0)] * 3
        + [("C", 3, 0, "SP2", True, True, 0)]
        + [("C", 2, 1, "SP2", True, True, 0)] * 4
        + [("C", 3, 0, "SP2", True, True, 0),
           ("C", 2, 1, "SP2", True, True, 0)],
        "bonds": None,
    },
    "C1=CCCCC1": {  # cyclohexene: NOT aromatic
        "atoms": [("C", 2, 1, "SP2", False, True, 0),
                  ("C", 2, 1, "SP2", False, True, 0),
                  ("C", 2, 2, "SP3", False, True, 0),
                  ("C", 2, 2, "SP3", False, True, 0),
                  ("C", 2, 2, "SP3", False, True, 0),
                  ("C", 2, 2, "SP3", False, True, 0)],
        "bonds": None,
    },
    "O=C1C=CC(=O)C=C1": {  # benzoquinone: NOT aromatic (RDKit default model)
        "atoms": [("O", 1, 0, "SP2", False, False, 0),
                  ("C", 3, 0, "SP2", False, True, 0)] + [None] * 6,
        "bonds": None,
    },
    # -- double-bond stereo from directional bonds ---------------------------
    "C/C=C/C": {
        "atoms": None,
        "bonds": [(0, 1, "SINGLE", False, False, "STEREONONE"),
                  (1, 2, "DOUBLE", False, False, "STEREOE"),
                  (2, 3, "SINGLE", False, False, "STEREONONE")],
    },
    "C/C=C\\C": {
        "atoms": None,
        "bonds": [(1, 2, "DOUBLE", False, False, "STEREOZ")],
    },
}


@pytest.mark.parametrize("smiles", sorted(PANEL))
def test_minichem_matches_hand_derived_rdkit_truth(smiles):
    exp = PANEL[smiles]
    mol = MolFromSmiles(smiles)
    assert mol is not None, smiles
    if exp["atoms"] is not None:
        assert mol.GetNumAtoms() == len(exp["atoms"])
        for i, want in enumerate(exp["atoms"]):
            if want is None:
                continue
            sym, deg, hs, hyb, arom, ring, chg = want
            a = mol.atoms[i]
            assert a.symbol == sym, (smiles, i)
            assert a.GetDegree() == deg, (smiles, i, "degree")
            assert a.GetTotalNumHs() == hs, (smiles, i, "numH")
            if hyb is not None:
                assert a.GetHybridization() == hyb, (smiles, i, "hyb")
            assert a.GetIsAromatic() == arom, (smiles, i, "aromatic")
            assert a.IsInRing() == ring, (smiles, i, "ring")
            assert a.GetFormalCharge() == chg, (smiles, i, "charge")
    if exp["bonds"] is not None:
        by_pair = {frozenset((b.begin, b.end)): b for b in mol.bonds}
        for (u, v, bt, conj, ring, stereo) in exp["bonds"]:
            b = by_pair[frozenset((u, v))]
            assert b.GetBondType() == bt, (smiles, u, v, "type")
            assert b.GetIsConjugated() == conj, (smiles, u, v, "conj")
            assert b.IsInRing() == ring, (smiles, u, v, "ring")
            assert b.GetStereo() == stereo, (smiles, u, v, "stereo")


def test_one_hot_slots_encode_hand_derived_values():
    """The 167-dim atom one-hot places the hand-derived values at the
    documented offsets (features.py layout: atomic# 0:118, degree 118:129,
    implicit valence 129:136, charge 136:147, radicals 147:152,
    hybridization 152:159, aromatic 159:161, ring 161:163, chirality
    163:166, numH at 166)."""
    from fragnet_tpu.chem.features import FeaturesEXP

    f = FeaturesEXP()
    mol = MolFromSmiles("c1ccncc1")
    af = np.asarray([f.atom_features_one_hot(a) for a in mol.atoms],
                    np.float32)
    n_idx = 3  # the nitrogen
    assert af[n_idx, 7 - 1] == 1            # atomic number 7 → slot 6
    assert af[0, 6 - 1] == 1                # carbon
    assert af[n_idx, 118 + 2] == 1          # degree 2
    assert af[n_idx, 152 + 2] == 1          # SP2 (S, SP, SP2 ordering)
    assert af[n_idx, 159 + 1] == 1          # aromatic = True → [F, T]
    assert af[n_idx, 161 + 1] == 1          # in ring
    assert af[n_idx, 166] == 0              # 0 Hs on pyridine N
    assert af[0, 166] == 1                  # 1 H on the carbons
    assert af.shape[1] == 167


def test_rdkit_agrees_when_available():
    """Under a real RDKit install the same panel must hold for RDKit mols —
    proving the expectations really are RDKit ground truth (auto-skips in
    RDKit-free images)."""
    rdkit = pytest.importorskip("rdkit")
    from rdkit import Chem

    for smiles, exp in PANEL.items():
        mol = Chem.MolFromSmiles(smiles)
        assert mol is not None, smiles
        if exp["atoms"] is not None:
            for i, want in enumerate(exp["atoms"]):
                if want is None:
                    continue
                sym, deg, hs, hyb, arom, ring, chg = want
                a = mol.GetAtomWithIdx(i)
                assert a.GetSymbol() == sym
                assert a.GetDegree() == deg, (smiles, i)
                assert a.GetTotalNumHs() == hs, (smiles, i)
                if hyb is not None:
                    assert str(a.GetHybridization()) == hyb, (smiles, i)
                assert a.GetIsAromatic() == arom, (smiles, i)
                assert a.IsInRing() == ring, (smiles, i)
                assert a.GetFormalCharge() == chg, (smiles, i)
        if exp["bonds"] is not None:
            for (u, v, bt, conj, ring, stereo) in exp["bonds"]:
                b = mol.GetBondBetweenAtoms(u, v)
                assert str(b.GetBondType()) == bt, (smiles, u, v)
                assert b.GetIsConjugated() == conj, (smiles, u, v)
                assert b.IsInRing() == ring, (smiles, u, v)
                assert str(b.GetStereo()) == stereo, (smiles, u, v)
