"""Chemistry layer tests: SMILES parsing, perception, features, fragmentation,
scaffolds, geometry. (The reference has no tests; strategy per SURVEY.md §4.)"""

import numpy as np
import pytest

from fragnet_tpu.chem import engine
from fragnet_tpu.chem.features import ATOM_FDIM, BOND_FDIM, FeaturesEXP
from fragnet_tpu.chem.fragments import FragmentedMol, find_brics_bonds_fallback
from fragnet_tpu.chem.smiles import MolFromSmiles, MolToSmiles, canonical_smiles


class TestSmilesParser:
    def test_ethanol(self):
        m = MolFromSmiles("CCO")
        assert m.GetNumAtoms() == 3
        assert m.GetNumBonds() == 2
        assert [a.symbol for a in m.atoms] == ["C", "C", "O"]
        assert m.atoms[0].GetTotalNumHs() == 3
        assert m.atoms[2].GetTotalNumHs() == 1

    def test_benzene_aromatic_and_kekule(self):
        m1 = MolFromSmiles("c1ccccc1")
        m2 = MolFromSmiles("C1=CC=CC=C1")
        for m in (m1, m2):
            assert all(a.is_aromatic for a in m.atoms)
            assert all(b.is_aromatic for b in m.bonds)
            assert all(a.in_ring for a in m.atoms)
            assert all(a.GetTotalNumHs() == 1 for a in m.atoms)

    def test_charges(self):
        m = MolFromSmiles("[NH4+].[Cl-]")
        assert m.atoms[0].formal_charge == 1
        assert m.atoms[0].GetTotalNumHs() == 4
        assert m.atoms[1].formal_charge == -1
        assert len(m.connected_components()) == 2

    def test_ring_closures_and_branches(self):
        m = MolFromSmiles("CC1(C)CC1")  # gem-dimethyl cyclopropane
        assert m.GetNumAtoms() == 5
        ring_atoms = [a.idx for a in m.atoms if a.in_ring]
        assert len(ring_atoms) == 3

    def test_chirality(self):
        m = MolFromSmiles("C[C@H](N)C(=O)O")
        tags = [a.chiral_tag for a in m.atoms]
        assert "CHI_TETRAHEDRAL_CCW" in tags

    def test_triple_bond(self):
        m = MolFromSmiles("C#N")
        assert m.bonds[0].order == "TRIPLE"
        assert m.atoms[0].hybridization == "SP"

    def test_percent_ring(self):
        m = MolFromSmiles("C%10CCCCC%10")
        assert m.GetNumAtoms() == 6
        assert all(a.in_ring for a in m.atoms)

    def test_bad_smiles_returns_none(self):
        assert MolFromSmiles("C1CC") is None       # unclosed ring
        assert MolFromSmiles("C((C)") is None      # unbalanced parens
        assert MolFromSmiles("") is None

    def test_canonical_roundtrip_stable(self):
        for s in [
            "CCO", "c1ccccc1", "CC(=O)Oc1ccccc1C(=O)O",
            "CN1C=NC2=C1C(=O)N(C)C(=O)N2C", "[Na+].[Cl-]",
            "Clc1ccc(cc1)C(c1ccccc1)N1CCN(CC1)CCOCCO",
        ]:
            c1 = canonical_smiles(s)
            assert c1 is not None
            c2 = canonical_smiles(c1)
            assert c1 == c2, (s, c1, c2)

    def test_canonical_invariant_to_atom_order(self):
        # same molecule written from different starting atoms
        assert canonical_smiles("OCC") == canonical_smiles("CCO")
        assert canonical_smiles("c1ccccc1C") == canonical_smiles("Cc1ccccc1")


class TestPerception:
    def test_hybridization(self):
        m = MolFromSmiles("C=CC#CCO")
        hybs = [a.hybridization for a in m.atoms]
        assert hybs[0] == "SP2" and hybs[1] == "SP2"
        assert hybs[2] == "SP" and hybs[3] == "SP"
        assert hybs[4] == "SP3"

    def test_conjugation(self):
        m = MolFromSmiles("C=CC=C")  # butadiene: all three bonds conjugated
        assert all(b.is_conjugated for b in m.bonds)
        m2 = MolFromSmiles("CCCC")
        assert not any(b.is_conjugated for b in m2.bonds)

    def test_add_hs_layout(self):
        m = MolFromSmiles("CO").add_hs()
        # heavy atoms first, then Hs grouped by parent (RDKit AddHs layout)
        assert [a.symbol for a in m.atoms] == ["C", "O", "H", "H", "H", "H"]
        assert m.atoms[0].GetTotalNumHs() == 0  # AddHs semantics
        assert m.atoms[0].GetDegree() == 4      # neighbors incl. H
        assert m.atoms[0].GetImplicitValence() == 0


class TestFeatures:
    def test_dims(self):
        f = FeaturesEXP()
        m = MolFromSmiles("CC(=O)Oc1ccccc1C(=O)O").add_hs()
        node_f, ei, ea = f.get_atom_and_bond_features_atom_graph_one_hot(m, True)
        assert len(node_f[0]) == ATOM_FDIM == 167
        assert len(ea[0]) == BOND_FDIM == 17
        assert len(ei[0]) == 2 * m.GetNumBonds()
        # directed edges come in (begin,end),(end,begin) pairs per bond
        assert ei[0][0] == ei[1][1] and ei[1][0] == ei[0][1]

    def test_atom_onehot_contents(self):
        f = FeaturesEXP()
        m = MolFromSmiles("C").add_hs()
        v = f.atom_features_one_hot(m.atoms[0])
        # atomic number 6 → index 5 hot
        assert v[5] == 1 and v.sum() >= 5
        # degree 4 (4 Hs) → degree block index 118+4
        assert v[118 + 4] == 1

    def test_connection_features(self):
        f = FeaturesEXP()
        m = MolFromSmiles("CCOCC").add_hs()
        fm = FragmentedMol(m, None, "brics")
        feats = [f.connection_features_one_hot(c) for c in fm.connections]
        for v in feats:
            assert len(v) == 6
            assert sum(v) == 1


class TestFragmentation:
    def test_single_fragment_self_connection(self):
        m = MolFromSmiles("C1CCCCC1").add_hs()
        fm = FragmentedMol(m, None, "brics")
        assert len(fm.fragments) == 1
        assert len(fm.connections) == 1
        assert fm.connections[0].bond_type == "self_cn"

    def test_disconnected_iso_cn3(self):
        m = MolFromSmiles("[Na+].[Cl-]").add_hs()
        fm = FragmentedMol(m, None, "brics")
        assert len(fm.fragments) == 2
        assert any(c.bond_type == "iso_cn3" for c in fm.connections)

    def test_atom_to_frag_covers_all(self):
        m = MolFromSmiles("CC(=O)Oc1ccccc1C(=O)O").add_hs()
        fm = FragmentedMol(m, None, "brics")
        assert sorted(fm.atom_to_frag_id.keys()) == list(range(m.GetNumAtoms()))
        n = len(fm.fragments)
        assert set(fm.atom_to_frag_id.values()) == set(range(n))

    def test_murcko_fragmentation(self):
        m = MolFromSmiles("CCc1ccccc1").add_hs()
        fm = FragmentedMol(m, None, "murcko")
        assert len(fm.fragments) >= 2

    def test_brics_no_single_atom_frags(self):
        m = MolFromSmiles("CCOC(=O)c1ccccc1").add_hs()
        bonds = find_brics_bonds_fallback(m)
        fm = FragmentedMol(m, None, "brics")
        for frag in fm.fragments:
            heavy = [a for a in frag.atom_indices if m.atoms[a].symbol != "H"]
            assert len(heavy) >= 1


class TestScaffolds:
    def test_aspirin_scaffold_is_benzene(self):
        assert engine.murcko_scaffold_smiles("CC(=O)Oc1ccccc1C(=O)O") == "c1ccccc1"

    def test_no_ring_scaffold_empty(self):
        assert engine.murcko_scaffold_smiles("CCO") == ""

    def test_linker_carbonyl_kept(self):
        s = engine.murcko_scaffold_smiles("c1ccccc1C(=O)Nc1ccccc1")
        assert "O" in s and s.count("1") >= 2


class TestGeometry:
    def test_bond_lengths_reasonable(self):
        mol, conf = engine.mol_3d("CCO")
        pos = conf.GetPositions()
        assert pos.shape == (9, 3)
        d = np.linalg.norm(pos[0] - pos[1])
        assert 1.3 < d < 1.7  # C-C

    def test_deterministic(self):
        _, c1 = engine.mol_3d("CC(=O)O")
        _, c2 = engine.mol_3d("CC(=O)O")
        np.testing.assert_allclose(c1.GetPositions(), c2.GetPositions())

    def test_angle_api(self):
        mol, conf = engine.mol_3d("CCC")
        ang = conf.angle_rad(0, 1, 2)
        assert 1.6 < ang < 2.2  # ~109.5° = 1.91 rad


class TestLegacyFeatures0:
    """Legacy 13-symbol featurizer (data types exp0/exp01s) — reference
    fragnet/dataset/features0.py dims and dispatch (data.py:333-337)."""

    def test_dims(self):
        from fragnet_tpu.chem.features import ATOM_FDIM0, BOND_FDIM0
        from fragnet_tpu.graphs.build import GraphBuilder

        mol, conf = engine.mol_3d("CCO")
        g = GraphBuilder("exp01s").build(mol, conf, [1.0], smiles="CCO")
        assert g.x_atoms.shape[1] == ATOM_FDIM0 == 38
        assert g.edge_attr.shape[1] == BOND_FDIM0 == 11

    def test_symbol_onehot_and_counts(self):
        from fragnet_tpu.chem.features import FeaturesEXP0

        mol, _ = engine.mol_3d("CCO")
        f = FeaturesEXP0()
        assert f.use_bond_chirality is False
        heavy = [a for a in mol.GetAtoms() if a.GetAtomicNum() > 1]
        v = f.atom_features_one_hot(heavy[0])  # carbon
        assert v[1] == 1 and v[:13].sum() == 1  # "C" slot
        vo = f.atom_features_one_hot(heavy[2])  # oxygen
        assert vo[9] == 1  # "O" slot
        # charge/radical are raw counts, not one-hots (features0.py:66-67)
        assert v[27] == 0 and v[28] == 0

    def test_unknown_symbol_maps_last(self):
        from fragnet_tpu.chem.features import FeaturesEXP0

        mol, _ = engine.mol_3d("CC[Si](C)(C)C" if False else "CCO")
        f = FeaturesEXP0()

        class FakeAtom:
            def GetAtomicNum(self): return 14  # Si — not in the 13-list
            def GetDegree(self): return 4
            def GetImplicitValence(self): return 0
            def GetFormalCharge(self): return 0
            def GetNumRadicalElectrons(self): return 0
            def GetHybridization(self): return "SP3"
            def GetIsAromatic(self): return False
            def IsInRing(self): return False
            def GetTotalNumHs(self): return 0

        v = f.atom_features_one_hot(FakeAtom())
        assert v[12] == 1  # "Unknown"

    def test_dispatch(self):
        from fragnet_tpu.chem.features import (FeaturesEXP, FeaturesEXP0,
                                               feature_creator_for)

        assert isinstance(feature_creator_for("exp0"), FeaturesEXP0)
        assert isinstance(feature_creator_for("exp01s"), FeaturesEXP0)
        assert isinstance(feature_creator_for("exp1s"), FeaturesEXP)

    def test_end_to_end_model(self):
        """An exp01s graph must run through the model (dims are configurable)."""
        import jax
        import jax.numpy as jnp

        from fragnet_tpu.graphs.build import GraphBuilder
        from fragnet_tpu.graphs.hiergraph import pad_batch, spec_for
        from fragnet_tpu.model.finetune import FragNetFineTune

        mol, conf = engine.mol_3d("CCO")
        g = GraphBuilder("exp01s").build(mol, conf, [1.0], smiles="CCO")
        spec = spec_for([g], batch_size=1)
        batch = jax.tree.map(
            lambda x: jnp.asarray(x) if x is not None else None,
            pad_batch([g], spec))
        model = FragNetFineTune(num_layer=1, num_heads=2, emb_dim=16,
                                h1=8, h2=8, h3=8, h4=8)
        params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
        out = model.apply(params, batch, deterministic=True)
        assert out.shape[-1] == 1
