"""Generate the golden chem fixtures (tests/fixtures/chem_golden.npz).

Snapshots atom/bond features, fragment decompositions, and Murcko scaffolds
for a fixed SMILES panel through whichever chemistry backend
``fragnet_tpu.chem.engine`` dispatches to. Run this in an environment WITH
RDKit to produce RDKit-ground-truth fixtures (engine.py prefers RDKit when
importable); the vendored npz then bounds minichem's drift from RDKit in
environments without it (VERDICT r1, weak #5).

    python tests/gen_chem_fixtures.py [out.npz]
"""

import sys

import numpy as np

# the panel covers: simple chains, aromatics, fused rings, charges/salts,
# disconnected components, chirality, heteroaromatics, carbonyls
PANEL = [
    "CCO",
    "CC(=O)O",
    "c1ccccc1",
    "c1ccc2ccccc2c1",
    "CC(=O)Oc1ccccc1C(=O)O",
    "CN1C=NC2=C1C(=O)N(C)C(=O)N2C",
    "[Na+].[Cl-]",
    "[Na+].[Cl-].CCO",
    "C[C@H](N)C(=O)O",
    "c1ccncc1",
    "C1CCCCC1",
    "OCC(O)C(O)C(O)C(O)CO",
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
    "O=C(Nc1ccccc1)c1ccccc1",
    "CCOC(=O)c1ccccc1N",
]


def build_fixture() -> dict:
    from fragnet_tpu.chem import engine
    from fragnet_tpu.chem.features import FeaturesEXP
    from fragnet_tpu.chem.fragments import FragmentedMol

    feats = FeaturesEXP()
    out = {"smiles": np.array(PANEL), "backend": np.array(engine.backend_name())}
    for i, s in enumerate(PANEL):
        r = engine.mol_3d(s, seed=42)
        assert r is not None, s
        mol, conf = r
        af, bf, ei = feats.get_atom_and_bond_features_atom_graph_one_hot(
            mol, use_chirality=True)
        out[f"atom_feat_{i}"] = np.asarray(af, np.float32)
        out[f"bond_feat_{i}"] = np.asarray(bf, np.float32)
        out[f"edge_index_{i}"] = np.asarray(ei, np.int32)
        fm = FragmentedMol(mol, conf)
        frag_sets = [sorted(f.atom_indices) for f in fm.fragments]
        out[f"frag_atoms_{i}"] = np.array(
            [x for fs in frag_sets for x in ([-1] + fs)], np.int32)
        out[f"conn_types_{i}"] = np.array(
            sorted(c.bond_type for c in fm.connections))
        sc = engine.murcko_scaffold_smiles(s)
        out[f"scaffold_{i}"] = np.array(sc if sc is not None else "")
    return out


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else "tests/fixtures/chem_golden.npz"
    import os

    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **build_fixture())
    print(f"wrote {path}")
