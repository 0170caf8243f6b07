"""Interpretability tests: attention extraction, vmapped attributions,
renderings, HTML report."""

import os

import jax
import numpy as np
import pytest

from fragnet_tpu.interp.attention import FragNetInterpreter
from fragnet_tpu.model.finetune import FragNetFineTune


@pytest.fixture(scope="module")
def interp():
    model = FragNetFineTune(num_layer=2, num_heads=2, emb_dim=32,
                            h1=16, h2=16, h3=16, h4=16, drop_ratio=0.0)
    it = FragNetInterpreter(model, None)
    g, mol, batch = it.featurize("CCO")
    it.params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    return it


class TestInterpretation:
    def test_weights_shapes(self, interp):
        res = interp.interpret("CC(=O)Oc1ccccc1C(=O)O", with_contributions=False)
        g = res.graph
        assert res.atom_weights.shape == (g.n_atoms,)
        assert res.bond_weights.shape == (g.n_edges // 2,)
        assert res.frag_weights.shape == (g.n_frags,)
        assert np.isfinite(res.prediction)
        # min-max scaled into [0, 1]
        for w in (res.atom_weights, res.bond_weights, res.frag_weights):
            assert w.min() >= 0.0 and w.max() <= 1.0 + 1e-6

    def test_contributions(self, interp):
        res = interp.interpret("CCOC(=O)CC", with_contributions=True)
        g = res.graph
        assert res.atom_contrib.shape == (g.n_atoms,)
        assert res.frag_contrib.shape == (g.n_frags,)
        assert np.isfinite(res.atom_contrib).all()
        # masking an atom must change the prediction for at least one atom
        assert np.abs(res.atom_contrib).max() > 0

    def test_attribution_matches_manual_single_mask(self, interp):
        """vmapped attribution equals a manual one-at-a-time masked forward."""
        import jax.numpy as jnp

        from fragnet_tpu.model.layers import LayerHooks

        g, mol, batch = interp.featurize("CCO")
        model, params = interp.model, interp.params
        base = float(model.apply(params, batch, deterministic=True)[0, 0])
        hooks = [LayerHooks(atom_mask=jnp.asarray(1))] * model.num_layer
        masked = float(
            model.apply(params, batch, deterministic=True, hooks=hooks)[0, 0]
        )
        from fragnet_tpu.interp.attribution import atom_contributions

        contrib = atom_contributions(model, params, batch, g.n_atoms)
        np.testing.assert_allclose(contrib[1], base - masked, rtol=1e-4,
                                   atol=1e-7)

    def test_invalid_smiles_raises(self, interp):
        with pytest.raises(ValueError):
            interp.interpret("not_a_smiles((")


class TestRender:
    def test_draw_and_report(self, interp, tmp_path):
        from fragnet_tpu.interp.render import draw_molecule, render_report

        res = interp.interpret("CCOC(=O)CC", with_contributions=True)
        png = draw_molecule(res.mol, atom_colors=res.atom_weights)
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        out = render_report(res, str(tmp_path / "r.html"))
        html = open(out).read()
        assert "prediction" in html and "data:image/png;base64" in html


class TestConnectionBondMap:
    def test_fconn_real_bonds_cut_bonds(self):
        """Each BRICS connection maps to the real bond it cuts
        (viz.py:366-393)."""
        from fragnet_tpu.chem import engine
        from fragnet_tpu.chem.fragments import FragmentedMol
        from fragnet_tpu.interp.attention import fconn_real_bonds

        mol, conf = engine.mol_3d("CC(=O)Oc1ccccc1C(=O)O")
        fm = FragmentedMol(mol, conf)
        pairs = fconn_real_bonds(fm)
        assert len(pairs) == len(fm.connections)
        real_bonds = {frozenset((b.begin, b.end)) for b in mol.bonds}
        for cn, (i, j) in zip(fm.connections, pairs):
            if cn.bond_id is not None:
                assert frozenset((i, j)) in real_bonds

    def test_iso_cn3_fallback_spans_components(self):
        from fragnet_tpu.chem import engine
        from fragnet_tpu.chem.fragments import FragmentedMol
        from fragnet_tpu.interp.attention import fconn_real_bonds

        mol, conf = engine.mol_3d("[Na+].[Cl-].CCO")
        fm = FragmentedMol(mol, conf)
        pairs = fconn_real_bonds(fm)
        iso = [p for cn, p in zip(fm.connections, pairs)
               if cn.bond_type == "iso_cn3"]
        assert iso, "expected iso_cn3 connections for a disconnected mol"
        for i, j in iso:
            assert i != j

    def test_result_carries_fconn_bonds_and_report_renders(self, interp,
                                                           tmp_path):
        from fragnet_tpu.interp.render import render_report

        res = interp.interpret("CC(=O)Oc1ccccc1C(=O)O",
                               with_contributions=False)
        assert res.fconn_bonds is not None
        assert len(res.fconn_bonds) >= 1
        out = str(tmp_path / "report.html")
        render_report(res, out)
        html = open(out).read()
        assert "connection" in html
