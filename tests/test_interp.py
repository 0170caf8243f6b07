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
