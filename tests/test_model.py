"""Model tests: forward shapes, padding invariance, masking-hook semantics,
gradients, pretrain head, attention extraction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fragnet_tpu.graphs.hiergraph import PadSpec, pad_batch, spec_for
from fragnet_tpu.model.finetune import FragNetFineTune
from fragnet_tpu.model.layers import LayerHooks
from fragnet_tpu.model.pretrain import FragNetPreTrain


def _to_jnp(b):
    return jax.tree.map(lambda x: jnp.asarray(x) if x is not None else None, b)


@pytest.fixture(scope="module")
def model_and_params(ft_graphs):
    spec = spec_for(ft_graphs, batch_size=len(ft_graphs))
    batch = _to_jnp(pad_batch(ft_graphs, spec))
    model = FragNetFineTune(num_layer=2, num_heads=4, emb_dim=64,
                            h1=32, h2=32, h3=32, h4=32)
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    return model, params, batch, spec


class TestForward:
    def test_shapes_and_finite(self, model_and_params, ft_graphs):
        model, params, batch, _ = model_and_params
        pred = model.apply(params, batch, deterministic=True)
        assert pred.shape == (len(ft_graphs), 1)
        assert np.isfinite(np.asarray(pred)).all()

    def test_padding_invariance(self, model_and_params, ft_graphs):
        model, params, batch, spec = model_and_params
        pred1 = np.asarray(model.apply(params, batch, deterministic=True))
        big = PadSpec(
            n_graphs=spec.n_graphs + 5,
            n_atoms=spec.n_atoms + 128,
            n_edges=spec.n_edges + 96,
            n_frags=spec.n_frags + 32,
            n_fconn=spec.n_fconn + 32,
            n_bg_edges=spec.n_bg_edges + 256,
            n_fc_edges=spec.n_fc_edges + 64,
        )
        batch2 = _to_jnp(pad_batch(ft_graphs, big))
        pred2 = np.asarray(model.apply(params, batch2, deterministic=True))
        np.testing.assert_allclose(
            pred1[: len(ft_graphs)], pred2[: len(ft_graphs)], rtol=2e-3, atol=2e-5
        )

    def test_batch_equals_individual(self, model_and_params, ft_graphs):
        """Batched predictions match one-molecule-at-a-time predictions —
        the graph-isolation property of the collate+mask design."""
        model, params, batch, spec = model_and_params
        pred_b = np.asarray(model.apply(params, batch, deterministic=True))
        for i, g in enumerate(ft_graphs[:3]):
            s1 = spec_for([g], batch_size=1)
            b1 = _to_jnp(pad_batch([g], s1))
            p1 = np.asarray(model.apply(params, b1, deterministic=True))
            # different padded shapes → different XLA matmul tilings → fp32
            # accumulation-order noise; outputs at random init are ~1e-3 so
            # compare with an absolute tolerance.
            np.testing.assert_allclose(pred_b[i], p1[0], atol=5e-4)

    def test_dropout_rng(self, model_and_params):
        model, params, batch, _ = model_and_params
        p1 = model.apply(params, batch, deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(1)})
        p2 = model.apply(params, batch, deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(2)})
        assert not np.allclose(np.asarray(p1), np.asarray(p2))

    def test_grad_flows(self, model_and_params):
        model, params, batch, _ = model_and_params

        def loss(p):
            out = model.apply(p, batch, deterministic=True)
            return jnp.sum((out[:, 0] - batch.y[:, 0]) ** 2 * batch.graph_mask)

        g = jax.grad(loss)(params)
        leaves = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        total = sum(float(jnp.abs(l).sum()) for l in leaves)
        assert total > 0


class TestHooks:
    def test_atom_mask_changes_pred(self, model_and_params):
        model, params, batch, _ = model_and_params
        base = np.asarray(model.apply(params, batch, deterministic=True))
        hooks = [LayerHooks(atom_mask=jnp.asarray(0))] * model.num_layer
        masked = np.asarray(
            model.apply(params, batch, deterministic=True, hooks=hooks)
        )
        assert not np.allclose(base[0], masked[0])

    def test_negative_index_noop(self, model_and_params):
        model, params, batch, _ = model_and_params
        base = np.asarray(model.apply(params, batch, deterministic=True))
        hooks = [
            LayerHooks(
                atom_mask=jnp.asarray(-1),
                bond_mask=jnp.asarray(-5),
                frag_bond_mask=jnp.asarray(-3),
            )
        ] * model.num_layer
        same = np.asarray(model.apply(params, batch, deterministic=True, hooks=hooks))
        np.testing.assert_allclose(base, same, rtol=1e-6)

    def test_attention_extraction(self, model_and_params, ft_graphs):
        model, params, batch, _ = model_and_params
        pred, attn = model.apply(
            params, batch, deterministic=True, return_attentions=True
        )
        assert attn.atoms.shape[0] == batch.x_atoms.shape[0]
        assert attn.frags.shape[0] == batch.x_frags.shape[0]
        assert attn.bonds.shape[0] == batch.edge_src.shape[0]
        assert attn.fbonds.shape[0] == batch.nf_fbonds.shape[0]
        assert np.isfinite(np.asarray(attn.atoms)).all()


class TestPretrainModel:
    def test_forward(self, ft_graphs):
        from fragnet_tpu.chem import engine
        from fragnet_tpu.graphs.build import GraphBuilder

        b = GraphBuilder("exp1s", add_dhangles=True)
        graphs = []
        for s in ["CCO", "CCCO", "c1ccccc1"]:
            mol, conf = engine.mol_3d(s)
            graphs.append(b.build(mol, conf, [conf.energy], smiles=s))
        spec = spec_for(graphs, batch_size=4)
        batch = _to_jnp(pad_batch(graphs, spec, with_targets=True))
        model = FragNetPreTrain(num_layer=2, emb_dim=64)
        params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
        bl, ba, da, e = model.apply(params, batch, deterministic=True)
        assert bl.shape == (batch.edge_src.shape[0], 1)
        assert ba.shape == (batch.x_atoms.shape[0], 1)
        assert da.shape == (batch.edge_src.shape[0], 1)
        assert e.shape == (batch.y.shape[0], 1)
        for t in (bl, ba, da, e):
            assert np.isfinite(np.asarray(t)).all()
