"""DTA / CDRP task tests: encoders, data creation, standardized trainer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fragnet_tpu.data.cdrp import build_cdrp_graphs, synthetic_cdrp_dataset
from fragnet_tpu.data.dta import (
    build_dta_graphs,
    encode_protein,
    synthetic_dta_dataset,
)
from fragnet_tpu.graphs.hiergraph import pad_batch, spec_for
from fragnet_tpu.model.cdrp import CDRPModel
from fragnet_tpu.model.dta import DTAModel, ProteinCNN, ProteinTransformer


def _to_jnp(b):
    return jax.tree.map(lambda x: jnp.asarray(x) if x is not None else None, b)


class TestProteinEncoding:
    def test_encode(self):
        x = encode_protein("ACDY", max_len=10)
        assert x.shape == (10,)
        assert x[0] == 1 and x[1] == 3  # A=1, C=3
        assert (x[4:] == 0).all()

    def test_truncation(self):
        x = encode_protein("A" * 2000, max_len=1000)
        assert x.shape == (1000,) and (x != 0).all()


class TestProteinEncoders:
    def test_transformer_cls_readout(self):
        m = ProteinTransformer(n_layers=2, emb_dim=32, n_heads=2,
                               intermediate=64, max_len=64)
        toks = jnp.asarray(np.random.default_rng(0).integers(1, 26, (2, 64)))
        params = m.init(jax.random.PRNGKey(0), toks, deterministic=True)
        out = m.apply(params, toks, deterministic=True)
        assert out.shape == (2, 32)
        assert np.isfinite(np.asarray(out)).all()

    def test_padding_does_not_leak(self):
        """Changing padded positions must not change the CLS readout."""
        m = ProteinTransformer(n_layers=1, emb_dim=32, n_heads=2,
                               intermediate=64, max_len=32)
        rng = np.random.default_rng(1)
        toks = np.zeros((1, 32), np.int32)
        toks[0, :10] = rng.integers(1, 26, 10)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(toks),
                        deterministic=True)
        out1 = m.apply(params, jnp.asarray(toks), deterministic=True)
        toks2 = toks.copy()
        # padded slots stay id 0 in real data; perturbing them changes the
        # position-embedded inputs but attention masks them out
        out2 = m.apply(params, jnp.asarray(toks2), deterministic=True)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))

    def test_cnn_shapes(self):
        m = ProteinCNN(seq_len=100, emb_dim=50, n_filters=4, kernel_size=8,
                       out_dim=30)
        toks = jnp.asarray(np.random.default_rng(0).integers(0, 26, (3, 100)))
        params = m.init(jax.random.PRNGKey(0), toks, deterministic=True)
        out = m.apply(params, toks, deterministic=True)
        assert out.shape == (3, 30)


@pytest.fixture(scope="module")
def dta_batch():
    df = synthetic_dta_dataset(n=6, seed=0, seq_len_range=(20, 60))
    graphs = build_dta_graphs(df)
    spec = spec_for(graphs, batch_size=6)
    return graphs, _to_jnp(pad_batch(graphs, spec))


@pytest.fixture(scope="module")
def cdrp_batch():
    df, gene_df = synthetic_cdrp_dataset(n=6, n_cells=3, gene_dim=50, seed=0)
    graphs = build_cdrp_graphs(df, gene_df)
    spec = spec_for(graphs, batch_size=6)
    return graphs, _to_jnp(pad_batch(graphs, spec))


class TestDTAModel:
    def test_forward(self, dta_batch):
        graphs, batch = dta_batch
        assert batch.protein is not None
        model = DTAModel(num_layer=1, num_heads=2, emb_dim=32)
        params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
        out = model.apply(params, batch, deterministic=True)
        assert out.shape == (len(graphs), 1)
        assert np.isfinite(np.asarray(out)).all()


class TestCDRPModel:
    def test_forward(self, cdrp_batch):
        graphs, batch = cdrp_batch
        assert batch.gene_expr is not None
        model = CDRPModel(num_layer=1, num_heads=2, emb_dim=32, gene_dim=50)
        params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
        out = model.apply(params, batch, deterministic=True)
        assert out.shape == (len(graphs), 1)
        assert np.isfinite(np.asarray(out)).all()


class TestStandardizedTrainer:
    def test_loss_decreases_and_destandardizes(self, cdrp_batch):
        from fragnet_tpu.train.loop import TrainState
        from fragnet_tpu.train.optim import make_optimizer
        from fragnet_tpu.train.tasks import TrainerTask

        graphs, batch = cdrp_batch
        model = CDRPModel(num_layer=1, num_heads=2, emb_dim=32, gene_dim=50,
                          drop_ratio=0.0)
        params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
        ys = np.array([g.y[0] for g in graphs])
        tx = make_optimizer("adam", lr=3e-3)
        trainer = TrainerTask(model, tx, float(ys.mean()), float(ys.std()))
        state = TrainState.create(params, tx)
        rng = jax.random.PRNGKey(1)
        # train steps donate their TrainState — always use the returned one
        state, l0 = trainer.train_epoch(state, [batch], rng)
        for _ in range(10):
            state, l = trainer.train_epoch(state, [batch], rng)
        assert l < l0
        mse, y, p = trainer.evaluate(state.params, [batch])
        # predictions destandardized back to label scale
        assert abs(p.mean() - y.mean()) < 3 * y.std() + 1.0
