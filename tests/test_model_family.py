"""Tests for the transformer post-processing + ablation model family
(reference gat2.py:832-1106, gat.py, gcn/gcn.py, gcn/gcn3.py): every
``model_version`` in the reference finetune entry (finetune_gat2.py:92-211)
must resolve and run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fragnet_tpu.graphs.hiergraph import PadSpec, pad_batch, spec_for
from fragnet_tpu.model.transformer import (
    FragNetFineTuneMultiTask,
    FragNetFineTuneTransformer,
    FragNetFineTuneTransformer2,
    MultiheadAttention,
    TransformerConv,
)


def _to_jnp(b):
    return jax.tree.map(lambda x: jnp.asarray(x) if x is not None else None, b)


@pytest.fixture(scope="module")
def small_batch(ft_graphs):
    spec = spec_for(ft_graphs, batch_size=len(ft_graphs))
    return _to_jnp(pad_batch(ft_graphs, spec)), spec


ENC_KW = dict(num_layer=2, num_heads=4, emb_dim=64,
              atom_features=167, frag_features=167, edge_features=17)


class TestTransformerConv:
    def test_matches_dense_reference(self):
        """TransformerConv vs a per-node dense softmax computed in numpy."""
        rng = np.random.default_rng(0)
        N, E, D, H = 7, 12, 8, 2
        x = rng.normal(size=(N, 16)).astype(np.float32)
        src = rng.integers(0, N, size=E).astype(np.int32)
        dst = rng.integers(0, N, size=E).astype(np.int32)
        emask = np.ones((E,), np.float32)
        nmask = np.ones((N,), np.float32)

        m = TransformerConv(out_channels=D, heads=H)
        params = m.init(jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(src),
                        jnp.asarray(dst), jnp.asarray(emask), jnp.asarray(nmask))
        out = np.asarray(m.apply(params, jnp.asarray(x), jnp.asarray(src),
                                 jnp.asarray(dst), jnp.asarray(emask),
                                 jnp.asarray(nmask)))

        p = params["params"]
        def lin(name, v):
            return v @ np.asarray(p[name]["kernel"]) + np.asarray(p[name]["bias"])
        q = lin("lin_query", x).reshape(N, H, D)
        k = lin("lin_key", x).reshape(N, H, D)
        v = lin("lin_value", x).reshape(N, H, D)
        skip = lin("lin_skip", x)
        expect = skip.copy()
        for i in range(N):
            for h in range(H):
                idx = np.where(dst == i)[0]
                if len(idx) == 0:
                    continue
                logits = np.array(
                    [q[i, h] @ k[src[e], h] / np.sqrt(D) for e in idx])
                w = np.exp(logits - logits.max())
                w = w / w.sum()
                agg = sum(wj * v[src[e], h] for wj, e in zip(w, idx))
                expect[i, h * D:(h + 1) * D] += agg
        np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


class TestDenseMHA:
    def test_matches_per_molecule_softmax(self):
        """Dense per-molecule attention equals an explicit per-molecule
        computation (the reference's pad_sequence path, gat2.py:950-979)."""
        rng = np.random.default_rng(1)
        counts = [3, 5, 2]
        G, N = len(counts), sum(counts)
        D = 16
        x = rng.normal(size=(N, D)).astype(np.float32)
        batch_ids = np.repeat(np.arange(G), counts).astype(np.int32)
        mask = np.ones((N,), np.float32)

        m = MultiheadAttention(input_dim=D, embed_dim=D, num_heads=4,
                               max_seq_len=8)
        params = m.init(jax.random.PRNGKey(2), jnp.asarray(x),
                        jnp.asarray(batch_ids), jnp.asarray(mask), G)
        out = np.asarray(m.apply(params, jnp.asarray(x),
                                 jnp.asarray(batch_ids), jnp.asarray(mask), G))

        p = params["params"]
        qkv = x @ np.asarray(p["qkv_proj"]["kernel"]) + np.asarray(
            p["qkv_proj"]["bias"])
        H, Dh = 4, D // 4
        expect = np.zeros((N, D), np.float32)
        start = 0
        for g, c in enumerate(counts):
            blk = qkv[start:start + c].reshape(c, H, 3 * Dh).transpose(1, 0, 2)
            q, k, v = np.split(blk, 3, axis=-1)  # (H, c, Dh)
            vals = np.zeros((H, c, Dh), np.float32)
            for h in range(H):
                logits = q[h] @ k[h].T / np.sqrt(Dh)
                w = np.exp(logits - logits.max(-1, keepdims=True))
                w = w / w.sum(-1, keepdims=True)
                vals[h] = w @ v[h]
            expect[start:start + c] = vals.transpose(1, 0, 2).reshape(c, D)
            start += c
        expect = expect @ np.asarray(p["o_proj"]["kernel"]) + np.asarray(
            p["o_proj"]["bias"])
        np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)

    def test_padding_rows_ignored(self):
        """Extra padded rows must not change any real output."""
        rng = np.random.default_rng(2)
        N, D, G = 6, 8, 2
        x = rng.normal(size=(N, D)).astype(np.float32)
        ids = np.array([0, 0, 0, 1, 1, 1], np.int32)
        mask = np.ones((N,), np.float32)
        m = MultiheadAttention(input_dim=D, embed_dim=D, num_heads=2,
                               max_seq_len=8)
        params = m.init(jax.random.PRNGKey(3), jnp.asarray(x),
                        jnp.asarray(ids), jnp.asarray(mask), G)
        out = np.asarray(m.apply(params, jnp.asarray(x), jnp.asarray(ids),
                                 jnp.asarray(mask), G))
        xp = np.concatenate([x, rng.normal(size=(4, D)).astype(np.float32)])
        idsp = np.concatenate([ids, np.zeros((4,), np.int32)])
        maskp = np.concatenate([mask, np.zeros((4,), np.float32)])
        outp = np.asarray(m.apply(params, jnp.asarray(xp), jnp.asarray(idsp),
                                  jnp.asarray(maskp), G))
        np.testing.assert_allclose(outp[:N], out, rtol=1e-5, atol=1e-6)
        assert np.abs(outp[N:]).max() == 0.0


class TestTransformerModels:
    @pytest.mark.parametrize("cls,extra", [
        (FragNetFineTuneTransformer, {}),
        (FragNetFineTuneTransformer2,
         dict(num_attn_layer2=1, num_attn_heads2=2, max_seq_len=32)),
    ])
    def test_forward(self, small_batch, cls, extra):
        batch, _ = small_batch
        model = cls(n_classes=1, h1=32, **ENC_KW, **extra)
        params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
        pred = model.apply(params, batch, deterministic=True)
        assert pred.shape == (batch.y.shape[0], 1)
        assert np.isfinite(np.asarray(pred)[
            np.asarray(batch.graph_mask) > 0]).all()

    def test_transformer2_padding_invariance(self, ft_graphs, small_batch):
        batch, spec = small_batch
        model = FragNetFineTuneTransformer2(
            n_classes=1, h1=32, num_attn_layer2=1, num_attn_heads2=2,
            max_seq_len=32, **ENC_KW)
        params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
        pred = np.asarray(model.apply(params, batch, deterministic=True))
        big = PadSpec(
            n_graphs=spec.n_graphs + 3, n_atoms=spec.n_atoms + 64,
            n_edges=spec.n_edges + 64, n_frags=spec.n_frags + 16,
            n_fconn=spec.n_fconn + 16, n_bg_edges=spec.n_bg_edges + 128,
            n_fc_edges=spec.n_fc_edges + 32,
        )
        batch2 = _to_jnp(pad_batch(ft_graphs, big))
        pred2 = np.asarray(model.apply(params, batch2, deterministic=True))
        np.testing.assert_allclose(
            pred2[: len(ft_graphs)], pred[: len(ft_graphs)],
            rtol=2e-4, atol=2e-5)

    def test_multitask_shapes(self, small_batch):
        batch, _ = small_batch
        model = FragNetFineTuneMultiTask(
            n_classes=1, n_multi_task_heads=3, flatten_output=False, **ENC_KW)
        params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
        pred = model.apply(params, batch, deterministic=True)
        assert pred.shape == (batch.y.shape[0], 3, 1)
        # flattened (trainable) form: (G, n_tasks)
        flat = FragNetFineTuneMultiTask(
            n_classes=1, n_multi_task_heads=3, **ENC_KW)
        pred2 = flat.apply(params, batch, deterministic=True)
        assert pred2.shape == (batch.y.shape[0], 3)
        np.testing.assert_allclose(np.asarray(pred2),
                                   np.asarray(pred)[:, :, 0])

    def test_multitask_trains_on_masked_bce(self, small_batch, ft_graphs,
                                            tmp_path):
        """End-to-end: gat2_multitask as a 2-task classifier through
        run_finetune (the reference's multitask trainer flow,
        train/utils.py:547-637)."""
        from fragnet_tpu.config import Config
        from fragnet_tpu.train.finetune import run_finetune

        rng = np.random.default_rng(0)
        graphs = []
        for g in ft_graphs:
            import copy

            g2 = copy.deepcopy(g)
            g2.y = rng.integers(0, 2, size=2).astype(np.float32)
            graphs.append(g2)
        opt = Config({
            "seed": 0,
            "exp_dir": str(tmp_path / "mt"),
            "model_version": "gat2_multitask",
            "finetune": {
                "model": {"num_layer": 1, "num_heads": 2, "emb_dim": 32,
                          "drop_ratio": 0.0},
                "target_type": "clsf", "batch_size": 4, "lr": 1e-3,
                "n_epochs": 2, "es_patience": 5,
            },
        })
        value, _ = run_finetune(
            opt, quiet=True,
            datasets=(graphs, graphs[:4], graphs[4:], 2, "clsf"))
        assert np.isfinite(value)

    def test_transformer_frag_params_exist_but_unused(self, small_batch):
        """gat2.py:877-878 quirk: frag_transformer in checkpoint, not in
        forward when compat_shared_transformer."""
        batch, _ = small_batch
        model = FragNetFineTuneTransformer(n_classes=1, h1=32, **ENC_KW)
        params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
        assert "frag_transformer" in params["params"]
        # perturbing frag_transformer params must not change the output
        pred = np.asarray(model.apply(params, batch, deterministic=True))
        mut = jax.tree.map(lambda x: x, params)
        ft = mut["params"]["frag_transformer"]
        mut["params"]["frag_transformer"] = jax.tree.map(
            lambda x: x + 1.0, ft)
        pred2 = np.asarray(model.apply(mut, batch, deterministic=True))
        np.testing.assert_allclose(pred2, pred)


class TestAblations:
    @pytest.mark.parametrize("mv", ["gat", "gcn", "gcn3"])
    def test_forward_and_grads(self, small_batch, mv):
        from fragnet_tpu.model import ablations

        batch, _ = small_batch
        fn = {"gat": ablations.FragNetFineTuneV1,
              "gcn": ablations.FragNetFineTuneGCNv1,
              "gcn3": ablations.FragNetFineTuneGIN}[mv]
        model = fn(n_classes=1, num_layer=2, emb_dim=64)
        params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
        pred = model.apply(params, batch, deterministic=True)
        assert pred.shape == (batch.y.shape[0], 1)
        mask = np.asarray(batch.graph_mask) > 0
        assert np.isfinite(np.asarray(pred)[mask]).all()

        def loss(p):
            out = model.apply(p, batch, deterministic=True)
            return jnp.sum((out[:, 0] * batch.graph_mask) ** 2)

        grads = jax.grad(loss)(params)
        leaves = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


class TestBuildModelRegistry:
    @pytest.mark.parametrize("mv", [
        "gat2", "gat2_lite", "gat2_edge", "gcn2", "gat", "gcn", "gcn3",
        "gat2_transformer", "gat2_transformer2", "gat2_multitask",
    ])
    def test_every_model_version_resolves(self, small_batch, mv):
        """Parity with finetune_gat2.py:92-211 model_version dispatch."""
        from fragnet_tpu.config import Config
        from fragnet_tpu.train.finetune import build_model

        batch, _ = small_batch
        opt = Config({
            "model_version": mv,
            "finetune": {"model": {
                "num_layer": 2, "num_heads": 4, "emb_dim": 64,
                "h1": 32, "h2": 32, "h3": 32, "h4": 32,
                "num_attn_layer2": 1, "num_attn_heads2": 2,
                "max_seq_len": 32,
            }},
        })
        model = build_model(opt, n_classes=1)
        params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
        pred = model.apply(params, batch, deterministic=True)
        assert pred.shape[0] == batch.y.shape[0]
