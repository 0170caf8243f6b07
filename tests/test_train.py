"""Training-stack tests: config, optimizers, trainers, early stopping,
checkpoint import/export, pretrain objective."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fragnet_tpu.config import Config, load_config
from fragnet_tpu.graphs.hiergraph import pad_batch, spec_for
from fragnet_tpu.model.finetune import FragNetFineTune
from fragnet_tpu.train.earlystop import EarlyStopping
from fragnet_tpu.train.loop import (
    TrainerFineTune,
    TrainState,
    bce_masked_loss,
    mse_loss,
)
from fragnet_tpu.train.optim import make_optimizer, make_schedule


def _to_jnp(b):
    return jax.tree.map(lambda x: jnp.asarray(x) if x is not None else None, b)


class TestConfig:
    def test_yaml_and_interpolation(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text(
            "exp_dir: /tmp/e1\n"
            "seed: 7\n"
            "finetune:\n"
            "  lr: 1.0e-4\n"
            "  chk: ${exp_dir}/ft.ckpt\n"
        )
        cfg = load_config(str(p))
        assert cfg.seed == 7
        assert cfg.finetune.lr == 1e-4
        assert cfg.finetune.chk == "/tmp/e1/ft.ckpt"

    def test_overrides_and_get(self):
        cfg = Config({"a": {"b": 1}})
        cfg.set_path("a.c.d", 5)
        assert cfg.get("a.c.d") == 5
        assert cfg.get("missing.key", "dflt") == "dflt"
        cfg.update({"a": {"b": 2}})
        assert cfg.a.b == 2
        assert cfg.get("a.c.d") == 5  # deep merge preserves siblings


class TestLosses:
    def test_mse_ignores_padding(self):
        pred = jnp.array([[1.0], [2.0], [99.0]])
        y = jnp.array([[1.5], [2.5], [0.0]])
        mask = jnp.array([1.0, 1.0, 0.0])
        l = mse_loss(pred, y, mask)
        np.testing.assert_allclose(float(l), 0.25, rtol=1e-6)

    def test_bce_ignores_missing_labels(self):
        pred = jnp.array([[0.0, 5.0], [0.0, -5.0]])
        y = jnp.array([[1.0, -1.0], [0.0, -1.0]])  # second task missing
        mask = jnp.array([1.0, 1.0])
        l = float(bce_masked_loss(pred, y, mask))
        expect = float(np.log(2.0))  # two logit-0 entries, valid only
        np.testing.assert_allclose(l, expect, rtol=1e-5)

    def test_bce_matches_torch_formula(self):
        rng = np.random.default_rng(0)
        logits = rng.standard_normal((6, 3)).astype(np.float32)
        y = (rng.random((6, 3)) > 0.5).astype(np.float32)
        l = float(bce_masked_loss(jnp.asarray(logits), jnp.asarray(y),
                                  jnp.ones(6)))
        sig = 1 / (1 + np.exp(-logits))
        expect = -(y * np.log(sig) + (1 - y) * np.log(1 - sig)).mean()
        np.testing.assert_allclose(l, expect, rtol=1e-4)


class TestEarlyStopping:
    def test_patience_and_best(self, tmp_path):
        saved = {}
        es = EarlyStopping(patience=2, path=str(tmp_path / "b.ckpt"),
                           save_fn=lambda p, path: saved.update(p=p))
        es(1.0, {"w": 1})
        es(0.5, {"w": 2})
        es(0.7, {"w": 3})
        es(0.8, {"w": 4})
        assert es.early_stop
        assert es.best_params == {"w": 2}
        assert saved["p"] == {"w": 2}


class TestTrainLoop:
    def test_loss_decreases(self, ft_graphs):
        spec = spec_for(ft_graphs, batch_size=len(ft_graphs))
        batch = _to_jnp(pad_batch(ft_graphs, spec))
        model = FragNetFineTune(num_layer=1, num_heads=2, emb_dim=32,
                                h1=16, h2=16, h3=16, h4=16, drop_ratio=0.0)
        params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
        tx = make_optimizer("adam", lr=3e-3)
        state = TrainState.create(params, tx)
        trainer = TrainerFineTune(model, tx, target_type="regr")
        rng = jax.random.PRNGKey(1)
        losses = []
        for _ in range(15):
            state, l = trainer.train_epoch(state, [batch], rng)
            losses.append(l)
        assert losses[-1] < losses[0] * 0.8, losses

    def test_test_returns_arrays(self, ft_graphs):
        spec = spec_for(ft_graphs, batch_size=4)
        from fragnet_tpu.data.batcher import BatchLoader

        loader = BatchLoader(ft_graphs, 4, spec=spec)
        model = FragNetFineTune(num_layer=1, num_heads=2, emb_dim=32,
                                h1=16, h2=16, h3=16, h4=16)
        params = model.init(jax.random.PRNGKey(0), next(iter(loader)),
                            deterministic=True)
        tx = make_optimizer("adam", lr=1e-4)
        trainer = TrainerFineTune(model, tx, target_type="regr")
        mse, y, p = trainer.test(params, loader)
        assert y.shape == p.shape == (len(ft_graphs), 1)
        assert np.isfinite(mse)


class TestCheckpoint:
    def test_save_load_roundtrip(self, ft_graphs, tmp_path):
        from fragnet_tpu.train.checkpoint import load_params, save_params

        spec = spec_for(ft_graphs[:2], batch_size=2)
        batch = _to_jnp(pad_batch(ft_graphs[:2], spec))
        model = FragNetFineTune(num_layer=1, num_heads=2, emb_dim=32,
                                h1=16, h2=16, h3=16, h4=16)
        params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
        path = str(tmp_path / "m.ckpt")
        save_params(params, path)
        zeros = jax.tree.map(jnp.zeros_like, params)
        restored = load_params(zeros, path)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
            np.testing.assert_allclose(a, b)

    def test_torch_import_full_coverage(self, ft_graphs):
        """Build a reference-named state_dict (incl. the unused modules that
        live in real checkpoints, per exps/*/pt.pt.data) and import it."""
        import re

        from flax import serialization, traverse_util

        from fragnet_tpu.train.checkpoint import (
            _torch_key_to_flax,
            import_torch_state_dict,
        )

        spec = spec_for(ft_graphs[:2], batch_size=2)
        batch = _to_jnp(pad_batch(ft_graphs[:2], spec))
        num_layer, emb, heads = 2, 32, 2
        model = FragNetFineTune(num_layer=num_layer, num_heads=heads,
                                emb_dim=emb, h1=16, h2=16, h3=16, h4=16,
                                fthead="FTHead3")
        params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)

        # build the torch-style dict from the flax params via inverse mapping
        flat = traverse_util.flatten_dict(
            serialization.to_state_dict(params)["params"]
        )
        rng = np.random.default_rng(0)
        sd = {}
        for path, v in flat.items():
            v = np.asarray(v)
            newv = rng.standard_normal(v.shape).astype(np.float32)
            if path[0] == "pretrain":
                layer = path[1].replace("layers_", "layers.")
                rest = ".".join(path[2:])
                rest = rest.replace("kernel", "weight")
                key = f"pretrain.{layer}.{rest}" if rest else f"pretrain.{layer}"
            else:  # head
                rest = list(path[1:])
                if rest[0] == "_MLPHead_0":
                    rest = rest[1:]
                key = "fthead." + ".".join(rest).replace(
                    "predictor_", "predictor."
                ).replace("kernel", "weight")
            sd[key] = newv.T if path[-1] == "kernel" else newv
        # add the unused reference modules — importer must skip them
        for i in range(num_layer):
            sd[f"pretrain.layers.{i}.atom_embed.weight"] = np.zeros((emb, emb))
            sd[f"pretrain.layers.{i}.bias"] = np.zeros((emb,))
            sd[f"pretrain.layers.{i}.frag_mlp.0.weight"] = np.zeros((2 * emb, emb))

        imported = import_torch_state_dict(sd, template=params, strict=True)
        iflat = traverse_util.flatten_dict(
            serialization.to_state_dict(imported)["params"]
        )
        for path, v in flat.items():
            got = iflat[path]
            assert np.asarray(got).shape == np.asarray(v).shape
        # every reference key either mapped or deliberately skipped
        for key in sd:
            mapped = _torch_key_to_flax(key)
            if mapped is not None:
                assert mapped in iflat, key

    def test_pretrain_transfer(self, ft_graphs):
        from fragnet_tpu.model.pretrain import FragNetPreTrain
        from fragnet_tpu.train.checkpoint import transfer_pretrained_encoder

        spec = spec_for(ft_graphs[:2], batch_size=2)
        batch = _to_jnp(pad_batch(ft_graphs[:2], spec))
        kw = dict(num_layer=1, num_heads=2, emb_dim=32)
        ft = FragNetFineTune(**kw, h1=8, h2=8, h3=8, h4=8)
        pt = FragNetPreTrain(**kw)
        ft_params = ft.init(jax.random.PRNGKey(0), batch, deterministic=True)
        pt_params = pt.init(jax.random.PRNGKey(9), batch, deterministic=True)
        merged = transfer_pretrained_encoder(ft_params, pt_params)
        a = merged["params"]["pretrain"]["layers_0"]["a_b"]
        b = pt_params["params"]["pretrain"]["layers_0"]["a_b"]
        np.testing.assert_allclose(a, b)
        # head untouched
        h0 = ft_params["params"]["head"]
        h1 = merged["params"]["head"]
        for x, y in zip(jax.tree.leaves(h0), jax.tree.leaves(h1)):
            np.testing.assert_allclose(x, y)


class TestPretrainObjective:
    def test_loss_and_step(self):
        from fragnet_tpu.chem import engine
        from fragnet_tpu.graphs.build import GraphBuilder
        from fragnet_tpu.model.pretrain import FragNetPreTrain
        from fragnet_tpu.train.pretrain import PretrainTrainer, pretrain_loss

        b = GraphBuilder("exp1s", add_dhangles=True)
        graphs = []
        for s in ["CCO", "CCC"]:
            mol, conf = engine.mol_3d(s)
            graphs.append(b.build(mol, conf, [conf.energy], smiles=s))
        spec = spec_for(graphs, batch_size=2)
        batch = _to_jnp(pad_batch(graphs, spec, with_targets=True))
        model = FragNetPreTrain(num_layer=1, emb_dim=32, num_heads=2)
        params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
        preds = model.apply(params, batch, deterministic=True)
        l = pretrain_loss(preds, batch)
        assert np.isfinite(float(l)) and float(l) > 0
        # compat mode differs (drops the length term, doubles dihedral)
        l2 = pretrain_loss(preds, batch, compat_loss_overwrite=True)
        assert float(l2) != float(l)

        tx = make_optimizer("adam", lr=1e-3)
        state = TrainState.create(params, tx)
        trainer = PretrainTrainer(model, tx)
        state, l_first = trainer.train_epoch(state, [batch], jax.random.PRNGKey(1))
        for _ in range(10):
            state, l_last = trainer.train_epoch(state, [batch], jax.random.PRNGKey(2))
        assert l_last < l_first


class TestSchedules:
    def test_factories(self):
        assert make_schedule(None, 1e-3) == 1e-3
        s = make_schedule("cosine_warmup", 1e-3, total_steps=100, warmup_steps=10)
        assert float(s(0)) < float(s(10))
        s2 = make_schedule("linear", 1e-3, warmup_steps=10)
        assert float(s2(0)) < float(s2(20))
        with pytest.raises(ValueError):
            make_schedule("bogus", 1e-3)
