"""Tests for target-standardized finetuning (finetune_norm.py analog), the
k-fold CV driver (gat2_cv.py analog), and HP task objectives."""

import os

import numpy as np
import pytest

from fragnet_tpu.config import Config


def _tiny_opt(tmp_path, **ft_extra):
    ft = {
        "data": {"name": "esol", "n_synthetic": 24, "split": "random"},
        "model": {"num_layer": 1, "num_heads": 2, "emb_dim": 32,
                  "h1": 16, "h2": 16, "h3": 16, "h4": 16,
                  "fthead": "FTHead3", "drop_ratio": 0.0},
        "target_type": "regr",
        "batch_size": 8,
        "lr": 1e-3,
        "n_epochs": 2,
        "es_patience": 5,
    }
    ft.update(ft_extra)
    return Config({
        "seed": 0,
        "exp_dir": str(tmp_path / "exp"),
        "model_version": "gat2",
        "finetune": ft,
    })


@pytest.fixture(scope="module")
def tiny_datasets():
    """Featurize once for all tests in this module."""
    from fragnet_tpu.data.datasets import build_graphs
    from fragnet_tpu.data.synthetic import synthetic_dataset

    df = synthetic_dataset(n=24, seed=0)
    tcol = [c for c in df.columns if c != "smiles"][0]
    graphs = build_graphs(list(df["smiles"]), [[y] for y in df[tcol]])
    assert len(graphs) >= 18
    tr = graphs[:12]
    va = graphs[12:16]
    te = graphs[16:]
    return tr, va, te, 1, "regr"


class TestStandardize:
    def test_standardized_run_matches_scale(self, tmp_path, tiny_datasets):
        from fragnet_tpu.train.finetune import run_finetune

        opt = _tiny_opt(tmp_path, standardize=True)
        value, params = run_finetune(opt, quiet=True, datasets=tiny_datasets)
        # metric must be in raw label space (not standardized units)
        ys = np.concatenate([np.asarray(g.y).reshape(-1)
                             for g in tiny_datasets[0]])
        assert np.isfinite(value)
        assert value < 10 * (np.abs(ys).max() + 1)

    def test_standardized_steps_eval_raw_space(self):
        import jax
        import jax.numpy as jnp
        import optax

        from fragnet_tpu.train.loop import TrainState
        from fragnet_tpu.train.tasks import make_standardized_ft_steps

        class Const:
            """Predicts zero; eval output must equal the label mean."""

            def apply(self, params, batch, deterministic=True, rngs=None):
                return jnp.zeros_like(batch.y)

        from collections import namedtuple

        B = namedtuple("B", ["y", "graph_mask"])  # namedtuples are pytrees
        b = B(y=jnp.array([[2.0], [4.0]]), graph_mask=jnp.ones((2,)))
        tx = optax.sgd(0.0)
        _, ev = make_standardized_ft_steps(Const(), tx, np.array([3.0]),
                                           np.array([1.0]))
        loss, out = ev(None, b)
        np.testing.assert_allclose(np.asarray(out), [[3.0], [3.0]], atol=1e-5)
        np.testing.assert_allclose(float(loss), 1.0, atol=1e-4)


class TestCV:
    def test_cv_runs_all_folds(self, tmp_path, tiny_datasets, monkeypatch):
        from fragnet_tpu.train import cv as cv_mod

        opt = _tiny_opt(tmp_path)
        tr, va, te, n_tasks, task = tiny_datasets

        monkeypatch.setattr(
            "fragnet_tpu.train.finetune.load_datasets",
            lambda _opt: (tr, va, te, n_tasks, task))
        mean, std, scores = cv_mod.run_finetune_cv(opt, n_folds=3, quiet=True)
        assert len(scores) == 3
        assert np.isfinite(mean) and np.isfinite(std)
        assert os.path.exists(os.path.join(opt.exp_dir, "cv_scores.pkl"))


class TestHPTasks:
    def test_clf_objective_negates(self, tmp_path, monkeypatch):
        from fragnet_tpu.hp import search

        calls = []

        def fake_run_finetune(opt, quiet=True):
            calls.append(opt)
            return 0.8, None  # ROC-AUC

        monkeypatch.setattr(
            "fragnet_tpu.train.finetune.run_finetune", fake_run_finetune)
        opt = _tiny_opt(tmp_path)
        study = search.run_hp_search(
            opt, n_trials=2, backend="builtin", task="clf",
            storage=str(tmp_path / "hp.sqlite"))
        best = study.best_trial
        assert best is not None
        assert best[1] == pytest.approx(-0.8)

    def test_dta_task_delegates(self, tmp_path, monkeypatch):
        from fragnet_tpu.hp import search

        def fake_run_task(task, opt, quiet=True):
            assert task == "dta"
            return 1.23, None

        monkeypatch.setattr(
            "fragnet_tpu.train.tasks.run_task", fake_run_task)
        opt = _tiny_opt(tmp_path)
        study = search.run_hp_search(
            opt, n_trials=1, backend="builtin", task="dta",
            storage=str(tmp_path / "hp2.sqlite"))
        assert study.best_trial[1] == pytest.approx(1.23)
