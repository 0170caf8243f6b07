"""HP search tests: space sampling, study persistence/resume, pruning,
TPE-lite convergence on a cheap analytic objective."""

import os
import random

import numpy as np
import pytest

from fragnet_tpu.config import Config
from fragnet_tpu.hp.search import (
    FAILURE_SCORE,
    Param,
    SearchSpace,
    Study,
    fragnet_search_space,
    run_hp_search,
)


class TestSearchSpace:
    def test_fragnet_space_sampling(self):
        space = fragnet_search_space()
        rng = random.Random(0)
        for _ in range(20):
            s = space.sample(rng)
            assert s["drop_ratio"] in (0.0, 0.1, 0.2, 0.3)
            assert 64 <= s["h1"] <= 2048 and s["h1"] % 64 == 0
            assert s["batch_size"] in (16, 32, 64, 128)
            assert 1e-5 <= s["lr"] <= 1e-3


class TestStudy:
    def test_persistence_and_resume(self, tmp_path):
        db = str(tmp_path / "s.sqlite")
        s1 = Study(db, name="t")
        tid = s1.start_trial({"x": 1.0})
        s1.finish_trial(tid, 0.5)
        s2 = Study(db, name="t")  # reopen = resume
        assert s2.n_complete == 1
        assert s2.best_trial == ({"x": 1.0}, 0.5)

    def test_failure_sentinel(self, tmp_path):
        db = str(tmp_path / "s.sqlite")
        study = Study(db, name="t")
        space = SearchSpace([Param("x", "float", low=0, high=1)])

        calls = []

        def objective(params, handle):
            calls.append(params)
            if len(calls) == 2:
                raise RuntimeError("boom")
            return params["x"]

        study.optimize(objective, space, n_trials=3)
        rows = study.conn.execute(
            "SELECT value, state FROM trials ORDER BY id"
        ).fetchall()
        assert rows[1] == (FAILURE_SCORE, "FAIL")
        assert len(rows) == 3

    def test_pruning(self, tmp_path):
        db = str(tmp_path / "s.sqlite")
        study = Study(db, name="t")
        # seed reports at step 0 from 5 fake trials
        for i, v in enumerate([0.1, 0.2, 0.3, 0.4, 0.5]):
            study.conn.execute("INSERT INTO reports VALUES (?,?,?)", (i, 0, v))
        study.conn.commit()
        assert study.should_prune(99, 0, 0.9)      # above median
        assert not study.should_prune(98, 0, 0.05) # below median

    def test_tpe_converges_on_quadratic(self, tmp_path):
        db = str(tmp_path / "s.sqlite")
        study = Study(db, name="q", n_startup=6, seed=1)
        space = SearchSpace([Param("x", "float", low=-2, high=2)])

        def objective(params, handle):
            return (params["x"] - 0.7) ** 2

        study.optimize(objective, space, n_trials=40)
        best_params, best_val = study.best_trial
        assert best_val < 0.15, (best_params, best_val)


class TestEndToEnd:
    def test_run_hp_search_with_stub_trainer(self, tmp_path):
        cfg = Config({
            "exp_dir": str(tmp_path),
            "finetune": {"model": {}, "batch_size": 16, "lr": 1e-4},
        })
        seen = []

        def train_fn(opt):
            seen.append(opt.finetune.model.h1)
            # prefer small h1 — check the study records and improves
            return float(opt.finetune.model.h1)

        study = run_hp_search(cfg, n_trials=6, backend="builtin",
                              train_fn=train_fn,
                              storage=str(tmp_path / "hp.sqlite"))
        assert study.n_complete == 6
        assert len(seen) == 6
        assert study.best_trial[1] == min(seen)


class TestBackendDelegation:
    """Execute the hyperopt / ray delegation paths (reference hp/hp.py,
    hpray.py) against minimal API stubs — neither package ships in this
    image, so these validate the glue (space construction, objective
    wiring, failure handling), not the external optimizers."""

    def _stub_hyperopt(self, calls):
        import sys
        import types

        m = types.ModuleType("hyperopt")

        class _Expr:
            def __init__(self, name, kind, args):
                self.name, self.kind, self.args = name, kind, args

        hp = types.SimpleNamespace(
            choice=lambda name, opts: _Expr(name, "choice", opts),
            loguniform=lambda name, lo, hi: _Expr(name, "loguniform", (lo, hi)),
        )

        class Trials(list):
            pass

        def fmin(objective, space, algo=None, max_evals=0, trials=None):
            import math
            import random

            rng = random.Random(0)
            for _ in range(max_evals):
                params = {}
                for k, e in space.items():
                    if e.kind == "choice":
                        params[k] = rng.choice(list(e.args))
                    else:
                        lo, hi = e.args
                        params[k] = math.exp(rng.uniform(lo, hi))
                loss = objective(params)
                calls.append((params, loss))
                trials.append({"params": params, "loss": loss})
            return {}

        m.hp = hp
        m.tpe = types.SimpleNamespace(suggest=object())
        m.Trials = Trials
        m.fmin = fmin
        sys.modules["hyperopt"] = m
        return m

    def test_hyperopt_backend(self, tmp_path, monkeypatch):
        import sys

        from fragnet_tpu.config import Config
        from fragnet_tpu.hp import search as hps

        calls = []
        self._stub_hyperopt(calls)
        try:
            seen = []

            def train_fn(cfg):
                seen.append(cfg)
                return float(cfg.finetune.model.h1) / 2048.0

            base = Config({"finetune": {"model": {}, }})
            trials = hps._run_hyperopt(base, 3, train_fn)
            assert len(calls) == 3 and len(seen) == 3
            # injected params reached the config
            assert all("h1" in c["params"] for c in [
                {"params": p} for p, _ in calls])
            for cfg in seen:
                assert cfg.finetune.model.h1 % 64 == 0
                assert cfg.finetune.get("lr") is not None
        finally:
            sys.modules.pop("hyperopt", None)

    def test_hyperopt_failure_score(self, monkeypatch):
        import sys

        from fragnet_tpu.config import Config
        from fragnet_tpu.hp import search as hps

        calls = []
        self._stub_hyperopt(calls)
        try:
            def train_fn(cfg):
                raise RuntimeError("boom")

            hps._run_hyperopt(Config({"finetune": {"model": {}}}), 2,
                              train_fn)
            assert all(loss == hps.FAILURE_SCORE for _, loss in calls)
        finally:
            sys.modules.pop("hyperopt", None)

    def test_ray_backend(self):
        import sys
        import types

        from fragnet_tpu.config import Config
        from fragnet_tpu.hp import search as hps

        reported = []

        class _Expr:
            def __init__(self, opts):
                self.opts = opts

        tune = types.ModuleType("ray.tune")
        tune.choice = lambda opts: _Expr(list(opts))
        tune.loguniform = lambda lo, hi: _Expr([lo, hi])
        tune.report = lambda d: reported.append(d)

        class TuneConfig:
            def __init__(self, **kw):
                self.kw = kw

        class Tuner:
            def __init__(self, trainable, param_space=None, tune_config=None):
                self.trainable = trainable
                self.space = param_space
                self.n = tune_config.kw["num_samples"]

            def fit(self):
                import random

                rng = random.Random(1)
                for _ in range(self.n):
                    params = {}
                    for k, e in self.space.items():
                        params[k] = rng.choice(e.opts) if len(e.opts) != 2 \
                            or isinstance(e.opts[0], str) else e.opts[0]
                    self.trainable(params)
                return reported

        tune.TuneConfig = TuneConfig
        tune.Tuner = Tuner
        ray = types.ModuleType("ray")
        ray.tune = tune
        sys.modules["ray"] = ray
        sys.modules["ray.tune"] = tune
        try:
            def train_fn(cfg):
                return 0.5

            out = hps._run_ray(Config({"finetune": {"model": {}}}), 2,
                               train_fn)
            assert len(out) == 2
            assert all(r["score"] == 0.5 for r in out)
        finally:
            sys.modules.pop("ray", None)
            sys.modules.pop("ray.tune", None)


class TestBackendDelegation:
    """hyperopt / ray / optuna delegation seams exercised with FAKE modules
    (VERDICT r4 #8): the space translation and objective wrapping must match
    the builtin backend's semantics — same dotted injection paths, same
    value domains, same 1000.0 failure sentinel."""

    _ACTS = ["relu", "silu", "gelu", "celu", "selu", "rrelu", "relu6",
             "prelu", "leakyrelu"]

    def _base(self, tmp_path):
        from fragnet_tpu.config import Config

        return Config({"exp_dir": str(tmp_path), "finetune": {"model": {}}})

    def _check_params_and_injection(self, params, opt):
        from fragnet_tpu.hp import search as S

        assert params["drop_ratio"] in (0.0, 0.1, 0.2, 0.3)
        for k in ("h1", "h2", "h3", "h4"):
            assert params[k] in range(64, 2049, 64)
            assert opt.get(f"finetune.model.{k}") == params[k]
        assert params["act"] in self._ACTS
        assert params["batch_size"] in (16, 32, 64, 128)
        assert 1e-5 <= params["lr"] <= 1e-3
        assert opt.get("finetune.model.drop_ratio") == params["drop_ratio"]
        assert opt.get("finetune.model.act") == params["act"]
        assert opt.get("finetune.batch_size") == params["batch_size"]
        assert opt.get("finetune.lr") == params["lr"]

    def test_hyperopt_backend_with_fake(self, tmp_path, monkeypatch):
        import math
        import random
        import sys
        import types

        from fragnet_tpu.hp import search as S

        mod = types.ModuleType("hyperopt")
        mod.hp = types.SimpleNamespace(
            choice=lambda name, opts: ("choice", name, list(opts)),
            loguniform=lambda name, lo, hi: ("log", name, lo, hi))
        mod.tpe = types.SimpleNamespace(suggest="tpe")

        class Trials:
            def __init__(self):
                self.results = []

        def fmin(objective, space, algo=None, max_evals=0, trials=None):
            rng = random.Random(0)
            for _ in range(max_evals):
                params = {}
                for k, spec in space.items():
                    if spec[0] == "choice":
                        params[k] = rng.choice(spec[2])
                    else:
                        params[k] = math.exp(rng.uniform(
                            spec[2], spec[3]))
                trials.results.append(
                    {"loss": objective(params), "params": params})
            return {}

        mod.fmin, mod.Trials = fmin, Trials
        monkeypatch.setitem(sys.modules, "hyperopt", mod)

        seen = []

        def train_fn(opt):
            seen.append(opt)
            if len(seen) == 2:
                raise RuntimeError("boom")  # must become the sentinel
            return float(opt.get("finetune.model.h1"))

        trials = S.run_hp_search(self._base(tmp_path), n_trials=3,
                                 backend="hyperopt", train_fn=train_fn)
        assert len(trials.results) == 3 and len(seen) == 3
        assert trials.results[1]["loss"] == S.FAILURE_SCORE
        for r, opt in zip(trials.results, seen):
            self._check_params_and_injection(r["params"], opt)
        assert trials.results[0]["loss"] == float(
            trials.results[0]["params"]["h1"])

    def test_ray_backend_with_fake(self, tmp_path, monkeypatch):
        import math
        import random
        import sys
        import types

        from fragnet_tpu.hp import search as S

        results = []
        reported = []
        tune = types.ModuleType("ray.tune")
        tune.choice = lambda opts: ("choice", list(opts))
        tune.loguniform = lambda lo, hi: ("log", lo, hi)
        tune.report = lambda metrics: reported.append(metrics)

        class TuneConfig:
            def __init__(self, num_samples=1, metric=None, mode=None):
                self.num_samples = num_samples

        class Tuner:
            def __init__(self, trainable, param_space=None, tune_config=None):
                self.trainable = trainable
                self.space = param_space
                self.cfg = tune_config

            def fit(self):
                rng = random.Random(0)
                for _ in range(self.cfg.num_samples):
                    params = {}
                    for k, spec in self.space.items():
                        if spec[0] == "choice":
                            params[k] = rng.choice(spec[1])
                        else:
                            params[k] = math.exp(rng.uniform(
                                math.log(spec[1]), math.log(spec[2])))
                    self.trainable(params)
                    results.append(params)
                return reported

        tune.TuneConfig, tune.Tuner = TuneConfig, Tuner
        ray = types.ModuleType("ray")
        ray.tune = tune
        monkeypatch.setitem(sys.modules, "ray", ray)
        monkeypatch.setitem(sys.modules, "ray.tune", tune)

        seen = []

        def train_fn(opt):
            seen.append(opt)
            if len(seen) == 1:
                raise ValueError("boom")
            return float(opt.get("finetune.batch_size"))

        out = S.run_hp_search(self._base(tmp_path), n_trials=2,
                              backend="ray", train_fn=train_fn)
        assert out is reported and len(reported) == 2 and len(seen) == 2
        assert reported[0]["score"] == S.FAILURE_SCORE
        for params, opt in zip(results, seen):
            self._check_params_and_injection(params, opt)
        assert reported[1]["score"] == float(results[1]["batch_size"])

    def test_optuna_backend_with_fake(self, tmp_path, monkeypatch):
        import random
        import sys
        import types

        from fragnet_tpu.hp import search as S

        created = {}

        class FakeTrial:
            def __init__(self, rng):
                self.rng = rng
                self.params = {}

            def suggest_categorical(self, name, choices):
                v = self.rng.choice(list(choices))
                self.params[name] = v
                return v

            def suggest_int(self, name, lo, hi, step=1):
                n = (hi - lo) // step
                v = lo + step * self.rng.randint(0, n)
                self.params[name] = v
                return v

            def suggest_float(self, name, lo, hi, log=False):
                import math

                v = math.exp(self.rng.uniform(math.log(lo), math.log(hi))) \
                    if log else self.rng.uniform(lo, hi)
                self.params[name] = v
                return v

            def report(self, value, step):
                pass

            def should_prune(self):
                return False

        class FakeStudy:
            def __init__(self):
                self.trials = []

            def optimize(self, objective, n_trials=1):
                rng = random.Random(0)
                for _ in range(n_trials):
                    t = FakeTrial(rng)
                    v = objective(t)
                    self.trials.append((t.params, v))

        mod = types.ModuleType("optuna")

        def create_study(**kw):
            created.update(kw)
            return FakeStudy()

        mod.create_study = create_study
        mod.TrialPruned = type("TrialPruned", (Exception,), {})
        mod.exceptions = types.SimpleNamespace(TrialPruned=mod.TrialPruned)
        monkeypatch.setitem(sys.modules, "optuna", mod)

        seen = []

        def train_fn(opt):
            seen.append(opt)
            if len(seen) == 2:
                raise RuntimeError("boom")
            return float(opt.get("finetune.model.h2"))

        study = S.run_hp_search(self._base(tmp_path), n_trials=3,
                                backend="optuna", train_fn=train_fn)
        assert len(study.trials) == 3 and len(seen) == 3
        assert study.trials[1][1] == S.FAILURE_SCORE
        assert created.get("direction") == "minimize"
        assert created.get("load_if_exists") is True
        for (params, _v), opt in zip(study.trials, seen):
            self._check_params_and_injection(params, opt)
