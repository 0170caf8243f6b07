"""Fast-path policy tests (train/fastpath.py): the bench-grade path (TCSR /
bf16 / HBM caching) must be the production path, resolved consistently by
every training entry, with config overrides honored."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from fragnet_tpu.config import Config
from fragnet_tpu.train import fastpath


def _section(**kw):
    return Config({"finetune": kw}).finetune


class TestResolve:
    def test_cpu_defaults(self):
        # conftest pins JAX_PLATFORMS=cpu → no tcsr, f32
        fp = fastpath.resolve(_section(), model_version="gat2")
        assert fp.tcsr is False
        assert fp.dtype == jnp.float32
        assert fp.cache == "auto"

    def test_explicit_overrides(self):
        fp = fastpath.resolve(_section(tcsr=True, dtype="bf16", cache="on"),
                              model_version="gat2")
        assert fp.tcsr is True
        assert fp.dtype == jnp.bfloat16
        assert fp.cache == "on"
        assert fp.dtype_name == "bf16"

    def test_non_tcsr_family_never_defaults_on(self):
        for mv in ("gat2_lite", "gat2_edge", "gcn2", "gat", "gcn", "gcn3"):
            fp = fastpath.resolve(_section(), model_version=mv)
            assert fp.tcsr is False, mv
            assert not fastpath.supports_dtype(mv)

    def test_tcsr_families(self):
        for mv in ("gat2", "gat2_transformer", "gat2_masked2"):
            assert mv in fastpath.TCSR_FAMILIES
            assert fastpath.supports_dtype(mv)

    def test_dist_mode_disables_tcsr_default(self):
        fp = fastpath.resolve(_section(), model_version="gat2",
                              dist_mode="ep")
        assert fp.tcsr is False

    def test_bad_values(self):
        with pytest.raises(ValueError):
            fastpath.resolve(_section(dtype="fp8"))
        with pytest.raises(ValueError):
            fastpath.resolve(_section(cache="maybe"))


class TestCache:
    def _loader(self, ft_graphs):
        from fragnet_tpu.data.batcher import BatchLoader
        from fragnet_tpu.graphs.hiergraph import spec_for

        spec = spec_for(ft_graphs, batch_size=4)
        return BatchLoader(ft_graphs, 4, spec=spec), spec

    def test_on_wraps(self, ft_graphs):
        from fragnet_tpu.data.batcher import DeviceCacheLoader

        loader, spec = self._loader(ft_graphs)
        wrapped = fastpath.maybe_cache(loader, spec=spec, policy="on")
        assert isinstance(wrapped, DeviceCacheLoader)
        assert len(list(wrapped)) == len(loader)

    def test_off_passthrough(self, ft_graphs):
        loader, spec = self._loader(ft_graphs)
        assert fastpath.maybe_cache(loader, spec=spec, policy="off") is loader

    def test_auto_respects_budget(self, ft_graphs):
        from fragnet_tpu.data.batcher import DeviceCacheLoader

        loader, spec = self._loader(ft_graphs)
        small = fastpath.maybe_cache(loader, spec=spec, policy="auto",
                                     budget=1)  # nothing fits 1 byte
        assert small is loader
        big = fastpath.maybe_cache(loader, spec=spec, policy="auto")
        assert isinstance(big, DeviceCacheLoader)

    def test_padded_batch_bytes_positive(self, ft_graphs):
        _, spec = self._loader(ft_graphs)
        b = fastpath.padded_batch_bytes(spec, n_tasks=3)
        assert b > spec.n_atoms * 167 * 4


def test_epoch_message_edges(ft_graphs):
    per_graph = sum(
        g.n_edges + g.n_atoms + g.n_bg_edges + g.n_fconn + g.n_fc_edges
        for g in ft_graphs)
    assert fastpath.epoch_message_edges(ft_graphs, num_layer=4) \
        == float(per_graph) * 4


def test_finetune_entry_uses_fastpath(ft_graphs, tmp_path):
    """End-to-end: run_finetune with cache=on + explicit tcsr=True executes
    the cached loaders and the TCSR spec on CPU (Pallas interpret mode) and
    still produces a checkpoint + predictions."""
    from fragnet_tpu.train.finetune import run_finetune

    opt = Config({
        "seed": 3,
        "exp_dir": str(tmp_path),
        "model_version": "gat2",
        "finetune": {
            "model": {"num_layer": 1, "emb_dim": 32, "num_heads": 2,
                      "h1": 16, "h2": 16, "h3": 16, "h4": 16},
            "batch_size": 4, "lr": 1e-3, "n_epochs": 2, "es_patience": 5,
            "target_type": "regr", "cache": "on", "tcsr": True,
            "dtype": "f32",
        },
    })
    n = len(ft_graphs)
    datasets = (list(ft_graphs), list(ft_graphs)[: max(2, n // 2)],
                list(ft_graphs)[: max(2, n // 2)], 1, "regr")
    value, params = run_finetune(opt, quiet=True, datasets=datasets)
    assert np.isfinite(value)
    assert (tmp_path / "ft.ckpt").exists()


class TestKernelPolicy:
    """Kernel-strategy knobs live in the config system with env overrides
    (VERDICT r4 #7); the known chip-hang configuration is refused."""

    @pytest.fixture(autouse=True)
    def _restore_policy(self):
        from fragnet_tpu.model.layers import KernelPolicy, set_kernel_policy

        yield
        set_kernel_policy(KernelPolicy())

    def test_defaults(self):
        pol = fastpath.resolve_kernel_policy({})
        assert (pol.bond, pol.fc, pol.attr) == ("planes", "planes", False)

    def test_config_keys_and_install(self):
        from fragnet_tpu.model.layers import get_kernel_policy

        fp = fastpath.resolve(_section(
            kernel={"bond": "tcsr", "fc": "attr", "attr": True}))
        assert fp.kernel.bond == "tcsr"
        assert fp.kernel.fc == "attr"
        assert fp.kernel.attr is True
        # the resolved policy is installed process-wide — bench and the
        # training entries provably select through the same resolver
        assert get_kernel_policy() == fp.kernel

    def test_env_overrides_config(self, monkeypatch):
        monkeypatch.setenv("FRAGNET_DENSE_FC", "attr")
        monkeypatch.setenv("FRAGNET_DENSE_ATTR", "1")
        pol = fastpath.resolve_kernel_policy(
            _section(kernel={"fc": "planes", "attr": False}))
        assert pol.fc == "attr"
        assert pol.attr is True

    def test_bond_attr_refused(self, monkeypatch):
        # dense-attr at bond shapes hung the device (BASELINE.md r4) — the
        # configuration must raise, from config AND from the env override
        with pytest.raises(ValueError, match="refused"):
            fastpath.resolve_kernel_policy(_section(kernel={"bond": "attr"}))
        monkeypatch.setenv("FRAGNET_DENSE_BOND", "attr")
        with pytest.raises(ValueError, match="refused"):
            fastpath.resolve_kernel_policy({})

    def test_bad_values(self):
        with pytest.raises(ValueError):
            fastpath.resolve_kernel_policy(_section(kernel={"bond": "ell"}))
        with pytest.raises(ValueError):
            fastpath.resolve_kernel_policy(_section(kernel={"fc": "zzz"}))

    def test_no_environ_reads_in_model(self):
        # the policy is the ONLY strategy channel: model code must not read
        # the environment (VERDICT r4 #7 "no os.environ reads in model/")
        import pathlib

        import fragnet_tpu.model as m

        for p in pathlib.Path(m.__file__).parent.glob("*.py"):
            src = p.read_text()
            assert "os.environ" not in src and "getenv" not in src, p.name
