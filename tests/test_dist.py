"""Distributed tests on the 8-device virtual CPU mesh: DP step correctness
vs single-device, mesh helpers, variant forwards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fragnet_tpu.dist.data_parallel import (
    make_dp_train_step,
    make_mesh,
    stack_for_dp,
)
from fragnet_tpu.graphs.hiergraph import pad_batch, spec_for
from fragnet_tpu.model.finetune import FragNetFineTune
from fragnet_tpu.train.loop import TrainState, make_train_step
from fragnet_tpu.train.optim import make_optimizer

# multi-minute file: excluded from the fast tier (make check); run via make check-full
pytestmark = pytest.mark.slow


def _to_jnp(b):
    return jax.tree.map(lambda x: jnp.asarray(x) if x is not None else None, b)


@pytest.fixture(scope="module")
def model_small():
    return FragNetFineTune(num_layer=1, num_heads=2, emb_dim=32,
                           h1=16, h2=16, h3=16, h4=16, drop_ratio=0.0)


class TestDataParallel:
    def test_eight_devices_available(self):
        assert jax.device_count() >= 8

    def test_dp_step_runs(self, ft_graphs, model_small):
        n_dev = 4
        mesh = make_mesh(n_dev)
        spec = spec_for(ft_graphs, batch_size=2)
        stacked = _to_jnp(stack_for_dp(ft_graphs, n_dev, spec))
        local0 = jax.tree.map(lambda x: x[0] if x is not None else None, stacked)
        params = model_small.init(jax.random.PRNGKey(0), local0,
                                  deterministic=True)
        tx = make_optimizer("adam", lr=1e-3)
        state = TrainState.create(params, tx)
        step = make_dp_train_step(model_small, tx, mesh)
        new_state, loss = step(state, stacked, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        moved = sum(
            float(jnp.abs(a - b).sum())
            for a, b in zip(jax.tree.leaves(new_state.params),
                            jax.tree.leaves(state.params))
        )
        assert moved > 0

    def test_dp_matches_single_device(self, ft_graphs, model_small):
        """With equal-size shards and deterministic loss, the DP gradient is
        the mean of shard gradients — equivalent to a global batch step."""
        n_dev = 2
        graphs = ft_graphs[:4]
        mesh = make_mesh(n_dev)
        spec = spec_for(graphs, batch_size=2)
        stacked = _to_jnp(stack_for_dp(graphs, n_dev, spec))
        local0 = jax.tree.map(lambda x: x[0] if x is not None else None, stacked)
        params = model_small.init(jax.random.PRNGKey(0), local0,
                                  deterministic=True)

        # single-device reference: average the two shard grads manually
        def shard_loss(p, shard):
            out = model_small.apply(p, shard, deterministic=True)
            from fragnet_tpu.train.loop import mse_loss

            return mse_loss(out, shard.y, shard.graph_mask)

        g0 = jax.grad(shard_loss)(
            params, jax.tree.map(lambda x: x[0] if x is not None else None, stacked)
        )
        g1 = jax.grad(shard_loss)(
            params, jax.tree.map(lambda x: x[1] if x is not None else None, stacked)
        )
        ref_grads = jax.tree.map(lambda a, b: (a + b) / 2, g0, g1)

        tx = make_optimizer("adam", lr=1e-3)
        state = TrainState.create(params, tx)
        # deterministic=False with drop_ratio=0 → dropout is identity
        step = make_dp_train_step(model_small, tx, mesh)
        new_state, _ = step(state, stacked, jax.random.PRNGKey(1))

        updates, _ = tx.update(ref_grads, tx.init(params), params)
        import optax

        ref_params = optax.apply_updates(params, updates)
        for a, b in zip(jax.tree.leaves(new_state.params),
                        jax.tree.leaves(ref_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=1e-6)


class TestVariants:
    @pytest.mark.parametrize("name", ["lite", "edge", "gcn"])
    def test_forward(self, ft_graphs, name):
        from fragnet_tpu.model.variants import (
            FragNetFineTuneEdge,
            FragNetFineTuneGCN,
            FragNetFineTuneLite,
        )

        cls = {"lite": FragNetFineTuneLite, "edge": FragNetFineTuneEdge,
               "gcn": FragNetFineTuneGCN}[name]
        spec = spec_for(ft_graphs[:4], batch_size=4)
        batch = _to_jnp(pad_batch(ft_graphs[:4], spec))
        model = cls(num_layer=1, emb_dim=32, h1=16, h2=16, h3=16, h4=16,
                    drop_ratio=0.0)
        params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
        out = model.apply(params, batch, deterministic=True)
        assert out.shape == (4, 1)
        assert np.isfinite(np.asarray(out)).all()

    def test_gcn_grad(self, ft_graphs):
        from fragnet_tpu.model.variants import FragNetFineTuneGCN

        spec = spec_for(ft_graphs[:2], batch_size=2)
        batch = _to_jnp(pad_batch(ft_graphs[:2], spec))
        model = FragNetFineTuneGCN(num_layer=1, emb_dim=32, h1=16, h2=16,
                                   h3=16, h4=16)
        params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)

        def loss(p):
            out = model.apply(p, batch, deterministic=True)
            return jnp.sum(out**2)

        g = jax.grad(loss)(params)
        assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


class TestDPTrainingMode:
    def test_run_finetune_dp_mode(self, tmp_path, ft_graphs):
        """dist.mode=dp: full finetune over the 8-device virtual mesh."""
        import jax

        from fragnet_tpu.config import Config
        from fragnet_tpu.train.finetune import run_finetune

        assert len(jax.devices()) >= 4
        tr = ft_graphs * 2
        va = ft_graphs[:4]
        te = ft_graphs[4:]
        opt = Config({
            "seed": 0,
            "exp_dir": str(tmp_path / "dp_exp"),
            "dist": {"mode": "dp", "n_devices": 4},
            "finetune": {
                "model": {"num_layer": 1, "num_heads": 2, "emb_dim": 32,
                          "h1": 16, "h2": 16, "h3": 16, "h4": 16,
                          "drop_ratio": 0.0},
                "batch_size": 2, "lr": 1e-3, "n_epochs": 2,
                "es_patience": 5,
            },
        })
        value, _ = run_finetune(opt, quiet=True,
                                datasets=(tr, va, te, 1, "regr"))
        assert np.isfinite(value)

    def test_initialize_distributed_single_process_noop(self):
        from fragnet_tpu.dist.data_parallel import initialize_distributed

        assert initialize_distributed() == 0

    def test_dp_loader_covers_dataset(self, ft_graphs):
        from fragnet_tpu.dist.data_parallel import DPBatchLoader
        from fragnet_tpu.graphs.hiergraph import spec_for

        spec = spec_for(ft_graphs, batch_size=2)
        loader = DPBatchLoader(ft_graphs, per_device_batch=2, n_devices=2,
                               spec=spec, shuffle=True, seed=0)
        total = 0
        for stacked in loader:
            assert stacked.x_atoms.ndim == 3  # (D, A, F)
            total += int(np.asarray(stacked.graph_mask).sum())
        assert total == len(ft_graphs)


class TestEPFusedTrainingMode:
    def test_run_finetune_ep_fused_mode(self, tmp_path, ft_graphs):
        """dist.mode=ep with dist.tcsr=true: the CLI's EPMetaLoader probe,
        static-width pinning, and fused-kernel EP train/eval steps run a
        full (tiny) finetune over the virtual mesh."""
        import jax

        from fragnet_tpu.config import Config
        from fragnet_tpu.train.finetune import run_finetune

        assert len(jax.devices()) >= 4
        tr = ft_graphs * 2
        va = ft_graphs[:4]
        te = ft_graphs[4:]
        opt = Config({
            "seed": 0,
            "exp_dir": str(tmp_path / "ep_exp"),
            "dist": {"mode": "ep", "n_devices": 4, "tcsr": True, "tile": 8},
            "finetune": {
                "model": {"num_layer": 1, "num_heads": 2, "emb_dim": 32,
                          "h1": 16, "h2": 16, "h3": 16, "h4": 16,
                          "drop_ratio": 0.0},
                "batch_size": 4, "lr": 1e-3, "n_epochs": 1,
                "es_patience": 5, "tcsr": True,
            },
        })
        value, _ = run_finetune(opt, quiet=True,
                                datasets=(tr, va, te, 1, "regr"))
        assert np.isfinite(value)
