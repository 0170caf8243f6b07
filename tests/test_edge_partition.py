"""Edge-partitioned GAT pass on the 8-device virtual CPU mesh: sharded
result must equal the single-device segment path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fragnet_tpu.dist.data_parallel import make_mesh
from fragnet_tpu.dist.edge_partition import (
    edge_partitioned_gat_pass,
    edge_partitioned_segment_sum,
    shard_edges,
)
from fragnet_tpu.ops.segment import gat_attention_pass, segment_sum

pytestmark = [
    pytest.mark.skipif(
        len(jax.devices()) < 2, reason="needs a multi-device mesh"
    ),
    # multi-minute file (~11 min): excluded from the fast tier (make check)
    pytest.mark.slow,
]


def test_gat_pass_matches_single_device():
    rng = np.random.default_rng(0)
    N, E, H, D, Da = 64, 300, 4, 8, 4
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    nf = jnp.asarray(rng.normal(size=(N, H, D)), jnp.float32)
    src = rng.integers(0, N, E).astype(np.int32)
    dst = rng.integers(0, N, E).astype(np.int32)
    ea = rng.normal(size=(E, H, Da)).astype(np.float32)
    mask = (rng.random(E) > 0.1).astype(np.float32)
    a = jnp.asarray(rng.normal(size=(H, 2 * D + Da)), jnp.float32)

    ref, _ = gat_attention_pass(nf, jnp.asarray(ea), jnp.asarray(src),
                                jnp.asarray(dst), a, N,
                                edge_mask=jnp.asarray(mask))

    ea_s, src_s, dst_s, mask_s = shard_edges([ea, src, dst, mask], n_dev)
    out = edge_partitioned_gat_pass(
        mesh, nf, jnp.asarray(ea_s), jnp.asarray(src_s), jnp.asarray(dst_s),
        jnp.asarray(mask_s), a)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


class TestModelLevelEP:
    """VERDICT r1 #4: edge partitioning as a TRAINING MODE — the full
    FragNet forward and one optimizer step, sharded over the mesh, must
    equal the single-device result on the same global batch."""

    def _setup(self, ft_graphs, drop=0.0):
        from fragnet_tpu.graphs.hiergraph import pad_batch, spec_for
        from fragnet_tpu.model.finetune import FragNetFineTune

        n_dev = len(jax.devices())
        spec = spec_for(ft_graphs, batch_size=8, multiple=8 * n_dev)
        batch = jax.tree.map(
            lambda x: jnp.asarray(x) if x is not None else None,
            pad_batch(ft_graphs, spec))
        kw = dict(num_layer=2, num_heads=4, emb_dim=64,
                  h1=32, h2=32, h3=32, h4=32, drop_ratio=drop)
        plain = FragNetFineTune(**kw)
        ep = FragNetFineTune(**kw, ep_axis="ep")
        params = plain.init(jax.random.PRNGKey(0), batch, deterministic=True)
        return batch, plain, ep, params, make_mesh(n_dev, axis="ep")

    def test_forward_matches_single_device(self, ft_graphs):
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from fragnet_tpu.dist.edge_partition import ep_batch_specs

        batch, plain, ep, params, mesh = self._setup(ft_graphs)
        ref, attn_ref = plain.apply(params, batch, deterministic=True,
                                    return_attentions=True)

        specs = ep_batch_specs(batch, "ep")
        fwd = shard_map(
            lambda p, b: ep.apply(p, b, deterministic=True,
                                  return_attentions=True),
            mesh=mesh, in_specs=(P(), specs), out_specs=P())
        out, attn = fwd(params, batch)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)
        for name in ("atoms", "bonds", "frags", "fbonds"):
            np.testing.assert_allclose(
                np.asarray(getattr(attn, name)),
                np.asarray(getattr(attn_ref, name)),
                atol=1e-5, rtol=1e-5, err_msg=f"attn {name}")

    def test_train_step_matches_single_device(self, ft_graphs):
        from fragnet_tpu.dist.edge_partition import make_ep_train_step
        from fragnet_tpu.train.loop import TrainState, make_train_step
        from fragnet_tpu.train.optim import make_optimizer

        batch, plain, ep, params, mesh = self._setup(ft_graphs, drop=0.1)
        # sgd: adam's sqrt(v) normalization amplifies the ~1e-7 reduction-
        # order noise of psum partials into O(lr) parameter deltas
        tx = make_optimizer("sgd", lr=1e-2)
        rng = jax.random.PRNGKey(7)

        params2 = jax.tree.map(lambda x: x.copy(), params)
        s_ref = TrainState.create(params, tx)
        s_ref, l_ref = make_train_step(plain, tx, "mse")(s_ref, batch, rng)

        s_ep = TrainState.create(params2, tx)
        step = make_ep_train_step(ep, tx, mesh, batch, "mse", axis="ep")
        s_ep, l_ep = step(s_ep, batch, rng)

        np.testing.assert_allclose(float(l_ep), float(l_ref), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(s_ref.params),
                        jax.tree.leaves(s_ep.params)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-5, rtol=1e-5)


def test_partitioned_pooling_matches():
    rng = np.random.default_rng(1)
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    A, F, Dd = 128, 16, 8
    x = rng.normal(size=(A, Dd)).astype(np.float32)
    ids = rng.integers(0, F, A).astype(np.int32)
    mask = (rng.random(A) > 0.2).astype(np.float32)
    ref = segment_sum(jnp.asarray(x), jnp.asarray(ids), F,
                      mask=jnp.asarray(mask))
    x_s, ids_s, mask_s = shard_edges([x, ids, mask], n_dev)
    out = edge_partitioned_segment_sum(
        mesh, jnp.asarray(x_s).reshape(-1, Dd),
        jnp.asarray(ids_s).reshape(-1), F,
        mask=jnp.asarray(mask_s).reshape(-1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


class TestFusedEP:
    """EP + fused Pallas kernel composition (VERDICT r2 item 6a): the full
    FragNet forward, attention vectors, and parameter gradients in
    edge-partitioned TCSR mode must equal the single-device XLA result.
    Exercises pallas_gat_pass_ep (interpret-mode kernels on the virtual CPU
    mesh) including the AD boundary: local custom-VJP kernels + transparent
    XLA collectives."""

    def _setup(self, ft_graphs):
        import jax.numpy as jnp

        from fragnet_tpu.dist.edge_partition import with_ep_tile_meta
        from fragnet_tpu.graphs.hiergraph import pad_batch, spec_for
        from fragnet_tpu.model.finetune import FragNetFineTune

        n_dev = len(jax.devices())
        spec = spec_for(ft_graphs, batch_size=8, multiple=8 * n_dev)
        b_np = pad_batch(ft_graphs, spec)
        b_ep, ok = with_ep_tile_meta(b_np, n_dev, tn=8, te=8)
        assert ok, "EP tile meta construction failed"
        to_dev = lambda b: jax.tree.map(
            lambda x: jnp.asarray(x) if x is not None else None, b)
        kw = dict(num_layer=2, num_heads=4, emb_dim=64,
                  h1=32, h2=32, h3=32, h4=32, drop_ratio=0.0)
        plain = FragNetFineTune(**kw)
        ep = FragNetFineTune(**kw, ep_axis="ep")
        batch = to_dev(b_np)
        params = plain.init(jax.random.PRNGKey(0), batch, deterministic=True)
        from fragnet_tpu.dist.data_parallel import make_mesh

        return batch, to_dev(b_ep), plain, ep, params, make_mesh(n_dev, "ep")

    def test_forward_attention_and_grads_match(self, ft_graphs):
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from fragnet_tpu.dist.edge_partition import ep_batch_specs

        batch, batch_ep, plain, ep, params, mesh = self._setup(ft_graphs)
        ref, attn_ref = plain.apply(params, batch, deterministic=True,
                                    return_attentions=True)
        specs = ep_batch_specs(batch_ep, "ep")
        fwd = shard_map(
            lambda p, b: ep.apply(p, b, deterministic=True,
                                  return_attentions=True),
            mesh=mesh, in_specs=(P(), specs), out_specs=P(), check_vma=False)
        out, attn = fwd(params, batch_ep)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)
        for name in ("atoms", "bonds", "frags", "fbonds"):
            np.testing.assert_allclose(
                np.asarray(getattr(attn, name)),
                np.asarray(getattr(attn_ref, name)),
                atol=1e-5, rtol=1e-5, err_msg=f"attn {name}")

        def loss_plain(p):
            o = plain.apply(p, batch, deterministic=True)
            return jnp.sum((o.reshape(-1) - batch.y.reshape(-1)) ** 2
                           * batch.graph_mask)

        def loss_local(p, b):
            o = ep.apply(p, b, deterministic=True)
            return jnp.sum((o.reshape(-1) - b.y.reshape(-1)) ** 2
                           * b.graph_mask)

        loss_ep = shard_map(loss_local, mesh=mesh, in_specs=(P(), specs),
                            out_specs=P(), check_vma=False)
        g_ref = jax.grad(loss_plain)(params)
        g_ep = jax.grad(lambda p: loss_ep(p, batch_ep))(params)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4),
            g_ep, g_ref)

    def test_ep_train_step_with_fused_kernel(self, ft_graphs):
        """make_ep_train_step accepts a fused (EPTileMeta) batch end to end:
        one optimizer step matches the plain single-device step."""
        import optax

        from fragnet_tpu.dist.edge_partition import make_ep_train_step
        from fragnet_tpu.train.loop import TrainState

        batch, batch_ep, plain, ep, params, mesh = self._setup(ft_graphs)
        tx = optax.sgd(1e-2)
        # both steps donate their state — give each its own param copy
        params_ep = jax.tree.map(jnp.array, params)
        state = TrainState.create(params_ep, tx)
        step = make_ep_train_step(ep, tx, mesh, batch_ep, "mse", axis="ep")
        new_state, loss = step(state, batch_ep, jax.random.PRNGKey(3))

        from fragnet_tpu.train.loop import make_train_step

        ref_step = make_train_step(plain, tx, "mse")
        ref_state, ref_loss = ref_step(TrainState.create(params, tx), batch,
                                       jax.random.PRNGKey(3))
        np.testing.assert_allclose(float(loss), float(ref_loss),
                                   rtol=1e-5, atol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4),
            new_state.params, ref_state.params)
