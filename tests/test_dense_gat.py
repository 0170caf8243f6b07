"""Dense zero-gather GAT kernel (ops/dense_gat.py) + tile-aligned packing
(graphs/hiergraph.py PadSpec.align).

Parity model: the XLA segment path (ops/segment.py:gat_attention_pass) is
the reference math (itself parity-proven against fragnet/model/gat/gat2.py
:137-169 in test_parity_reference.py)."""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fragnet_tpu.ops.dense_gat import build_dense_planes, dense_gat_pass
from fragnet_tpu.ops.segment import gat_attention_pass


def _random_aligned_graph(rng, tn, n_tiles, R, E):
    """Random tile-local edges (both endpoints in the dst tile) + pad."""
    src_l, dst_l, mask_l, ear_l = [], [], [], []
    for t in range(n_tiles):
        seen = set()
        for _ in range(int(rng.integers(10, 3 * tn))):
            i, j = rng.integers(0, tn, 2)
            if (i, j) in seen:
                continue
            seen.add((i, j))
            src_l.append(t * tn + j)
            dst_l.append(t * tn + i)
            mask_l.append(1.0)
            ear_l.append(rng.standard_normal(R))
    assert len(src_l) <= E
    while len(src_l) < E:
        src_l.append(0)
        dst_l.append(0)
        mask_l.append(0.0)
        ear_l.append(np.zeros(R))
    return (np.array(src_l, np.int32), np.array(dst_l, np.int32),
            np.array(mask_l, np.float32), np.array(ear_l, np.float32))


class TestDenseKernel:
    def _setup(self, R, seed=0):
        rng = np.random.default_rng(seed)
        tn, n_tiles, H, D, Da, E = 16, 3, 4, 8, 8, 160
        N = tn * n_tiles
        src, dst, mask, ea_raw = _random_aligned_graph(rng, tn, n_tiles, R, E)
        planes = build_dense_planes(src, dst, mask, ea_raw, N, tn=tn)
        assert planes is not None
        nf = jnp.asarray(rng.standard_normal((N, H, D)), jnp.float32)
        a = jnp.asarray(rng.standard_normal((H, 2 * D + Da)), jnp.float32)
        W = jnp.asarray(rng.standard_normal((R, Da)), jnp.float32) * 0.3
        b = jnp.asarray(rng.standard_normal((Da,)), jnp.float32) * 0.1
        return (tn, N, H, D, Da, E, src, dst, mask, ea_raw, planes,
                nf, a, W, b)

    @pytest.mark.parametrize("R", [1, 6])
    def test_forward_matches_segment_path(self, R):
        (tn, N, H, D, Da, E, src, dst, mask, ea_raw, planes,
         nf, a, W, b) = self._setup(R)
        ea_emb = jnp.asarray(ea_raw) @ W + b
        a_ea = a[:, D:D + Da]
        v, c = W @ a_ea.T, b @ a_ea.T
        ea_h = jnp.broadcast_to(ea_emb[:, None, :], (E, H, Da))
        out_ref, attn_ref = gat_attention_pass(
            nf, ea_h, src, dst, a, N, edge_mask=jnp.asarray(mask))
        out_d, attn_d = dense_gat_pass(
            nf, jnp.asarray(planes), v, c, ea_emb, src, dst,
            jnp.asarray(mask), a)
        np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_ref),
                                   atol=2e-5, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(attn_d), np.asarray(attn_ref),
                                   atol=2e-5, rtol=2e-4)

    @pytest.mark.parametrize("R", [1, 6])
    def test_grads_match_segment_path(self, R):
        (tn, N, H, D, Da, E, src, dst, mask, ea_raw, planes,
         nf, a, W, b) = self._setup(R, seed=1)

        def loss_ref(nf, W, b, a):
            ea_emb = jnp.asarray(ea_raw) @ W + b
            ea_h = jnp.broadcast_to(ea_emb[:, None, :], (E, H, Da))
            o, _ = gat_attention_pass(nf, ea_h, src, dst, a, N,
                                      edge_mask=jnp.asarray(mask))
            return jnp.sum(jnp.sin(o))

        def loss_d(nf, W, b, a):
            a_ea = a[:, D:D + Da]
            ea_emb = jnp.asarray(ea_raw) @ W + b
            o, _ = dense_gat_pass(nf, jnp.asarray(planes), W @ a_ea.T,
                                  b @ a_ea.T, ea_emb, src, dst,
                                  jnp.asarray(mask), a)
            return jnp.sum(jnp.sin(o))

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(nf, W, b, a)
        g_d = jax.grad(loss_d, argnums=(0, 1, 2, 3))(nf, W, b, a)
        for gr, gd in zip(g_ref, g_d):
            np.testing.assert_allclose(np.asarray(gd), np.asarray(gr),
                                       atol=5e-5, rtol=5e-4)

    def test_empty_tile_is_safe(self):
        """A tile with zero edges must produce zeros, not NaN."""
        tn, H, D, Da, R = 16, 4, 8, 8, 1
        N, E = 32, 32
        src = np.zeros((E,), np.int32)
        dst = np.zeros((E,), np.int32)
        mask = np.zeros((E,), np.float32)
        src[0], dst[0], mask[0] = 1, 2, 1.0  # one edge in tile 0; tile 1 empty
        ea_raw = np.zeros((E, R), np.float32)
        planes = build_dense_planes(src, dst, mask, ea_raw, N, tn=tn)
        rng = np.random.default_rng(0)
        nf = jnp.asarray(rng.standard_normal((N, H, D)), jnp.float32)
        a = jnp.asarray(rng.standard_normal((H, 2 * D + Da)), jnp.float32)
        v = jnp.zeros((R, H), jnp.float32)
        c = jnp.zeros((H,), jnp.float32)
        out, attn = dense_gat_pass(nf, jnp.asarray(planes), v, c,
                                   jnp.zeros((E, Da)), src, dst,
                                   jnp.asarray(mask), a)
        assert np.isfinite(np.asarray(out)).all()
        assert float(jnp.abs(out[tn:]).max()) == 0.0

    def test_builder_rejects_cross_tile_and_duplicates(self):
        src = np.array([0, 17], np.int32)
        dst = np.array([1, 1], np.int32)   # edge 1 crosses tiles (17 -> 1)
        mask = np.ones((2,), np.float32)
        ea = np.zeros((2, 1), np.float32)
        assert build_dense_planes(src, dst, mask, ea, 32, tn=16) is None
        src2 = np.array([3, 3], np.int32)  # duplicate (dst, src) slot
        dst2 = np.array([1, 1], np.int32)
        assert build_dense_planes(src2, dst2, mask, ea, 32, tn=16) is None


class TestAlignedPacking:
    @pytest.fixture(scope="class")
    def batches(self, ft_graphs):
        from fragnet_tpu.graphs.hiergraph import pad_batch, spec_for

        graphs = ft_graphs
        spec_plain = spec_for(graphs, batch_size=len(graphs), tcsr=True,
                              align=False)
        spec_al = spec_for(graphs, batch_size=len(graphs), tcsr=True,
                           align=True)
        return (pad_batch(graphs, spec_plain), pad_batch(graphs, spec_al),
                spec_al)

    def test_invariants(self, batches):
        _, b, spec = batches
        tn = spec.tn
        assert b.dp_bond is not None and b.dp_fc is not None
        for s, d, m in ((b.bg_src, b.bg_dst, b.bg_mask),
                        (b.fc_src, b.fc_dst, b.fc_mask),
                        (b.edge_src, b.edge_dst, b.edge_mask),
                        (b.frag_src, b.frag_dst, b.fconn_mask)):
            k = np.asarray(m) > 0
            assert (np.asarray(s)[k] // tn == np.asarray(d)[k] // tn).all()
        # every real node/edge survives the re-packing
        bp = batches[0]
        for f in ("atom_mask", "edge_mask", "frag_mask", "fconn_mask",
                  "bg_mask", "fc_mask", "graph_mask"):
            assert np.asarray(getattr(b, f)).sum() == \
                np.asarray(getattr(bp, f)).sum(), f

    def test_model_output_matches_plain_packing(self, batches):
        from fragnet_tpu.model.finetune import FragNetFineTune

        bp, ba, _ = batches
        tree = lambda b: jax.tree.map(
            lambda x: jnp.asarray(x) if x is not None else None, b)
        bp, ba = tree(bp), tree(ba)
        model = FragNetFineTune(num_layer=2, num_heads=4, emb_dim=32,
                                h1=16, h2=16, h3=16, h4=16)
        params = model.init(jax.random.PRNGKey(0), bp, deterministic=True)
        out_p = model.apply(params, bp, deterministic=True)
        out_a = model.apply(params, ba, deterministic=True)
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_p),
                                   atol=2e-4, rtol=2e-4)

    def test_model_grads_match_xla_path(self, batches):
        from fragnet_tpu.model.finetune import FragNetFineTune

        _, ba, _ = batches
        b_xla = dc.replace(ba, tm_atom=None, tm_bond=None, tm_frag=None,
                           tm_fc=None, dp_bond=None, dp_fc=None)
        tree = lambda b: jax.tree.map(
            lambda x: jnp.asarray(x) if x is not None else None, b)
        ba, bx = tree(ba), tree(b_xla)
        model = FragNetFineTune(num_layer=2, num_heads=4, emb_dim=32,
                                h1=16, h2=16, h3=16, h4=16)
        params = model.init(jax.random.PRNGKey(0), bx, deterministic=True)

        def loss(p, b):
            o = model.apply(p, b, deterministic=True)
            return jnp.sum(o ** 2)

        g_a = jax.tree.leaves(jax.grad(loss)(params, ba))
        g_x = jax.tree.leaves(jax.grad(loss)(params, bx))
        for la, lx in zip(g_a, g_x):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lx),
                                       atol=5e-3, rtol=5e-3)


class TestDenseAttrKernel:
    """Dynamic-edge-attr dense kernel (atom/frag levels): in-kernel scatter
    of edge-space w_ea into per-head planes over the TileMeta edge windows,
    dense masked attention, analytic self-loops."""

    def _setup(self, seed=0):
        from fragnet_tpu.ops.tcsr import build_tile_meta

        rng = np.random.default_rng(seed)
        tn, n_tiles, H, D, Da, te = 16, 3, 4, 8, 12, 16
        N = tn * n_tiles
        src_l, dst_l = [], []
        for t in range(n_tiles):
            seen = set()
            for _ in range(int(rng.integers(12, 40))):
                i, j = rng.integers(0, tn, 2)
                if (i, j) in seen:
                    continue
                seen.add((i, j))
                src_l.append(t * tn + j)
                dst_l.append(t * tn + i)
        order = np.argsort(dst_l, kind="stable")
        E = 160
        src = np.zeros(E, np.int32)
        dst = np.zeros(E, np.int32)
        mask = np.zeros(E, np.float32)
        src[: len(order)] = np.array(src_l)[order]
        dst[: len(order)] = np.array(dst_l)[order]
        mask[: len(order)] = 1.0
        meta = build_tile_meta(src, dst, mask, N, tn=tn, te=te)
        adj = build_dense_planes(src, dst, mask, np.zeros((E, 0), np.float32),
                                 N, tn=tn)
        assert meta is not None and adj is not None
        nf = jnp.asarray(rng.standard_normal((N, H, D)), jnp.float32)
        ea = jnp.asarray(rng.standard_normal((E, Da)), jnp.float32)
        a = jnp.asarray(rng.standard_normal((H, 2 * D + Da)), jnp.float32)
        return N, E, H, D, Da, src, dst, mask, meta, adj, nf, ea, a

    @pytest.mark.parametrize("self_loops", [False, True])
    def test_forward_and_grads(self, self_loops):
        from fragnet_tpu.ops.dense_gat import dense_attr_gat_pass

        (N, E, H, D, Da, src, dst, mask, meta, adj, nf, ea, a) = self._setup()

        def ref_pass(nf, ea, a):
            if self_loops:
                sl = jnp.arange(N, dtype=jnp.int32)
                src_x = jnp.concatenate([jnp.asarray(src), sl])
                dst_x = jnp.concatenate([jnp.asarray(dst), sl])
                ea_x = jnp.concatenate([ea, jnp.zeros((N, Da))], axis=0)
                mask_x = jnp.concatenate([jnp.asarray(mask), jnp.ones((N,))])
                ea_h = jnp.broadcast_to(ea_x[:, None, :], (E + N, H, Da))
                return gat_attention_pass(nf, ea_h, src_x, dst_x, a, N,
                                          edge_mask=mask_x)
            ea_h = jnp.broadcast_to(ea[:, None, :], (E, H, Da))
            return gat_attention_pass(nf, ea_h, src, dst, a, N,
                                      edge_mask=jnp.asarray(mask))

        out_ref, attn_ref = ref_pass(nf, ea, a)
        out_d, attn_d = dense_attr_gat_pass(
            nf, ea, src, dst, jnp.asarray(mask), a, jnp.asarray(adj), meta,
            self_loops=self_loops)
        np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_ref),
                                   atol=3e-5, rtol=3e-4)
        np.testing.assert_allclose(np.asarray(attn_d), np.asarray(attn_ref),
                                   atol=3e-5, rtol=3e-4)

        g_ref = jax.grad(lambda *xs: jnp.sum(jnp.sin(ref_pass(*xs)[0])),
                         argnums=(0, 1, 2))(nf, ea, a)
        g_d = jax.grad(
            lambda nf, ea, a: jnp.sum(jnp.sin(dense_attr_gat_pass(
                nf, ea, src, dst, jnp.asarray(mask), a, jnp.asarray(adj),
                meta, self_loops=self_loops)[0])),
            argnums=(0, 1, 2))(nf, ea, a)
        for gr, gd in zip(g_ref, g_d):
            np.testing.assert_allclose(np.asarray(gd), np.asarray(gr),
                                       atol=1e-4, rtol=1e-3)

    def test_builder_rejects_duplicate_frag_connections(self):
        # two fconn entries between the same fragment pair → dense disabled
        src = np.array([1, 1], np.int32)
        dst = np.array([2, 2], np.int32)
        mask = np.ones((2,), np.float32)
        assert build_dense_planes(src, dst, mask,
                                  np.zeros((2, 0), np.float32),
                                  16, tn=16) is None
