"""Pallas fused GAT kernel: TCSR metadata + interpret-mode parity vs the XLA
segment path (SURVEY.md §7 step 6 — the hot-kernel gate)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import fragnet_tpu.ops.pallas_gat as pg
from fragnet_tpu.ops.segment import gat_attention_pass
from fragnet_tpu.ops.tcsr import build_tile_meta

rng = np.random.default_rng(0)


def _mol_local_graph(n_mols=10, tn=32, te=32, seed=0):
    """Random molecule-local graph: contiguous node/edge ranges per mol."""
    r = np.random.default_rng(seed)
    src_l, dst_l, off = [], [], 0
    for _ in range(n_mols):
        nn = r.integers(4, 20)
        ne = r.integers(3, 30)
        src_l.append(r.integers(0, nn, ne) + off)
        dst_l.append(r.integers(0, nn, ne) + off)
        off += nn
    src = np.concatenate(src_l)
    dst = np.concatenate(dst_l)
    E0, N0 = len(src), off
    Np = max(((N0 + tn - 1) // tn) * tn, tn)
    Ep = ((E0 + te - 1) // te) * te + te
    mask = np.zeros(Ep, np.float32)
    mask[:E0] = 1
    sp = np.zeros(Ep, np.int32)
    dp = np.zeros(Ep, np.int32)
    sp[:E0], dp[:E0] = src, dst
    return sp, dp, mask, Np


class TestTileMeta:
    def test_coverage(self):
        src, dst, mask, N = _mol_local_graph()
        tm = build_tile_meta(src, dst, mask, N, tn=32, te=32)
        assert tm is not None
        keep = mask > 0
        t = dst[keep] // 32
        eids = np.flatnonzero(keep)
        lo = tm.ew_blk[t] * 32
        assert ((eids >= lo) & (eids < lo + tm.n_chunks * 32)).all()
        slo = tm.sw_tile[t] * 32
        assert ((src[keep] >= slo) & (src[keep] < slo + tm.k_src * 32)).all()
        # flat_slot maps each kept edge into its tile's window
        assert (tm.flat_slot[keep] // (tm.n_chunks * 32) == t).all()

    def test_pinned_too_small_returns_none(self):
        src, dst, mask, N = _mol_local_graph()
        assert build_tile_meta(src, dst, mask, N, tn=32, te=32,
                               n_chunks=1, k_src=1) is None

    def test_nonlocal_graph_rejected(self):
        # one tile aggregates from both ends of the node array — the source
        # window cannot cover it at k_src=1
        src = np.array([0, 510], np.int32).repeat(16)
        dst = np.full(32, 1, np.int32)
        mask = np.ones(32, np.float32)
        tm = build_tile_meta(src, dst, mask, 512, tn=32, te=32,
                             n_chunks=1, k_src=1)
        assert tm is None


class TestPallasParity:
    @pytest.mark.parametrize("self_loops", [False, True])
    def test_forward_and_grads(self, self_loops):
        H, D, Da = 4, 32, 16
        src, dst, mask, N = _mol_local_graph(seed=3)
        tm = build_tile_meta(src, dst, mask, N, tn=32, te=32)
        E = len(src)
        nf = jnp.asarray(rng.normal(size=(N, H, D)), jnp.float32)
        ea = jnp.asarray(rng.normal(size=(E, Da)), jnp.float32)
        a = jnp.asarray(rng.normal(size=(H, 2 * D + Da)), jnp.float32)
        gvec = jnp.asarray(rng.normal(size=(N, H, D)), jnp.float32)
        srcj, dstj, maskj = map(jnp.asarray, (src, dst, mask))

        def ref(nf, ea, a):
            if self_loops:
                sl = jnp.arange(N, dtype=jnp.int32)
                s2 = jnp.concatenate([srcj, sl])
                d2 = jnp.concatenate([dstj, sl])
                ea2 = jnp.concatenate([ea, jnp.zeros((N, Da))], axis=0)
                m2 = jnp.concatenate([maskj, jnp.ones((N,))])
                eh = jnp.broadcast_to(ea2[:, None, :], (E + N, H, Da))
                return gat_attention_pass(nf, eh, s2, d2, a, N, edge_mask=m2)[0]
            eh = jnp.broadcast_to(ea[:, None, :], (E, H, Da))
            return gat_attention_pass(nf, eh, srcj, dstj, a, N,
                                      edge_mask=maskj)[0]

        def pal(nf, ea, a):
            return pg.pallas_gat_pass(nf, ea, srcj, dstj, maskj, a, tm,
                                      self_loops=self_loops, interpret=True)[0]

        np.testing.assert_allclose(pal(nf, ea, a), ref(nf, ea, a),
                                   atol=1e-4, rtol=1e-4)
        loss_r = lambda *xs: (ref(*xs) * gvec).sum()
        loss_p = lambda *xs: (pal(*xs) * gvec).sum()
        gr = jax.grad(loss_r, argnums=(0, 1, 2))(nf, ea, a)
        gp = jax.grad(loss_p, argnums=(0, 1, 2))(nf, ea, a)
        for r_, p_ in zip(gr, gp):
            np.testing.assert_allclose(p_, r_, atol=5e-4, rtol=5e-3)

    def test_empty_level(self):
        """All-masked (empty) level: output must be zeros, grads finite."""
        H, D, Da = 4, 32, 6
        N, E = 64, 32
        tm = build_tile_meta(np.zeros(E, np.int32), np.zeros(E, np.int32),
                             np.zeros(E, np.float32), N, tn=32, te=32)
        nf = jnp.asarray(rng.normal(size=(N, H, D)), jnp.float32)
        ea = jnp.asarray(rng.normal(size=(E, Da)), jnp.float32)
        a = jnp.asarray(rng.normal(size=(H, 2 * D + Da)), jnp.float32)
        out, attn = pg.pallas_gat_pass(nf, ea, jnp.zeros(E, jnp.int32),
                                       jnp.zeros(E, jnp.int32),
                                       jnp.zeros(E, jnp.float32), a, tm,
                                       interpret=True)
        assert float(jnp.abs(out).max()) == 0.0
        assert float(jnp.abs(attn).max()) == 0.0

    @pytest.mark.parametrize("self_loops", [False, True])
    def test_attention_matches_xla_path(self, self_loops):
        """Per-source summed attention (gat2.py:165-167) from the Pallas
        epilogue equals the XLA segment path."""
        H, D, Da = 4, 32, 16
        src, dst, mask, N = _mol_local_graph(seed=9)
        tm = build_tile_meta(src, dst, mask, N, tn=32, te=32)
        E = len(src)
        nf = jnp.asarray(rng.normal(size=(N, H, D)), jnp.float32)
        ea = jnp.asarray(rng.normal(size=(E, Da)), jnp.float32)
        a = jnp.asarray(rng.normal(size=(H, 2 * D + Da)), jnp.float32)
        srcj, dstj, maskj = map(jnp.asarray, (src, dst, mask))

        if self_loops:
            sl = jnp.arange(N, dtype=jnp.int32)
            s2 = jnp.concatenate([srcj, sl])
            d2 = jnp.concatenate([dstj, sl])
            ea2 = jnp.concatenate([ea, jnp.zeros((N, Da))], axis=0)
            m2 = jnp.concatenate([maskj, jnp.ones((N,))])
            eh = jnp.broadcast_to(ea2[:, None, :], (E + N, H, Da))
            _, attn_ref = gat_attention_pass(nf, eh, s2, d2, a, N, edge_mask=m2)
        else:
            eh = jnp.broadcast_to(ea[:, None, :], (E, H, Da))
            _, attn_ref = gat_attention_pass(nf, eh, srcj, dstj, a, N,
                                             edge_mask=maskj)
        _, attn_pal = pg.pallas_gat_pass(nf, ea, srcj, dstj, maskj, a, tm,
                                         self_loops=self_loops, interpret=True)
        np.testing.assert_allclose(np.asarray(attn_pal), np.asarray(attn_ref),
                                   atol=1e-4, rtol=1e-4)


class TestModelTcsrParity:
    def test_model_forward_matches_xla_path(self, ft_graphs):
        from fragnet_tpu.data.batcher import BatchLoader
        from fragnet_tpu.graphs.hiergraph import spec_for
        from fragnet_tpu.model.finetune import FragNetFineTune

        spec_x = spec_for(ft_graphs, batch_size=4, multiple=16)
        spec_p = spec_for(ft_graphs, batch_size=4, tcsr=True, tn=16, te=16,
                          multiple=16)
        assert spec_p.tcsr
        model = FragNetFineTune(num_layer=2, num_heads=4, emb_dim=64,
                                h1=32, h2=32, h3=32, h4=32)
        bx = next(iter(BatchLoader(ft_graphs, 4, spec=spec_x, shuffle=False)))
        bp = next(iter(BatchLoader(ft_graphs, 4, spec=spec_p, shuffle=False)))
        assert bp.tm_bond is not None and bp.tm_atom is not None
        params = model.init(jax.random.PRNGKey(0), bx, deterministic=True)
        ox = model.apply(params, bx, deterministic=True)
        op = model.apply(params, bp, deterministic=True)
        gm = np.asarray(bx.graph_mask) > 0
        np.testing.assert_allclose(np.asarray(op)[gm], np.asarray(ox)[gm],
                                   atol=2e-4, rtol=2e-3)

    def test_model_attention_matches_xla_path(self, ft_graphs):
        """VERDICT r1 weak-2: interpretation results must be identical with
        and without the fused TCSR kernel (all four attention levels)."""
        from fragnet_tpu.data.batcher import BatchLoader
        from fragnet_tpu.graphs.hiergraph import spec_for
        from fragnet_tpu.model.finetune import FragNetFineTune

        spec_x = spec_for(ft_graphs, batch_size=4, multiple=16)
        spec_p = spec_for(ft_graphs, batch_size=4, tcsr=True, tn=16, te=16,
                          multiple=16)
        model = FragNetFineTune(num_layer=2, num_heads=4, emb_dim=64,
                                h1=32, h2=32, h3=32, h4=32)
        bx = next(iter(BatchLoader(ft_graphs, 4, spec=spec_x, shuffle=False)))
        bp = next(iter(BatchLoader(ft_graphs, 4, spec=spec_p, shuffle=False)))
        assert bp.tm_bond is not None
        params = model.init(jax.random.PRNGKey(0), bx, deterministic=True)
        _, ax = model.apply(params, bx, deterministic=True,
                            return_attentions=True)
        _, ap = model.apply(params, bp, deterministic=True,
                            return_attentions=True)
        # both batches pack the same graphs contiguously from row 0; only the
        # padded tails differ, so compare the masked-valid prefixes
        for name, mx, mp, mask_x, mask_p in [
            ("atoms", ax.atoms, ap.atoms, bx.atom_mask, bp.atom_mask),
            ("bonds", ax.bonds, ap.bonds, bx.edge_mask, bp.edge_mask),
            ("frags", ax.frags, ap.frags, bx.frag_mask, bp.frag_mask),
            ("fbonds", ax.fbonds, ap.fbonds, bx.fconn_mask, bp.fconn_mask),
        ]:
            vx = np.asarray(mx)[np.asarray(mask_x) > 0]
            vp = np.asarray(mp)[np.asarray(mask_p) > 0]
            assert np.abs(vp).max() > 0, f"{name} all-zero"
            np.testing.assert_allclose(
                vp, vx, atol=2e-4, rtol=2e-3, err_msg=f"attn {name} diverged",
            )
