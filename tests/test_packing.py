"""Single-buffer batch transport (data/packing.py): exact roundtrip,
train-step equivalence, threaded prefetch, HBM dataset cache."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fragnet_tpu.data.batcher import BatchLoader, DeviceCacheLoader
from fragnet_tpu.data.packing import build_layout, pack_batch, unpack_batch
from fragnet_tpu.graphs.hiergraph import spec_for
from fragnet_tpu.model.finetune import FragNetFineTune
from fragnet_tpu.train.loop import TrainState, make_train_step
from fragnet_tpu.train.optim import make_optimizer


def _spec(graphs, tcsr=False):
    return spec_for(graphs, batch_size=4, multiple=16,
                    tcsr=tcsr, tn=16, te=16)


class TestRoundtrip:
    def test_exact(self, ft_graphs):
        for tcsr in (False, True):
            loader = BatchLoader(ft_graphs, 4, spec=_spec(ft_graphs, tcsr),
                                 shuffle=False, to_device=False)
            b = next(iter(loader))
            lay = build_layout(b, jnp.float32)
            buf = pack_batch(b, lay)
            assert lay.total_bytes < 0.4 * sum(
                x.nbytes for x in jax.tree.leaves(b) if hasattr(x, "nbytes"))
            ub = jax.jit(lambda z: unpack_batch(z, lay))(jnp.asarray(buf))
            for f in dataclasses.fields(type(b)):
                a, u = getattr(b, f.name), getattr(ub, f.name)
                if f.name.startswith("dp_"):
                    # dense planes are deliberately NOT transported (redundant
                    # with the edge lists; the pipelined path runs the TCSR
                    # kernel) — see packing.py build_layout docstring
                    assert u is None, f.name
                    continue
                if a is None:
                    assert u is None, f.name
                    continue
                if f.name.startswith("tm_"):
                    for part in ("ew_blk", "sw_tile", "flat_slot", "cw"):
                        np.testing.assert_array_equal(
                            np.asarray(getattr(u, part)),
                            np.asarray(getattr(a, part)),
                            err_msg=f"{f.name}.{part}")
                    assert (u.tn, u.te, u.n_chunks, u.k_src) == \
                        (a.tn, a.te, a.n_chunks, a.k_src)
                    continue
                np.testing.assert_array_equal(np.asarray(u), np.asarray(a),
                                              err_msg=f.name)

    def test_pretrain_targets_roundtrip(self, ft_graphs):
        loader = BatchLoader(ft_graphs, 4, spec=_spec(ft_graphs),
                             shuffle=False, to_device=False, with_targets=True)
        b = next(iter(loader))
        lay = build_layout(b, jnp.float32)
        ub = unpack_batch(jnp.asarray(pack_batch(b, lay)), lay)
        for f in ("bnd_lngth", "bnd_angl", "dh_angl"):
            np.testing.assert_array_equal(np.asarray(getattr(ub, f)),
                                          np.asarray(getattr(b, f)), err_msg=f)


class TestPackedStep:
    def test_loss_matches_unpacked(self, ft_graphs):
        spec = _spec(ft_graphs)
        model = FragNetFineTune(num_layer=2, num_heads=4, emb_dim=64,
                                h1=32, h2=32, h3=32, h4=32)
        tx = make_optimizer("adam", lr=1e-3)
        plain = BatchLoader(ft_graphs, 4, spec=spec, shuffle=False)
        packed = BatchLoader(ft_graphs, 4, spec=spec, shuffle=False, pack=True)
        b0 = next(iter(plain))
        p0 = next(iter(packed))
        params = model.init(jax.random.PRNGKey(0), b0, deterministic=True)
        rng = jax.random.PRNGKey(1)

        params2 = jax.tree.map(lambda x: x.copy(), params)  # step donates
        s1 = TrainState.create(params, tx)
        s1, l1 = make_train_step(model, tx, "mse")(s1, b0, rng)
        s2 = TrainState.create(params2, tx)
        s2, l2 = make_train_step(model, tx, "mse",
                                 layout=packed.layout)(s2, p0, rng)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
        a = jax.tree.leaves(s1.params)[0]
        c = jax.tree.leaves(s2.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-6)


class TestLoaders:
    def test_threaded_prefetch_same_batches(self, ft_graphs):
        loader = BatchLoader(ft_graphs, 4, spec=_spec(ft_graphs),
                             shuffle=False)
        direct = [np.asarray(b.y) for b in loader]
        pre = [np.asarray(b.y) for b in loader.prefetch(depth=2)]
        assert len(direct) == len(pre)
        for d, p in zip(direct, pre):
            np.testing.assert_array_equal(d, p)

    def test_prefetch_propagates_errors(self, ft_graphs):
        loader = BatchLoader(ft_graphs, 4, spec=_spec(ft_graphs))
        loader.graphs[0] = None  # poison → AttributeError in worker
        import pytest

        with pytest.raises(Exception):
            list(loader.prefetch())

    def test_device_cache_permutes(self, ft_graphs):
        loader = BatchLoader(ft_graphs, 2, spec=spec_for(ft_graphs, 2),
                             shuffle=False)
        cache = DeviceCacheLoader(loader, seed=3)
        e1 = [float(np.asarray(b.y).sum()) for b in cache]
        e2 = [float(np.asarray(b.y).sum()) for b in cache]
        assert sorted(e1) == sorted(e2)
        assert len(e1) == len(cache)


class TestPackedPretrainStep:
    def test_pretrain_loss_matches_unpacked(self, ft_graphs):
        """make_pretrain_step(layout=...) on the packed buffer must equal the
        plain step on the original batch (the run_pretrain streaming path)."""
        import jax

        from fragnet_tpu.model.pretrain import FragNetPreTrain
        from fragnet_tpu.train.loop import TrainState
        from fragnet_tpu.train.optim import make_optimizer
        from fragnet_tpu.train.pretrain import make_pretrain_step
        from fragnet_tpu.data.datasets import PretrainData

        maker = PretrainData(data_type="exp1s")
        graphs = maker.get_pt_dataset(
            ["CCO", "c1ccccc1", "CC(=O)O", "CCN"], seed=0)
        loader = BatchLoader(graphs, 4, spec=_spec(graphs),
                             shuffle=False, to_device=False,
                             with_targets=True)
        b = next(iter(loader))
        lay = build_layout(b, jnp.float32)
        buf = jnp.asarray(pack_batch(b, lay))

        model = FragNetPreTrain(num_layer=1, num_heads=2, emb_dim=16)
        bj = jax.tree.map(
            lambda x: jnp.asarray(x) if x is not None else None, b)
        params = model.init(jax.random.PRNGKey(0), bj, deterministic=True)
        tx = make_optimizer("adam", lr=1e-3)

        params2 = jax.tree.map(lambda x: x.copy(), params)  # step donates
        s1 = TrainState.create(params, tx)
        s2 = TrainState.create(params2, tx)
        step_plain = make_pretrain_step(model, tx)
        step_packed = make_pretrain_step(model, tx, layout=lay)
        rng = jax.random.PRNGKey(1)
        for _ in range(2):
            s1, l1 = step_plain(s1, bj, rng)
            s2, l2 = step_packed(s2, buf, rng)
            np.testing.assert_allclose(float(l1), float(l2),
                                       rtol=1e-5, atol=1e-6)


class TestProcessStream:
    def test_multiworker_order_and_content(self, ft_graphs):
        """Spawned multi-worker packed stream must reproduce the thread-mode
        buffer sequence exactly (deterministic shuffle walk + reorder)."""
        spec = _spec(ft_graphs)
        mk = lambda: BatchLoader(ft_graphs, 4, spec=spec, shuffle=True,
                                 seed=0, pack=True, to_device=False,
                                 compute_dtype=jnp.float32)
        base = mk()
        next(iter(base))
        ref_l = mk(); ref_l.layout = base.layout
        ref = [np.asarray(b) for b in ref_l.stream(2, process=False)]
        got_l = mk(); got_l.layout = base.layout
        got = [np.asarray(b) for b in got_l.stream(2, process=True,
                                                   workers=2)]
        assert len(got) == len(ref)
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(a, b)


class TestAlignedMaskSafety:
    """ADVICE r4 medium #1: tile-aligned packing creates mid-array mask gaps;
    the count encoding must never be locked in from a lucky template, and a
    non-prefix mask under a MASKC layout must raise instead of corrupting."""

    def test_aligned_layout_forces_i8_node_masks(self, ft_graphs):
        spec = spec_for(ft_graphs, batch_size=4, multiple=16, tcsr=True,
                        tn=16, te=16, align=True)
        loader = BatchLoader(ft_graphs, 4, spec=spec, shuffle=False,
                             to_device=False, pack=True)
        next(iter(loader))
        from fragnet_tpu.data.packing import I8

        for f in ("atom_mask", "edge_mask", "frag_mask", "fconn_mask"):
            assert loader.layout.entry(f).enc == I8, f

    def test_maskc_checked_on_every_pack(self, ft_graphs):
        loader = BatchLoader(ft_graphs, 4, spec=_spec(ft_graphs),
                             shuffle=False, to_device=False)
        b = next(iter(loader))
        lay = build_layout(b, jnp.float32)
        assert lay.entry("atom_mask").enc == "maskc"
        bad_mask = np.asarray(b.atom_mask).copy()
        c = int(bad_mask.sum())
        bad_mask[c // 2] = 0.0  # mid-array hole
        bad = dataclasses.replace(b, atom_mask=bad_mask)
        with pytest.raises(ValueError, match="contiguous prefix"):
            pack_batch(bad, lay, validate=False)

    def test_missing_tilemeta_raises_clearly(self, ft_graphs):
        loader = BatchLoader(ft_graphs, 4, spec=_spec(ft_graphs, tcsr=True),
                             shuffle=False, to_device=False)
        b = next(iter(loader))
        lay = build_layout(b, jnp.float32)
        bad = dataclasses.replace(b, tm_atom=None)
        with pytest.raises(ValueError, match="TCSR windows"):
            pack_batch(bad, lay)


class TestPackedCacheLoader:
    """Pack-once host cache (data/batcher.py PackedCacheLoader): epoch-1
    buffers identical to the plain packed loader; later epochs replay all
    buffers in a reshuffled order; stream() covers n_epochs exactly."""

    def test_buffers_match_plain_loader(self, ft_graphs):
        from fragnet_tpu.data.batcher import PackedCacheLoader

        spec = _spec(ft_graphs)
        loader = BatchLoader(ft_graphs, 4, spec=spec, shuffle=True, seed=3,
                             to_device=False, pack=True)
        cache = PackedCacheLoader(loader, seed=0, workers=1, to_device=False)
        ref = BatchLoader(ft_graphs, 4, spec=spec, shuffle=True, seed=3,
                          to_device=False, pack=True)
        expected = [np.asarray(b) for b in ref]
        assert len(cache.bufs) == len(expected) > 0
        for i, (a, b) in enumerate(zip(cache.bufs, expected)):
            np.testing.assert_array_equal(a, b, err_msg=f"batch {i}")

    def test_epochs_reshuffle_and_cover(self, ft_graphs):
        from fragnet_tpu.data.batcher import PackedCacheLoader

        loader = BatchLoader(ft_graphs, 2, spec=_spec(ft_graphs),
                             shuffle=True, seed=3, to_device=False, pack=True)
        cache = PackedCacheLoader(loader, seed=0, workers=1, to_device=False)
        key = lambda b: b.tobytes()
        all_keys = sorted(key(b) for b in cache.bufs)
        e1 = [key(b) for b in cache]
        e2 = [key(b) for b in cache]
        assert sorted(e1) == all_keys and sorted(e2) == all_keys
        n = sum(1 for _ in cache.stream(3))
        assert n == 3 * len(cache)

    def test_budget_guard(self, ft_graphs):
        from fragnet_tpu.data.batcher import PackedCacheLoader

        loader = BatchLoader(ft_graphs, 2, spec=_spec(ft_graphs),
                             shuffle=False, to_device=False, pack=True)
        with pytest.raises(MemoryError, match="budget"):
            PackedCacheLoader(loader, workers=1, to_device=False, max_bytes=8)


class TestDevicePlanes:
    """Dense planes rebuilt ON DEVICE in unpack_batch (layout.dp_specs):
    must equal the host builder exactly, and the aligned packed step must
    match the plain aligned step through the planes kernels."""

    def _aligned_spec(self, graphs):
        return spec_for(graphs, batch_size=4, multiple=16, tcsr=True,
                        tn=16, te=16, align=True)

    def test_planes_match_host_builder(self, ft_graphs):
        spec = self._aligned_spec(ft_graphs)
        plain = BatchLoader(ft_graphs, 4, spec=spec, shuffle=False,
                            to_device=False)
        packed = BatchLoader(ft_graphs, 4, spec=spec, shuffle=False,
                             to_device=False, pack=True)
        b = next(iter(plain))
        pb = next(iter(packed))
        lay = packed.layout
        assert lay.dp_specs, "no dp level enabled for this dataset"
        ub = unpack_batch(jnp.asarray(pb), lay)
        for lvl in [d[0] for d in lay.dp_specs]:
            host = getattr(b, lvl)
            dev = getattr(ub, lvl)
            assert host is not None and dev is not None, lvl
            np.testing.assert_array_equal(np.asarray(dev), np.asarray(host),
                                          err_msg=lvl)

    def test_aligned_packed_step_matches_plain(self, ft_graphs):
        spec = self._aligned_spec(ft_graphs)
        model = FragNetFineTune(num_layer=2, num_heads=4, emb_dim=64,
                                h1=32, h2=32, h3=32, h4=32)
        tx = make_optimizer("adam", lr=1e-3)
        plain = BatchLoader(ft_graphs, 4, spec=spec, shuffle=False)
        packed = BatchLoader(ft_graphs, 4, spec=spec, shuffle=False,
                             pack=True)
        b0 = next(iter(plain))
        p0 = next(iter(packed))
        params = model.init(jax.random.PRNGKey(0), b0, deterministic=True)
        rng = jax.random.PRNGKey(1)
        params2 = jax.tree.map(lambda x: x.copy(), params)  # step donates
        s1 = TrainState.create(params, tx)
        s1, l1 = make_train_step(model, tx, "mse")(s1, b0, rng)
        s2 = TrainState.create(params2, tx)
        s2, l2 = make_train_step(model, tx, "mse",
                                 layout=packed.layout)(s2, p0, rng)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
        a = jax.tree.leaves(s1.params)[0]
        c = jax.tree.leaves(s2.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-5)


class TestDevicePackedCache:
    def test_device_cache_covers_and_reshuffles(self, ft_graphs):
        from fragnet_tpu.data.batcher import DevicePackedCacheLoader

        loader = BatchLoader(ft_graphs, 2, spec=_spec(ft_graphs),
                             shuffle=True, seed=3, to_device=False, pack=True)
        cache = DevicePackedCacheLoader(loader, seed=0, workers=1)
        assert len(cache) >= 2
        key = lambda b: np.asarray(b).tobytes()
        all_keys = sorted(key(b) for b in cache.bufs)
        e1 = [key(b) for b in cache]
        assert sorted(e1) == all_keys
        assert sum(1 for _ in cache.stream(2)) == 2 * len(cache)

    def test_budget_guard(self, ft_graphs):
        from fragnet_tpu.data.batcher import DevicePackedCacheLoader

        loader = BatchLoader(ft_graphs, 2, spec=_spec(ft_graphs),
                             shuffle=False, to_device=False, pack=True)
        with pytest.raises(MemoryError):
            DevicePackedCacheLoader(loader, workers=1, max_bytes=8)
