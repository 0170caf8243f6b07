"""C++ native host runtime (fragnet_tpu/native): build + parity vs the
pure-Python implementations."""

import numpy as np
import pytest

from fragnet_tpu import native


def _py_line_graph(endpoints):
    """The pure-Python reference (graphs/build.py fallback)."""
    incident = {}
    for e, (u, v) in enumerate(endpoints):
        incident.setdefault(u, []).append(e)
        incident.setdefault(v, []).append(e)
    res0, res1 = [], []
    for i, (u, v) in enumerate(endpoints):
        cand = set(incident[u])
        cand.update(incident[v])
        s_i = {u, v}
        for j in sorted(cand):
            s_j = set(endpoints[j])
            if len(s_i & s_j) == 1:
                res0.append(i)
                res1.append(j)
    return res0, res1


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
class TestNativeLineGraph:
    def test_parity_random(self):
        r = np.random.default_rng(0)
        for trial in range(20):
            n = int(r.integers(2, 30))
            e = int(r.integers(1, 60))
            src = r.integers(0, n, e).astype(np.int32)
            dst = r.integers(0, n, e).astype(np.int32)
            out = native.line_graph(src, dst, n)
            assert out is not None
            p0, p1 = _py_line_graph(list(zip(src.tolist(), dst.tolist())))
            np.testing.assert_array_equal(out[0], p0)
            np.testing.assert_array_equal(out[1], p1)

    def test_self_edge_set_semantics(self):
        # self-edge {u} intersects {u,v} with size 1; (i,i) kept for it
        src = np.array([0, 0], np.int32)
        dst = np.array([0, 1], np.int32)
        out = native.line_graph(src, dst, 2)
        p = _py_line_graph([(0, 0), (0, 1)])
        np.testing.assert_array_equal(out[0], p[0])
        np.testing.assert_array_equal(out[1], p[1])


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
class TestNativeTileMeta:
    def test_parity_with_numpy(self):
        import fragnet_tpu.ops.tcsr as tcsr

        r = np.random.default_rng(1)
        src_l, dst_l, off = [], [], 0
        for _ in range(8):
            nn = int(r.integers(4, 20))
            ne = int(r.integers(3, 25))
            src_l.append(r.integers(0, nn, ne) + off)
            dst_l.append(r.integers(0, nn, ne) + off)
            off += nn
        src = np.concatenate(src_l).astype(np.int32)
        dst = np.concatenate(dst_l).astype(np.int32)
        E0 = len(src)
        N = ((off + 31) // 32) * 32
        E = ((E0 + 31) // 32) * 32 + 32
        mask = np.zeros(E, np.float32)
        mask[:E0] = 1
        sp = np.zeros(E, np.int32)
        dp = np.zeros(E, np.int32)
        sp[:E0], dp[:E0] = src, dst

        nat = native.tile_meta_arrays(sp, dp, mask, N, 32, 32, None, None)
        assert nat is not None and nat != "overflow"
        # numpy path (bypass the native shortcut by calling internals)
        ref = tcsr.build_tile_meta.__wrapped__(sp, dp, mask, N, 32, 32) \
            if hasattr(tcsr.build_tile_meta, "__wrapped__") else None
        # compare against the module-level numpy logic via a fresh call with
        # native disabled
        import fragnet_tpu.native as nmod
        lib, tried = nmod._lib, nmod._tried
        nmod._lib, nmod._tried = None, True
        try:
            ref = tcsr.build_tile_meta(sp, dp, mask, N, 32, 32)
        finally:
            nmod._lib, nmod._tried = lib, tried
        ew, sw, flat, nc, kk = nat
        assert nc == ref.n_chunks and kk == ref.k_src
        np.testing.assert_array_equal(ew, ref.ew_blk)
        np.testing.assert_array_equal(sw, ref.sw_tile)
        np.testing.assert_array_equal(flat, ref.flat_slot)
