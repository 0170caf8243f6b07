"""Segment op tests: parity with dense math, masking semantics, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fragnet_tpu.ops.segment import gat_attention_pass, segment_softmax, segment_sum


class TestSegmentSum:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        data = rng.standard_normal((20, 5)).astype(np.float32)
        seg = rng.integers(0, 7, 20)
        out = segment_sum(jnp.asarray(data), jnp.asarray(seg), 7)
        expect = np.zeros((7, 5), np.float32)
        np.add.at(expect, seg, data)
        np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)

    def test_mask_zeroes_rows(self):
        data = jnp.ones((4, 2))
        seg = jnp.array([0, 0, 1, 1])
        mask = jnp.array([1.0, 0.0, 1.0, 1.0])
        out = segment_sum(data, seg, 2, mask=mask)
        np.testing.assert_allclose(out, [[1, 1], [2, 2]])


class TestSegmentSoftmax:
    def test_matches_dense_softmax(self):
        rng = np.random.default_rng(1)
        logits = rng.standard_normal((12, 3)).astype(np.float32)
        seg = np.repeat(np.arange(4), 3)
        out = np.asarray(segment_softmax(jnp.asarray(logits), jnp.asarray(seg), 4))
        for s in range(4):
            rows = logits[seg == s]
            e = np.exp(rows - rows.max(axis=0))
            np.testing.assert_allclose(
                out[seg == s], e / e.sum(axis=0), rtol=1e-5, atol=1e-6
            )

    def test_sums_to_one_per_segment(self):
        rng = np.random.default_rng(2)
        logits = jnp.asarray(rng.standard_normal((30, 4)).astype(np.float32)) * 10
        seg = jnp.asarray(rng.integers(0, 5, 30))
        out = segment_softmax(logits, seg, 5)
        sums = segment_sum(out, seg, 5)
        np.testing.assert_allclose(sums, np.ones((5, 4)), rtol=1e-5)

    def test_masked_entries_zero_and_excluded(self):
        logits = jnp.array([1.0, 2.0, 100.0, 3.0])
        seg = jnp.array([0, 0, 0, 1])
        mask = jnp.array([1.0, 1.0, 0.0, 1.0])
        out = np.asarray(segment_softmax(logits, seg, 2, mask=mask))
        assert out[2] == 0.0
        np.testing.assert_allclose(out[0] + out[1], 1.0, rtol=1e-6)
        e = np.exp([1.0 - 2.0, 0.0])
        np.testing.assert_allclose(out[:2], e / e.sum(), rtol=1e-5)

    def test_empty_segment_no_nan(self):
        logits = jnp.array([1.0, 2.0])
        seg = jnp.array([0, 0])
        out = segment_softmax(logits, seg, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_all_masked_segment_no_nan(self):
        logits = jnp.array([1.0, 2.0, 5.0])
        seg = jnp.array([0, 1, 1])
        mask = jnp.array([1.0, 0.0, 0.0])
        out = np.asarray(segment_softmax(logits, seg, 2, mask=mask))
        assert np.isfinite(out).all()
        assert out[1] == 0.0 and out[2] == 0.0

    def test_large_logits_stable(self):
        logits = jnp.array([1000.0, 1001.0, -1000.0])
        seg = jnp.array([0, 0, 0])
        out = np.asarray(segment_softmax(logits, seg, 1))
        assert np.isfinite(out).all()
        np.testing.assert_allclose(out.sum(), 1.0, rtol=1e-5)

    def test_grad_finite(self):
        def loss(l):
            return segment_softmax(l, jnp.array([0, 0, 1, 1]), 2,
                                   mask=jnp.array([1.0, 1.0, 1.0, 0.0])).sum()

        g = jax.grad(loss)(jnp.array([1.0, 2.0, 3.0, 4.0]))
        assert np.isfinite(np.asarray(g)).all()


class TestGatAttentionPass:
    def test_against_manual(self):
        rng = np.random.default_rng(3)
        N, E, H, D, Da = 5, 8, 2, 4, 3
        nf = rng.standard_normal((N, H, D)).astype(np.float32)
        ea = rng.standard_normal((E, H, Da)).astype(np.float32)
        src = rng.integers(0, N, E)
        dst = rng.integers(0, N, E)
        a = rng.standard_normal((H, 2 * D + Da)).astype(np.float32)

        out, attn = gat_attention_pass(
            jnp.asarray(nf), jnp.asarray(ea), jnp.asarray(src),
            jnp.asarray(dst), jnp.asarray(a), N,
        )

        # manual
        msg = np.concatenate([nf[dst], ea, nf[src]], axis=-1)
        logits = (msg * a[None]).sum(-1)
        logits = np.where(logits >= 0, logits, 0.2 * logits)
        probs = np.zeros_like(logits)
        for n in range(N):
            sel = dst == n
            if sel.any():
                rows = logits[sel]
                e = np.exp(rows - rows.max(axis=0))
                probs[sel] = e / e.sum(axis=0)
        expect = np.zeros((N, H, D), np.float32)
        np.add.at(expect, dst, probs[..., None] * nf[src])
        expect_attn = np.zeros((N, H), np.float32)
        np.add.at(expect_attn, src, probs)
        np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(attn, expect_attn, rtol=1e-4, atol=1e-5)
