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

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs a multi-device mesh"
)


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
