"""Dense per-tile GAT pass — the zero-gather kernel for rank-structured
edge attributes (bond + fconn levels).

The TCSR fused kernel (``ops/pallas_gat.py``) executes every irregular
gather/scatter as a one-hot MXU matmul; the measured roofline (BASELINE.md)
shows 99.7-99.8% of its MXU flops are redundant selection work. This module
removes the per-edge machinery entirely for the two levels whose edge-attr
logit term is a LOW-RANK function of the raw edge features:

  * bond line graph (reference gat2.py:137-169): raw edge attr is the 1-dim
    cos-angle (data.py:175), so w_ea_e = cos_e * v_h + c_h with
    v = W @ a_ea^T, c = b @ a_ea^T folded from the embed Dense
    (gat2.py:66 edge_attr_bond_embed) and the attention vector;
  * fconn line graph (gat2.py:238-278): raw attr is the 6-dim connection
    one-hot sum (data.py:263-310) → rank-6.

With the batcher packing molecules TILE-ALIGNED (graphs/hiergraph.py
``PadSpec.align``: no molecule straddles a Tn-node tile), every edge of a
tile has BOTH endpoints inside that tile, so the whole pass becomes dense
per-tile flash attention over a (Tn, Tn) adjacency plane:

    z[i,j,h] = leaky(wd[i,h] + ws[j,h] + Σ_r EA_r[i,j]·v[r,h] + c[h])
    out[i]   = Σ_j softmax_j(z masked by adj)[i,j,h] · nf[j,h,:]

The host builds (adjacency, EA_1..EA_R) planes ONCE per batch
(``build_dense_planes``); per grid step the kernel is pure VPU sweeps over
(Tn, Tn) arrays plus H tiny (Tn,Tn)x(Tn,D) MXU matmuls — executed flops per
edge drop ~50x vs the one-hot strategy and the grid has ONE step per tile
(no edge chunks). Math contract: ops/segment.py:gat_attention_pass.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
_HI = jax.lax.Precision.HIGHEST

# Flip to True (tests do) to run the kernels in interpreter mode on CPU.
INTERPRET = False


def _leaky(x, slope):
    return jnp.where(x > 0, x, slope * x)


# --------------------------------------------------------------------------
# host-side plane builder
# --------------------------------------------------------------------------

def build_dense_planes(
    src: np.ndarray,
    dst: np.ndarray,
    edge_mask: np.ndarray,
    edge_attr: np.ndarray,   # (E, R) raw edge attrs
    n_nodes: int,
    tn: int = 128,
) -> Optional[np.ndarray]:
    """(n_tiles, (R+1)*tn, tn) f32: per dst tile, rows [0,tn) = adjacency
    (1.0 where edge), rows [(r+1)tn,(r+2)tn) = raw attr plane r. Returns
    None when any real edge crosses a tile boundary (batch not aligned —
    caller falls back to the TCSR path) or a (dst,src) slot is duplicated."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    keep = np.asarray(edge_mask) > 0
    ea = np.asarray(edge_attr, np.float32)
    R = ea.shape[1]
    if n_nodes % tn:
        return None
    n_tiles = n_nodes // tn
    s, d, a = src[keep], dst[keep], ea[keep]
    if (s // tn != d // tn).any():
        return None
    t = d // tn
    di, sj = d % tn, s % tn
    flat = t * tn * tn + di * tn + sj
    if len(np.unique(flat)) != len(flat):
        return None  # duplicate (dst, src) pair — dense slot would collide
    planes = np.zeros((n_tiles, (R + 1) * tn, tn), np.float32)
    planes[t, di, sj] = 1.0
    for r in range(R):
        planes[t, (r + 1) * tn + di, sj] = a[:, r]
    return planes


# --------------------------------------------------------------------------
# kernels
# --------------------------------------------------------------------------

def _fwd_kernel(planes_ref, wd_ref, wsT_ref, nf_ref, vc_ref,
                out_ref, m_ref, den_ref, *, tn, H, D, R, slope, big_prec):
    f32 = jnp.float32
    adj = planes_ref[0, :tn, :].astype(f32)
    msk = adj > 0.0
    nf = nf_ref[:].astype(f32)
    for h in range(H):
        zpre = wd_ref[:, h:h + 1] + wsT_ref[h:h + 1, :]      # (Tn, Tn)
        for r in range(R):
            zpre = zpre + planes_ref[0, (r + 1) * tn:(r + 2) * tn, :] \
                * vc_ref[r, h]
        zpre = zpre + vc_ref[R, h]
        z = jnp.where(msk, _leaky(zpre, slope), _NEG)
        m_h = jnp.max(z, axis=1, keepdims=True)              # (Tn, 1)
        p = jnp.exp(z - m_h) * adj
        den = jnp.sum(p, axis=1, keepdims=True)
        deng = jnp.where(den == 0.0, 1.0, den)
        out_h = jax.lax.dot_general(
            p, jax.lax.slice(nf, (0, h * D), (tn, (h + 1) * D)),
            (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=big_prec)
        out_ref[:, h * D:(h + 1) * D] = out_h / deng
        m_ref[:, h:h + 1] = m_h
        den_ref[:, h:h + 1] = den


def _bwd_kernel(planes_ref, wd_ref, wsT_ref, nf_ref, vc_ref, m_ref, den_ref,
                g_ref, s_ref,
                d_wd_ref, d_wsT_ref, d_nf_ref, d_vc_ref,
                *, tn, H, D, R, slope, big_prec):
    f32 = jnp.float32
    adj = planes_ref[0, :tn, :].astype(f32)
    msk = adj > 0.0
    nf = nf_ref[:].astype(f32)
    d_vc_rows = []
    for h in range(H):
        zpre = wd_ref[:, h:h + 1] + wsT_ref[h:h + 1, :]
        for r in range(R):
            zpre = zpre + planes_ref[0, (r + 1) * tn:(r + 2) * tn, :] \
                * vc_ref[r, h]
        zpre = zpre + vc_ref[R, h]
        z = jnp.where(msk, _leaky(zpre, slope), _NEG)
        m_h = m_ref[:, h:h + 1]
        den_h = den_ref[:, h:h + 1]
        deng = jnp.where(den_h == 0.0, 1.0, den_h)
        p = jnp.exp(z - m_h) * adj / deng                    # (Tn, Tn)
        g_h = jax.lax.slice(g_ref[:], (0, h * D), (tn, (h + 1) * D))
        nf_h = jax.lax.slice(nf, (0, h * D), (tn, (h + 1) * D))
        d_p = jax.lax.dot_general(
            g_h, nf_h, (((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=big_prec)   # (Tn, Tn)
        d_z = p * (d_p - s_ref[:, h:h + 1])
        d_zpre = d_z * jnp.where(zpre > 0, 1.0, slope) * adj
        d_nf_ref[:, h * D:(h + 1) * D] = jax.lax.dot_general(
            p, g_h, (((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=big_prec)
        d_wd_ref[:, h:h + 1] = jnp.sum(d_zpre, axis=1, keepdims=True)
        d_wsT_ref[h:h + 1, :] = jnp.sum(d_zpre, axis=0, keepdims=True)
        col = [jnp.sum(
            d_zpre * planes_ref[0, (r + 1) * tn:(r + 2) * tn, :])
            for r in range(R)] + [jnp.sum(d_zpre)]
        d_vc_rows.append(col)
    # (R+1, H) scalar block, padded to the (8, 128) min f32 tile
    vc = jnp.zeros((8, 128), f32)
    for h in range(H):
        for r in range(R + 1):
            oh = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == r) & \
                 (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == h)
            vc = vc + jnp.where(oh, d_vc_rows[h][r], 0.0)
    d_vc_ref[0] = vc


# --------------------------------------------------------------------------
# pallas_call builders + custom VJP
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _build(N, tn, H, D, R, slope, dt_name, interpret):
    dt = jnp.dtype(dt_name)
    big_prec = _HI if dt == jnp.float32 else jax.lax.Precision.DEFAULT
    HD = H * D
    n_tiles = N // tn
    kp = dict(tn=tn, H=H, D=D, R=R, slope=slope, big_prec=big_prec)
    comp = pltpu.CompilerParams(dimension_semantics=("arbitrary",))

    planes_spec = pl.BlockSpec((1, (R + 1) * tn, tn), lambda t: (t, 0, 0))
    tile = lambda w: pl.BlockSpec((tn, w), lambda t: (t, 0))
    wsT_spec = pl.BlockSpec((8, tn), lambda t: (0, t))
    vc_spec = pl.BlockSpec((8, 128), lambda t: (0, 0))

    fwd = pl.pallas_call(
        functools.partial(_fwd_kernel, **kp),
        grid=(n_tiles,),
        in_specs=[planes_spec, tile(H), wsT_spec, tile(HD), vc_spec],
        out_specs=[tile(HD), tile(H), tile(H)],
        out_shape=[
            jax.ShapeDtypeStruct((N, HD), jnp.float32),
            jax.ShapeDtypeStruct((N, H), jnp.float32),
            jax.ShapeDtypeStruct((N, H), jnp.float32),
        ],
        compiler_params=comp,
        interpret=interpret,
    )
    bwd = pl.pallas_call(
        functools.partial(_bwd_kernel, **kp),
        grid=(n_tiles,),
        in_specs=[planes_spec, tile(H), wsT_spec, tile(HD), vc_spec,
                  tile(H), tile(H), tile(HD), tile(H)],
        out_specs=[tile(H), wsT_spec,
                   tile(HD),
                   pl.BlockSpec((1, 8, 128), lambda t: (t, 0, 0))],
        out_shape=[
            jax.ShapeDtypeStruct((N, H), jnp.float32),
            jax.ShapeDtypeStruct((8, N), jnp.float32),
            jax.ShapeDtypeStruct((N, HD), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32),
        ],
        compiler_params=comp,
        interpret=interpret,
    )
    return fwd, bwd


@functools.lru_cache(maxsize=64)
def _make_op(N, tn, H, D, R, slope, dt_name, interpret):
    fwd_call, bwd_call = _build(N, tn, H, D, R, slope, dt_name, interpret)
    HD = H * D
    f32 = jnp.float32

    def prologue(nf, a):
        nf32 = nf.astype(f32)
        a32 = a.astype(f32)
        a_dst, a_src = a32[:, :D], a32[:, D:]
        wd = jnp.einsum("nhd,hd->nh", nf32, a_dst)
        ws = jnp.einsum("nhd,hd->nh", nf32, a_src)
        wsT = jnp.zeros((8, N), f32).at[:H].set(ws.T)
        return wd, wsT, a_dst, a_src

    def pack_vc(v, c):
        vc = jnp.zeros((8, 128), f32)
        vc = vc.at[:R, :H].set(v.astype(f32))
        return vc.at[R, :H].set(c.reshape(-1).astype(f32))

    def run_fwd(nf, planes, v, c, a):
        wd, wsT, *_ = prologue(nf, a)
        return fwd_call(planes, wd, wsT, nf.reshape(N, HD), pack_vc(v, c))

    @jax.custom_vjp
    def op(nf, planes, v, c, a):
        out, m, den = run_fwd(nf, planes, v, c, a)
        return out.reshape(N, H, D).astype(nf.dtype), m, den

    def op_fwd(nf, planes, v, c, a):
        out, m, den = run_fwd(nf, planes, v, c, a)
        return ((out.reshape(N, H, D).astype(nf.dtype), m, den),
                (nf, planes, v, c, a, out, m, den))

    def op_bwd(res, gs):
        g = gs[0]  # m/den cotangents: stop-grad interpretability outputs
        nf, planes, v, c, a, out, m, den = res
        wd, wsT, a_dst, a_src = prologue(nf, a)
        nf32 = nf.astype(f32)
        g32 = g.reshape(N, HD).astype(f32)
        s = jnp.einsum("nhd,nhd->nh", g32.reshape(N, H, D),
                       out.reshape(N, H, D))
        d_wd, d_wsT, d_nf_agg, d_vc = bwd_call(
            planes, wd, wsT, nf.reshape(N, HD), pack_vc(v, c), m, den, g32, s)
        d_ws = jnp.transpose(d_wsT)[:, :H]                    # (N, H)
        d_nf = (d_nf_agg
                + jnp.einsum("nh,hd->nhd", d_wd, a_dst).reshape(N, HD)
                + jnp.einsum("nh,hd->nhd", d_ws, a_src).reshape(N, HD))
        d_a = jnp.concatenate([
            jnp.einsum("nh,nhd->hd", d_wd, nf32),
            jnp.einsum("nh,nhd->hd", d_ws, nf32),
        ], axis=-1)
        d_v = jnp.sum(d_vc[:, :R, :H], axis=0)
        d_c = jnp.sum(d_vc[:, R, :H], axis=0).reshape(c.shape)
        return (d_nf.reshape(N, H, D).astype(nf.dtype),
                jnp.zeros_like(planes), d_v.astype(v.dtype),
                d_c.astype(c.dtype), d_a.astype(a.dtype))

    op.defvjp(op_fwd, op_bwd)
    return op


def dense_gat_pass(
    node_feats_h: jnp.ndarray,   # (N, H, D)
    planes: jnp.ndarray,         # (n_tiles, (R+1)*tn, tn) f32
    v: jnp.ndarray,              # (R, H) folded edge-attr projection
    c: jnp.ndarray,              # (H,) or (1, H) folded bias term
    edge_attr: jnp.ndarray,      # (E, Da) embedded attrs — epilogue only
    src: jnp.ndarray,            # (E,) i32 — epilogue only
    dst: jnp.ndarray,
    edge_mask: jnp.ndarray,
    attn_vec: jnp.ndarray,       # (H, 2D + Da) — [dst | ea | src] layout
    negative_slope: float = 0.2,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense-tile GAT pass (math contract: ops/segment.py:gat_attention_pass
    with self_loops=False). ``v``/``c`` must satisfy
    ``edge_attr_embedded[e] @ a_ea^T == raw_ea[e] @ v + c`` — the caller
    folds the embed Dense and the a_ea slice of the attention vector
    (model/layers.py builds them with a basis-apply through the SAME flax
    module, so autodiff reaches the embed params through this op's d_v/d_c).

    Returns (out (N,H,D), attn_by_src (N,H)); the attention epilogue
    (gat2.py:165-167 summed-by-source probabilities) is reconstructed in
    XLA from (m, den) exactly as in pallas_gat_pass."""
    N, H, D = node_feats_h.shape
    R = v.shape[0]
    tn = planes.shape[2]
    Da = edge_attr.shape[-1]
    if interpret is None:
        interpret = INTERPRET or jax.default_backend() != "tpu"
    a2 = jnp.concatenate([attn_vec[:, :D], attn_vec[:, D + Da:]], axis=-1)
    op = _make_op(N, tn, H, D, R, float(negative_slope),
                  str(node_feats_h.dtype), bool(interpret))
    out, m, den = op(node_feats_h, planes, v, c, a2)

    # ---- attention epilogue (gat2.py:165-167 semantics; stop-grad) --------
    f32 = jnp.float32
    sg = jax.lax.stop_gradient
    nf32 = sg(node_feats_h).astype(f32)
    a32 = sg(attn_vec).astype(f32)
    a_dst, a_ea, a_src = a32[:, :D], a32[:, D:D + Da], a32[:, D + Da:]
    w_dst = jnp.einsum("nhd,hd->nh", nf32, a_dst)
    w_src = jnp.einsum("nhd,hd->nh", nf32, a_src)
    w_ea = sg(edge_attr).astype(f32) @ a_ea.T
    m_s = sg(m)
    den_s = jnp.where(sg(den) == 0.0, 1.0, sg(den))
    z = _leaky(w_dst[dst] + w_src[src] + w_ea, negative_slope)
    expo = jnp.where(sg(edge_mask).astype(f32)[:, None] > 0,
                     z - m_s[dst], -jnp.inf)
    p = jnp.exp(expo) / den_s[dst]
    attn = jax.ops.segment_sum(p, src, num_segments=N)
    return out, attn
