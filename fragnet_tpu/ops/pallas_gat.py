"""Fused Pallas GAT attention pass — the TPU-native hot kernel.

Replaces the XLA segment-op chain of ``ops/segment.py:gat_attention_pass``
(itself the re-design of torch-scatter ``scatter_softmax`` + ``scatter_add``,
reference gat2.py:137-169) with ONE fused kernel per level:

    gather h_src → SDDMM logits → online segment softmax → SpMM aggregate

XLA lowers the segment ops to serialized HBM scatters (~18 ms for the bond
line graph of a 256-molecule batch); this kernel keeps every access a
contiguous VMEM window and every irregular gather/scatter a one-hot MXU
matmul, using the TCSR layout of ``ops/tcsr.py``:

  * grid = (n_tiles, n_chunks): destination-node tiles × edge-window chunks;
  * per tile, all incoming edges live in a contiguous edge window and all
    their sources in a contiguous node window (molecule locality);
  * softmax is computed online (flash-attention style): running max m,
    denominator and numerator are rescaled per chunk;
  * self-loops (the atom pass appends one per atom with zero edge attrs,
    gat2.py:179-185) are folded in analytically at chunk 0 — they are never
    materialized as edges;
  * the backward pass re-computes logits per chunk and emits (a) node-space
    partials per tile (disjoint blocks), (b) per-edge d_logits in *tiled*
    space, which the XLA epilogue turns into per-edge gradients with a
    GATHER via ``TileMeta.flat_slot`` — no XLA scatter anywhere.

Numerics: probabilities in fp32; one-hot matmuls touching fp32 operands run
at Precision.HIGHEST, bf16 activations use the fast MXU path.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fragnet_tpu.ops.tcsr import TileMeta

_NEG = -1e30
_HI = jax.lax.Precision.HIGHEST

# Flip to True (tests do) to run the kernels in interpreter mode on CPU.
INTERPRET = False


def _leaky(x, slope):
    return jnp.where(x > 0, x, slope * x)


def _hsum(x, H, D):
    """(R, H*D) → (R, H): sum over each head's D-block via an MXU matmul with
    a block-indicator matrix (avoids 3D reshapes in Mosaic)."""
    HD = H * D
    rows = jax.lax.broadcasted_iota(jnp.int32, (HD, H), 0) // D
    cols = jax.lax.broadcasted_iota(jnp.int32, (HD, H), 1)
    B = (rows == cols).astype(jnp.float32)
    return jax.lax.dot_general(x.astype(jnp.float32), B,
                               (((1,), (0,)), ((), ())), precision=_HI)


def _hrep(x, D, prec=_HI):
    """(R, H) → (R, H*D): broadcast each head value across its D lanes
    (indicator-matrix matmul — Mosaic-safe; exact at HIGHEST)."""
    H = x.shape[1]
    HD = H * D
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, HD), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, HD), 1) // D
    Bt = (rows == cols).astype(jnp.float32)
    return jax.lax.dot_general(x.astype(jnp.float32), Bt,
                               (((1,), (0,)), ((), ())), precision=prec)


def _gather_rows(oh, tbl, prec=_HI):
    """Row-select via one-hot matmul: (R, N)·(N, H) → (R, H)."""
    return jax.lax.dot_general(oh, tbl, (((1,), (0,)), ((), ())),
                               precision=prec)


def _scatter_rows(oh, vals, prec=_HI):
    """Transpose-scatter via dot_general: Σ_r oh[r,n]·vals[r,h] → (N, H)."""
    return jax.lax.dot_general(oh, vals, (((0,), (0,)), ((), ())),
                               precision=prec)


def _seg_max(oh_b, z, H, te, width):
    """Per-column masked max: (Te, width) one-hot bool × (Te, H) values →
    (width, H). Uses per-head 2D slices (no 3D broadcasts in Mosaic)."""
    cols = []
    for h in range(H):
        z_h = jax.lax.slice(z, (0, h), (te, h + 1))        # (Te, 1)
        m_h = jnp.max(jnp.where(oh_b, z_h, _NEG), axis=0, keepdims=True)
        cols.append(m_h)                                    # (1, width)
    return jnp.transpose(jnp.concatenate(cols, axis=0))     # (width, H)


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------

def _fwd_kernel(t0_ref, ew_ref, sw_ref, cw_ref, *refs, tn, te, k, n_chunks,
                H, D, Da, self_loops, slope, big_prec):
    (wn_dst_ref, *rest) = refs
    wn_win_refs = rest[:k]
    nf_dst_ref = rest[k]
    nf_win_refs = rest[k + 1 : 2 * k + 1]
    w_ea_ref, src_ref, dst_ref, emask_ref = rest[2 * k + 1 : 2 * k + 5]
    out_ref, m_ref, den_ref = rest[2 * k + 5 : 2 * k + 8]
    acc_num, acc_m, acc_den = rest[2 * k + 8 :]

    t = pl.program_id(0)
    t_abs = t0_ref[0] + t                        # absolute dst tile (EP grids)
    c = pl.program_id(1)
    HD = H * D
    f32 = jnp.float32

    wn_dst = wn_dst_ref[:]                      # (Tn, 2H) f32
    w_dst_tile = wn_dst[:, :H]

    @pl.when(c == 0)
    def _init():
        if self_loops:
            z_self = _leaky(w_dst_tile + wn_dst[:, H:], slope)
            acc_m[:] = z_self
            acc_den[:] = jnp.ones((tn, H), f32)
            acc_num[:] = nf_dst_ref[:].astype(f32)
        else:
            acc_m[:] = jnp.full((tn, H), _NEG, f32)
            acc_den[:] = jnp.zeros((tn, H), f32)
            acc_num[:] = jnp.zeros((tn, HD), f32)

    # chunks past the tile's REAL window width hold no edges of this tile
    # (ops/tcsr.py:cw; cw ≥ 1): skip their compute entirely — their edge-block
    # index maps are clamped to cw[t]-1 so the pipeline also elides the DMA.
    @pl.when(c < cw_ref[t])
    def _compute():
        wn_win = jnp.concatenate([r[:] for r in wn_win_refs], axis=0)  # (K*Tn, 2H)
        nf_win = jnp.concatenate([r[:] for r in nf_win_refs], axis=0)  # (K*Tn, HD)

        dst_l = dst_ref[:] - t_abs * tn              # (Te, 1) i32
        src_l = src_ref[:] - sw_ref[t] * tn
        keep = (dst_l >= 0) & (dst_l < tn) & (emask_ref[:] > 0)
        oh_dst_b = (dst_l == jax.lax.broadcasted_iota(jnp.int32, (te, tn), 1)) & keep
        oh_src_b = (src_l == jax.lax.broadcasted_iota(jnp.int32, (te, k * tn), 1)) & keep
        oh_dst = oh_dst_b.astype(f32)
        keep_f = keep.astype(f32)

        z = (
            jax.lax.dot_general(oh_dst, w_dst_tile, (((1,), (0,)), ((), ())),
                                precision=big_prec)
            + jax.lax.dot_general(oh_src_b.astype(f32), wn_win[:, H:],
                                  (((1,), (0,)), ((), ())), precision=big_prec)
            + w_ea_ref[:]
        )
        z = _leaky(z, slope)
        z = jnp.where(keep, z, _NEG)                 # (Te, H)

        # per-tile-node max of this chunk
        cmax = _seg_max(oh_dst_b, z, H, te, tn)      # (Tn, H)

        m_new = jnp.maximum(acc_m[:], cmax)
        scale = jnp.exp(acc_m[:] - m_new)
        acc_den[:] = acc_den[:] * scale
        acc_num[:] = acc_num[:] * _hrep(scale, D, big_prec)

        m_e = _gather_rows(oh_dst, m_new, big_prec)  # (Te, H)
        p = jnp.exp(z - m_e) * keep_f                # (Te, H) f32
        acc_den[:] = acc_den[:] + _scatter_rows(oh_dst, p, big_prec)

        nfdt = nf_win.dtype
        h_src = jax.lax.dot_general(
            oh_src_b.astype(nfdt), nf_win, (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=big_prec,
        )                                            # (Te, HD) f32
        weighted = h_src * _hrep(p, D, big_prec)
        acc_num[:] = acc_num[:] + jax.lax.dot_general(
            oh_dst, weighted, (((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=big_prec,
        )
        acc_m[:] = m_new

    @pl.when(c == n_chunks - 1)
    def _fin():
        den = acc_den[:]
        den_g = jnp.where(den == 0.0, 1.0, den)
        out_ref[:] = acc_num[:] / _hrep(den_g, D, big_prec)
        m_ref[:] = acc_m[:]
        den_ref[:] = den


# --------------------------------------------------------------------------
# backward kernel
# --------------------------------------------------------------------------

def _bwd_kernel(t0_ref, ew_ref, sw_ref, cw_ref, *refs, tn, te, k, n_chunks,
                H, D, Da, self_loops, slope, big_prec):
    (wn_dst_ref, *rest) = refs
    wn_win_refs = rest[:k]
    nf_dst_ref = rest[k]
    nf_win_refs = rest[k + 1 : 2 * k + 1]
    (w_ea_ref, src_ref, dst_ref, emask_ref, m_tile_ref, den_tile_ref,
     gout_ref, s_ref, a_src_ref) = rest[2 * k + 1 : 2 * k + 10]
    (d_wdst_ref, d_wself_ref, d_nfdst_ref, d_z_ref, d_nfwin_ref,
     d_asrc_ref) = rest[2 * k + 10 : 2 * k + 16]
    acc_dwdst, acc_dnfw, acc_dasrc = rest[2 * k + 16 :]

    t = pl.program_id(0)
    t_abs = t0_ref[0] + t                        # absolute dst tile (EP grids)
    c = pl.program_id(1)
    HD = H * D
    f32 = jnp.float32

    wn_dst = wn_dst_ref[:]
    m_tile = m_tile_ref[:]
    den_g = jnp.where(den_tile_ref[:] == 0.0, 1.0, den_tile_ref[:])
    gout_t = gout_ref[:]                          # (Tn, HD) f32
    s_tile = s_ref[:]                             # (Tn, H) f32

    @pl.when(c == 0)
    def _init():
        acc_dwdst[:] = jnp.zeros((tn, H), f32)
        acc_dnfw[:] = jnp.zeros((k * tn, HD), f32)
        if self_loops:
            z_pre = wn_dst[:, :H] + wn_dst[:, H:]
            logit = _leaky(z_pre, slope)
            p_self = jnp.exp(logit - m_tile) / den_g          # (Tn, H)
            nf_t = nf_dst_ref[:].astype(f32)
            d_p = _hsum(gout_t * nf_t, H, D)
            d_logit = p_self * (d_p - s_tile)
            d_zpre = d_logit * jnp.where(z_pre > 0, 1.0, slope)
            d_wself_ref[:] = d_zpre
            d_nfdst_ref[:] = gout_t * _hrep(p_self, D, big_prec)
        else:
            d_wself_ref[:] = jnp.zeros((tn, H), f32)
            d_nfdst_ref[:] = jnp.zeros((tn, HD), f32)

    @pl.when(jnp.logical_and(t == 0, c == 0))
    def _init_asrc():
        acc_dasrc[:] = jnp.zeros((8, max(H * D, 128)), f32)

    valid = c < cw_ref[t]

    @pl.when(valid)
    def _compute():
        wn_win = jnp.concatenate([r[:] for r in wn_win_refs], axis=0)
        nf_win = jnp.concatenate([r[:] for r in nf_win_refs], axis=0)

        dst_l = dst_ref[:] - t_abs * tn
        src_l = src_ref[:] - sw_ref[t] * tn
        keep = (dst_l >= 0) & (dst_l < tn) & (emask_ref[:] > 0)
        oh_dst_b = (dst_l == jax.lax.broadcasted_iota(jnp.int32, (te, tn), 1)) & keep
        oh_src_b = (src_l == jax.lax.broadcasted_iota(jnp.int32, (te, k * tn), 1)) & keep
        oh_dst = oh_dst_b.astype(f32)
        keep_f = keep.astype(f32)

        z_pre = (
            jax.lax.dot_general(oh_dst, wn_dst[:, :H], (((1,), (0,)), ((), ())),
                                precision=big_prec)
            + jax.lax.dot_general(oh_src_b.astype(f32), wn_win[:, H:],
                                  (((1,), (0,)), ((), ())), precision=big_prec)
            + w_ea_ref[:]
        )
        logit = jnp.where(keep, _leaky(z_pre, slope), _NEG)
        m_e = _gather_rows(oh_dst, m_tile, big_prec)
        den_e = _gather_rows(oh_dst, den_g, big_prec)
        den_e = jnp.where(den_e == 0.0, 1.0, den_e)
        p = jnp.exp(logit - m_e) / den_e * keep_f     # (Te, H)

        nfdt = nf_win.dtype
        h_src = jax.lax.dot_general(
            oh_src_b.astype(nfdt), nf_win, (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=big_prec,
        )
        gout_e = jax.lax.dot_general(
            oh_dst, gout_t, (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=big_prec,
        )                                             # (Te, HD)
        d_p = _hsum(gout_e * h_src, H, D)             # (Te, H)
        s_e = _gather_rows(oh_dst, s_tile, big_prec)
        d_logit = p * (d_p - s_e)
        d_zpre = d_logit * jnp.where(z_pre > 0, 1.0, slope) * keep_f

        d_z_ref[0] = d_zpre
        acc_dwdst[:] = acc_dwdst[:] + _scatter_rows(oh_dst, d_zpre, big_prec)

        # d_h_src = p ⊗ g_out[dst]  +  d_zpre ⊗ a_src   (per edge, per head)
        # a_src arrives pre-flattened: row 0 of a_src_ref is (1, HD) head-major
        a_flat = jax.lax.slice(a_src_ref[:].astype(f32), (0, 0), (1, HD))
        d_hsrc = gout_e * _hrep(p, D, big_prec) \
            + _hrep(d_zpre, D, big_prec) * jnp.broadcast_to(a_flat, (te, HD))
        acc_dnfw[:] = acc_dnfw[:] + jax.lax.dot_general(
            oh_src_b.astype(f32), d_hsrc, (((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=big_prec,
        )
        # d_a_src += Σ_e d_zpre[e,h] · h_src[e,h,:] — accumulated flat: row 0
        # of the (8, ≥HD) accumulator holds the (1, HD) head-major vector
        prod = _hrep(d_zpre, D, big_prec) * h_src     # (Te, HD)
        flat = jnp.sum(prod, axis=0, keepdims=True)   # (1, HD)
        pad_w = acc_dasrc.shape[1]
        if pad_w > HD:
            flat = jnp.concatenate(
                [flat, jnp.zeros((1, pad_w - HD), f32)], axis=1)
        upd = jnp.concatenate(
            [flat, jnp.zeros((7, pad_w), f32)], axis=0)
        acc_dasrc[:] = acc_dasrc[:] + upd

    # dead chunk: its d_z block is still written back each grid step, and
    # flat_slot never references it — zero it so no uninitialized memory can
    # reach the epilogue gather (NaN·0 = NaN)
    @pl.when(jnp.logical_not(valid))
    def _zero_dz():
        d_z_ref[0] = jnp.zeros((te, H), f32)

    @pl.when(c == n_chunks - 1)
    def _fin():
        d_wdst_ref[:] = acc_dwdst[:]
        d_nfwin_ref[0] = acc_dnfw[:]

    @pl.when(jnp.logical_and(t == pl.num_programs(0) - 1, c == n_chunks - 1))
    def _fin_asrc():
        d_asrc_ref[:] = acc_dasrc[:]


# --------------------------------------------------------------------------
# pallas_call builders + custom VJP
# --------------------------------------------------------------------------

def _node_specs(k, tn, width):
    """BlockSpecs for a node-space array: dst tile (absolute: t0 offset for
    EP shard grids) + k source-window tiles (sw is absolute already)."""
    dst = pl.BlockSpec((tn, width),
                       lambda t, c, t0, ew, sw, cw: (t0[0] + t, 0))
    wins = [
        pl.BlockSpec((tn, width),
                     functools.partial(
                         lambda kk, t, c, t0, ew, sw, cw: (sw[t] + kk, 0), kk))
        for kk in range(k)
    ]
    return [dst] + wins


def _edge_spec(te, width):
    """Edge-chunk block. Dead chunks (c ≥ cw[t], no edges of tile t) clamp to
    the tile's last real chunk: the block index then repeats, so the Pallas
    pipeline elides the refetch, and the kernel skips the compute."""
    return pl.BlockSpec(
        (te, width),
        lambda t, c, t0, ew, sw, cw: (ew[t] + jnp.minimum(c, cw[t] - 1), 0))


def _tile_spec(tn, width):
    """Grid-local node-space block (outputs and per-tile state)."""
    return pl.BlockSpec((tn, width), lambda t, c, t0, ew, sw, cw: (t, 0))


@functools.lru_cache(maxsize=64)
def _build(N, E, H, D, Da, tn, te, k, n_chunks, self_loops, slope, dt_name,
           interpret, n_tiles_grid=None):
    dt = jnp.dtype(dt_name)
    big_prec = _HI if dt == jnp.float32 else jax.lax.Precision.DEFAULT
    HD = H * D
    # EP shard grids run a restricted dst-tile range [t0, t0+n_tiles_grid);
    # node INPUTS stay N-sized (absolute block indices), node OUTPUTS are
    # grid-local (Ng rows) and the caller embeds them at t0*tn.
    n_tiles = N // tn if n_tiles_grid is None else n_tiles_grid
    Ng = n_tiles * tn
    grid = (n_tiles, n_chunks)
    kparams = dict(tn=tn, te=te, k=k, n_chunks=n_chunks, H=H, D=D, Da=Da,
                   self_loops=self_loops, slope=slope, big_prec=big_prec)
    # fwd: tiles independent (scratch resets at c == 0) → tile dim parallel.
    # bwd: acc_dasrc accumulates ACROSS tiles (written at the last t) →
    # both dims stay sequential there.
    comp = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"))
    comp_bwd = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"))

    in_specs = (
        _node_specs(k, tn, 2 * H)        # wn (dst + windows)
        + _node_specs(k, tn, HD)         # nf (dst + windows)
        + [_edge_spec(te, H),            # w_ea
           _edge_spec(te, 1),            # src
           _edge_spec(te, 1),            # dst
           _edge_spec(te, 1)]            # emask
    )
    fwd = pl.pallas_call(
        functools.partial(_fwd_kernel, **kparams),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=grid,
            in_specs=in_specs,
            out_specs=[_tile_spec(tn, HD), _tile_spec(tn, H), _tile_spec(tn, H)],
            scratch_shapes=[
                pltpu.VMEM((tn, HD), jnp.float32),
                pltpu.VMEM((tn, H), jnp.float32),
                pltpu.VMEM((tn, H), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Ng, HD), jnp.float32),
            jax.ShapeDtypeStruct((Ng, H), jnp.float32),
            jax.ShapeDtypeStruct((Ng, H), jnp.float32),
        ],
        compiler_params=comp,
        interpret=interpret,
    )

    bwd_in_specs = (
        _node_specs(k, tn, 2 * H)
        + _node_specs(k, tn, HD)
        + [_edge_spec(te, H), _edge_spec(te, 1), _edge_spec(te, 1),
           _edge_spec(te, 1),
           _tile_spec(tn, H),   # m
           _tile_spec(tn, H),   # den
           _tile_spec(tn, HD),  # g_out
           _tile_spec(tn, H),   # s
           pl.BlockSpec((8, max(H * D, 128)),
                        lambda t, c, t0, ew, sw, cw: (0, 0)),  # a_src
           ]
    )
    bwd = pl.pallas_call(
        functools.partial(_bwd_kernel, **kparams),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=grid,
            in_specs=bwd_in_specs,
            out_specs=[
                _tile_spec(tn, H),                              # d_wdst
                _tile_spec(tn, H),                              # d_wself
                _tile_spec(tn, HD),                             # d_nf_dst
                pl.BlockSpec((1, te, H),
                             lambda t, c, t0, ew, sw, cw: (t * n_chunks + c, 0, 0)),
                pl.BlockSpec((1, k * tn, HD),
                             lambda t, c, t0, ew, sw, cw: (t, 0, 0)),  # d_nf_win
                pl.BlockSpec((8, max(H * D, 128)),
                             lambda t, c, t0, ew, sw, cw: (0, 0)),     # d_a_src
            ],
            scratch_shapes=[
                pltpu.VMEM((tn, H), jnp.float32),
                pltpu.VMEM((k * tn, HD), jnp.float32),
                pltpu.VMEM((8, max(H * D, 128)), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Ng, H), jnp.float32),
            jax.ShapeDtypeStruct((Ng, H), jnp.float32),
            jax.ShapeDtypeStruct((Ng, HD), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * n_chunks, te, H), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, k * tn, HD), jnp.float32),
            jax.ShapeDtypeStruct((8, max(H * D, 128)), jnp.float32),
        ],
        compiler_params=comp_bwd,
        interpret=interpret,
    )
    return fwd, bwd


@functools.lru_cache(maxsize=64)
def _make_op(N, E, H, D, Da, tn, te, k, n_chunks, self_loops, slope, dt_name,
             interpret):
    """Build the custom-VJP fused op for one static configuration."""
    fwd_call, bwd_call = _build(N, E, H, D, Da, tn, te, k, n_chunks,
                                self_loops, slope, dt_name, interpret)
    HD = H * D
    f32 = jnp.float32

    def prologue(nf, ea, a):
        nf32 = nf.astype(f32)
        a32 = a.astype(f32)
        a_dst, a_ea, a_src = a32[:, :D], a32[:, D:D + Da], a32[:, D + Da:]
        w_dst = jnp.einsum("nhd,hd->nh", nf32, a_dst)
        w_src = jnp.einsum("nhd,hd->nh", nf32, a_src)
        wn = jnp.concatenate([w_dst, w_src], axis=-1)
        w_ea = ea.astype(f32) @ a_ea.T
        return wn, w_ea, a_dst, a_ea, a_src

    t0_zero = np.zeros((1,), np.int32)

    def run_fwd(nf, ea, src, dst, emask, a, ew_blk, sw_tile, cw):
        wn, w_ea, *_ = prologue(nf, ea, a)
        nf_flat = nf.reshape(N, HD)
        src2 = src.reshape(E, 1).astype(jnp.int32)
        dst2 = dst.reshape(E, 1).astype(jnp.int32)
        em2 = emask.reshape(E, 1).astype(f32)
        args = [wn] * (k + 1) + [nf_flat] * (k + 1) + [w_ea, src2, dst2, em2]
        out, m, den = fwd_call(t0_zero, ew_blk, sw_tile, cw, *args)
        return out, m, den

    @jax.custom_vjp
    def op(nf, ea, src, dst, emask, a, ew_blk, sw_tile, flat_slot, cw):
        out, m, den = run_fwd(nf, ea, src, dst, emask, a, ew_blk, sw_tile, cw)
        return out.reshape(N, H, D).astype(nf.dtype), m, den

    def op_fwd(nf, ea, src, dst, emask, a, ew_blk, sw_tile, flat_slot, cw):
        out, m, den = run_fwd(nf, ea, src, dst, emask, a, ew_blk, sw_tile, cw)
        res = (nf, ea, src, dst, emask, a, ew_blk, sw_tile, flat_slot, cw,
               out, m, den)
        return (out.reshape(N, H, D).astype(nf.dtype), m, den), res

    def op_bwd(res, gs):
        # m/den cotangents are ignored: they only feed the stop-gradient
        # attention epilogue (interpretability outputs, never trained on).
        g = gs[0]
        (nf, ea, src, dst, emask, a, ew_blk, sw_tile, flat_slot, cw,
         out, m, den) = res
        wn, w_ea, a_dst, a_ea, a_src = prologue(nf, ea, a)
        g32 = g.reshape(N, HD).astype(f32)
        s = _hsum_xla(g32, out, H, D)                     # (N, H)
        nf_flat = nf.reshape(N, HD)
        src2 = src.reshape(E, 1).astype(jnp.int32)
        dst2 = dst.reshape(E, 1).astype(jnp.int32)
        em2 = emask.reshape(E, 1).astype(f32)
        a_src_pad = jnp.zeros((8, max(HD, 128)), f32)
        a_src_pad = a_src_pad.at[0, :HD].set(a_src.reshape(HD))
        args = ([wn] * (k + 1) + [nf_flat] * (k + 1)
                + [w_ea, src2, dst2, em2, m, den, g32, s, a_src_pad])
        d_wdst, d_wself, d_nfdst, d_z_tiled, d_nfwin, d_asrc_pad = bwd_call(
            t0_zero, ew_blk, sw_tile, cw, *args)

        nf32 = nf.astype(f32)
        d_z = d_z_tiled.reshape(-1, H)[flat_slot]         # (E, H) gather
        d_z = d_z * emask.reshape(E, 1).astype(f32)
        d_ea = (d_z @ a_ea).astype(ea.dtype)
        d_a_ea = jnp.einsum("eh,ed->hd", d_z, ea.astype(f32))
        d_a_dst = jnp.einsum("nh,nhd->hd", d_wdst, nf32)
        d_a_src = d_asrc_pad[0, :HD].reshape(H, D)
        if self_loops:
            d_a_dst = d_a_dst + jnp.einsum("nh,nhd->hd", d_wself, nf32)
            d_a_src = d_a_src + jnp.einsum("nh,nhd->hd", d_wself, nf32)

        d_nf = jnp.einsum("nh,hd->nhd", d_wdst, a_dst).reshape(N, HD)
        if self_loops:
            d_nf = d_nf + jnp.einsum(
                "nh,hd->nhd", d_wself, a_dst + a_src).reshape(N, HD)
            d_nf = d_nf + d_nfdst
        # fold the per-tile source-window partials back: windows are
        # Tn-aligned, so decompose each into k tile-slabs and segment-sum the
        # (n_tiles·k) slabs onto their node tiles — one tiny scatter instead
        # of n_tiles sequential dynamic-slice updates.
        n_tiles = N // tn
        slabs = d_nfwin.reshape(n_tiles * k, tn * HD)
        slab_tile = (sw_tile[:, None] + jnp.arange(k)[None, :]).reshape(-1)
        d_nf_tiles = jax.ops.segment_sum(slabs, slab_tile,
                                         num_segments=n_tiles)
        d_nf = d_nf + d_nf_tiles.reshape(N, HD)
        d_a = jnp.concatenate([d_a_dst, d_a_ea, d_a_src], axis=-1)
        return (d_nf.reshape(N, H, D).astype(nf.dtype), d_ea, None, None,
                jnp.zeros_like(emask), d_a.astype(a.dtype), None, None, None,
                None)

    op.defvjp(op_fwd, op_bwd)
    return op


def _hsum_xla(x, y, H, D):
    return jnp.einsum("nhd,nhd->nh", x.reshape(-1, H, D), y.reshape(-1, H, D))


def pallas_gat_pass(
    node_feats_h: jnp.ndarray,   # (N, H, D)
    edge_attr: jnp.ndarray,      # (E, Da) — broadcast per head
    src: jnp.ndarray,            # (E,) i32
    dst: jnp.ndarray,            # (E,) i32
    edge_mask: jnp.ndarray,      # (E,)
    attn_vec: jnp.ndarray,       # (H, 2D + Da)
    meta: TileMeta,
    self_loops: bool = False,
    negative_slope: float = 0.2,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused GAT pass (same math as ops.segment.gat_attention_pass).
    Self-loops are folded in analytically when ``self_loops`` (the atom pass,
    gat2.py:179-185: appended after real edges with zero edge attrs).

    Returns ``(out (N,H,D), attn_by_src (N,H))``. The summed-attention vector
    (reference sums final probabilities by SOURCE, gat2.py:165-167) is
    reconstructed in XLA from the kernel's final softmax state (m, den) plus
    the same fp32 prologue projections the kernel uses — bit-matching the
    in-kernel probabilities. It is stop-gradient (interpretability output)
    and fully dead-code-eliminated by XLA when unused (train steps)."""
    N, H, D = node_feats_h.shape
    E = src.shape[0]
    Da = edge_attr.shape[-1]
    if interpret is None:
        # Mosaic only targets TPU; interpret everywhere else (tests, dryrun)
        interpret = INTERPRET or jax.default_backend() != "tpu"
    op = _make_op(N, E, H, D, Da, meta.tn, meta.te, meta.k_src,
                  meta.n_chunks, bool(self_loops), float(negative_slope),
                  str(node_feats_h.dtype), bool(interpret))
    out, m, den = op(node_feats_h, edge_attr, src, dst, edge_mask, attn_vec,
                     jnp.asarray(meta.ew_blk), jnp.asarray(meta.sw_tile),
                     jnp.asarray(meta.flat_slot), jnp.asarray(meta.cw))

    # ---- attention epilogue (gat2.py:165-167 semantics) -------------------
    f32 = jnp.float32
    nf32 = jax.lax.stop_gradient(node_feats_h).astype(f32)
    a32 = jax.lax.stop_gradient(attn_vec).astype(f32)
    a_dst, a_ea, a_src = a32[:, :D], a32[:, D:D + Da], a32[:, D + Da:]
    w_dst = jnp.einsum("nhd,hd->nh", nf32, a_dst)
    w_src = jnp.einsum("nhd,hd->nh", nf32, a_src)
    w_ea = jax.lax.stop_gradient(edge_attr).astype(f32) @ a_ea.T
    m_s = jax.lax.stop_gradient(m)
    den_s = jnp.where(jax.lax.stop_gradient(den) == 0.0, 1.0,
                      jax.lax.stop_gradient(den))
    z = _leaky(w_dst[dst] + w_src[src] + w_ea, negative_slope)
    # mask BEFORE exp: a masked edge whose dst segment is empty has m = -inf
    # and exp(z - m) would overflow to inf before the mask could zero it
    expo = jnp.where(
        jax.lax.stop_gradient(edge_mask).astype(f32)[:, None] > 0,
        z - m_s[dst], -jnp.inf,
    )
    p = jnp.exp(expo) / den_s[dst]
    attn = jax.ops.segment_sum(p, src, num_segments=N)
    if self_loops:
        # the analytic self-loop contributes at source == node itself
        z_self = _leaky(w_dst + w_src, negative_slope)
        attn = attn + jnp.exp(z_self - m_s) / den_s
    return out, attn


# --------------------------------------------------------------------------
# edge-partitioned fused pass (runs inside shard_map, dist/edge_partition.py)
# --------------------------------------------------------------------------

def _hrep_xla(x, D):
    """(N, H) → (N, H*D) head-major broadcast (XLA-side twin of _hrep)."""
    return jnp.repeat(x, D, axis=1)


@functools.lru_cache(maxsize=64)
def _make_ep_op(N, Es, H, D, Da, tn, te, k, n_chunks, Tg, slope, dt_name,
                interpret):
    """Per-shard building blocks for the edge-partitioned fused pass.

    AD-boundary design: shard_map's transpose machinery only reasons about
    collectives it can SEE, so the pmax/psum softmax combine must live in
    transparent XLA — a custom_vjp that hides a psum receives cotangents of
    replicated outputs split 1/S per shard and every gradient comes out S×
    too small (measured). The boundary here is therefore strictly LOCAL:

      * ``local_stats(...)``     — the forward kernel on stop-gradient
        inputs: (out_l, m_l, den_l) for this shard's edge range. Pure
        values; never differentiated.
      * ``local_unnorm(...)``    — custom_vjp producing this shard's
        UN-normalized softmax sums, given the global max M (stop-grad; the
        shift is gradient-free by softmax invariance):
            U_n = Σ_local exp(z_e − M_n)·h_src[e]   (Ng, HD)
            V_n = Σ_local exp(z_e − M_n)            (Ng, H)
        Its forward is free (elementwise rescale of the stats); its backward
        is the existing fused bwd kernel with (m ← M, den ← 1, gout ← dU,
        s ← −dV): the kernel's d_logit = p·(d_p − s) then equals
        exp(z−M)·(Σ_d h·dU + dV) — exactly ∂(U,V)/∂z.

    The caller embeds U/V at the shard's tile offset, psums across the mesh,
    adds the analytic self-loop term, and divides — all transparent XLA, so
    collective transposes, the quotient rule, and the self-loop gradient are
    jax's problem, not ours."""
    fwd_call, bwd_call = _build(N, Es, H, D, Da, tn, te, k, n_chunks,
                                False, slope, dt_name, interpret,
                                n_tiles_grid=Tg)
    HD = H * D
    Ng = Tg * tn
    f32 = jnp.float32

    def prologue(nf, ea, a):
        nf32 = nf.astype(f32)
        a32 = a.astype(f32)
        a_dst, a_ea, a_src = a32[:, :D], a32[:, D:D + Da], a32[:, D + Da:]
        w_dst = jnp.einsum("nhd,hd->nh", nf32, a_dst)
        w_src = jnp.einsum("nhd,hd->nh", nf32, a_src)
        wn = jnp.concatenate([w_dst, w_src], axis=-1)
        w_ea = ea.astype(f32) @ a_ea.T
        return wn, w_ea, a_dst, a_ea, a_src

    def local_stats(nf, ea, src, dst, emask, a, t0, ew, sw, cw):
        sg = jax.lax.stop_gradient
        nf, ea, a = sg(nf), sg(ea), sg(a)
        wn, w_ea, *_ = prologue(nf, ea, a)
        nf_flat = nf.reshape(N, HD)
        src2 = src.reshape(Es, 1).astype(jnp.int32)
        dst2 = dst.reshape(Es, 1).astype(jnp.int32)
        em2 = emask.reshape(Es, 1).astype(f32)
        args = [wn] * (k + 1) + [nf_flat] * (k + 1) + [w_ea, src2, dst2, em2]
        return fwd_call(t0, ew, sw, cw, *args)  # out_l, m_l, den_l (Ng, ·)

    @jax.custom_vjp
    def local_unnorm(nf, ea, src, dst, emask, a, Mg, stats, t0, ew, sw,
                     flat, cw):
        out_l, m_l, den_l = stats
        r0 = t0[0] * tn
        m_sl = jax.lax.dynamic_slice(Mg, (r0, 0), (Ng, H))
        scale = jnp.where(m_l > _NEG / 2, jnp.exp(m_l - m_sl), 0.0)
        V = den_l * scale
        U = out_l * _hrep_xla(V, D)
        return U, V

    def _unnorm_fwd(nf, ea, src, dst, emask, a, Mg, stats, t0, ew, sw,
                    flat, cw):
        U, V = local_unnorm(nf, ea, src, dst, emask, a, Mg, stats,
                            t0, ew, sw, flat, cw)
        return (U, V), (nf, ea, src, dst, emask, a, Mg, t0, ew, sw, flat, cw)

    def _unnorm_bwd(res, gs):
        dU, dV = gs
        nf, ea, src, dst, emask, a, Mg, t0, ew, sw, flat, cw = res
        wn, w_ea, a_dst, a_ea, a_src = prologue(nf, ea, a)
        nf32 = nf.astype(f32)
        nf_flat = nf.reshape(N, HD)
        r0 = t0[0] * tn
        m_sl = jax.lax.dynamic_slice(Mg, (r0, 0), (Ng, H))
        src2 = src.reshape(Es, 1).astype(jnp.int32)
        dst2 = dst.reshape(Es, 1).astype(jnp.int32)
        em2 = emask.reshape(Es, 1).astype(f32)
        a_src_pad = jnp.zeros((8, max(HD, 128)), f32)
        a_src_pad = a_src_pad.at[0, :HD].set(a_src.reshape(HD))
        ones = jnp.ones((Ng, H), f32)
        args = ([wn] * (k + 1) + [nf_flat] * (k + 1)
                + [w_ea, src2, dst2, em2, m_sl, ones,
                   dU.astype(f32), -dV.astype(f32), a_src_pad])
        d_wdst, _dws, _dnd, d_z_tiled, d_nfwin, d_asrc_pad = bwd_call(
            t0, ew, sw, cw, *args)

        d_z = d_z_tiled.reshape(-1, H)[flat] * em2        # (Es, H)
        d_ea = (d_z @ a_ea).astype(ea.dtype)
        d_a_ea = jnp.einsum("eh,ed->hd", d_z, ea.astype(f32))
        d_wdst_emb = jax.lax.dynamic_update_slice(
            jnp.zeros((N, H), f32), d_wdst, (r0, 0))
        d_a_dst = jnp.einsum("nh,nhd->hd", d_wdst_emb, nf32)
        d_a_src = d_asrc_pad[0, :HD].reshape(H, D)
        d_nf = jnp.einsum("nh,hd->nhd", d_wdst_emb, a_dst).reshape(N, HD)
        slabs = d_nfwin.reshape(Tg * k, tn * HD)
        slab_tile = (sw[:, None] + jnp.arange(k)[None, :]).reshape(-1)
        d_nf = d_nf + jax.ops.segment_sum(
            slabs, slab_tile, num_segments=N // tn).reshape(N, HD)
        d_a = jnp.concatenate([d_a_dst, d_a_ea, d_a_src], axis=-1)
        zero_stats = (jnp.zeros((Ng, HD), f32), jnp.zeros((Ng, H), f32),
                      jnp.zeros((Ng, H), f32))
        return (d_nf.reshape(N, H, D).astype(nf.dtype), d_ea, None, None,
                jnp.zeros_like(emask), d_a.astype(a.dtype),
                jnp.zeros_like(Mg), zero_stats, None, None, None, None, None)

    local_unnorm.defvjp(_unnorm_fwd, _unnorm_bwd)
    return local_stats, local_unnorm, prologue


def pallas_gat_pass_ep(
    node_feats_h: jnp.ndarray,   # (N, H, D) — replicated node state
    edge_attr: jnp.ndarray,      # (Es, Da) — THIS shard's edge attrs
    src: jnp.ndarray,            # (Es,) absolute node ids
    dst: jnp.ndarray,            # (Es,)
    edge_mask: jnp.ndarray,      # (Es,)
    attn_vec: jnp.ndarray,       # (H, 2D + Da)
    meta,                        # EPTileMeta (leaves sharded: leading dim 1)
    axis: str,
    self_loops: bool = False,
    negative_slope: float = 0.2,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Edge-partitioned fused GAT pass — call INSIDE shard_map with the edge
    arrays sharded over ``axis``. Same math as gat_attention_pass(axis_name=)
    but each shard runs the TCSR Pallas kernel on a restricted dst-tile grid
    (ops/tcsr.py:EPTileMeta), so per-shard work scales ~1/S. The analytic
    self-loop term (atom pass, gat2.py:179-185) is added once in the
    replicated combine. Returns replicated (out (N,H,D), attn_by_src (N,H))."""
    N, H, D = node_feats_h.shape
    Es = src.shape[0]
    Da = edge_attr.shape[-1]
    HD = H * D
    f32 = jnp.float32
    if interpret is None:
        interpret = INTERPRET or jax.default_backend() != "tpu"
    t0 = meta.t0.reshape(-1)[:1]
    ew = meta.ew_blk.reshape(-1)
    sw = meta.sw_tile.reshape(-1)
    flat = meta.flat_slot.reshape(-1)
    cw = meta.cw.reshape(-1)
    tn = meta.tn
    Tg = meta.n_tiles_grid
    Ng = Tg * tn
    local_stats, local_unnorm, _ = _make_ep_op(
        N, Es, H, D, Da, tn, meta.te, meta.k_src, meta.n_chunks, Tg,
        float(negative_slope), str(node_feats_h.dtype), bool(interpret))

    # 1. local softmax stats (stop-grad: values only)
    stats = local_stats(node_feats_h, edge_attr, src, dst, edge_mask,
                        attn_vec, t0, ew, sw, cw)
    _out_l, m_l, _den_l = stats
    r0 = t0[0] * tn

    # 2. global max via a small all_gather of the (Ng, H) shard blocks
    # (stop-grad; the softmax shift is gradient-free). An (N, H) pmax moved
    # ~2·N·H per device on the ring; gathering the restricted-grid blocks
    # moves (S-1)/S · N·H and — issued right after the kernel, consumed only
    # by the cheap scatter-max — leaves the latency-hiding scheduler free to
    # fly it under the independent prologue compute below (VERDICT r5 #4;
    # scripts/ep_overlap_hlo.py measures the achieved bracketing on the AOT
    # TPU schedule).
    sg = jax.lax.stop_gradient
    a32 = sg(attn_vec).astype(f32)
    a_dst, a_ea, a_src = a32[:, :D], a32[:, D:D + Da], a32[:, D + Da:]
    t0_all = jax.lax.all_gather(t0[0], axis)         # (S,) i32
    m_all = sg(jax.lax.all_gather(m_l, axis))        # (S, Ng, H)
    S = m_all.shape[0]
    rows = (t0_all[:, None] * tn
            + jnp.arange(Ng, dtype=t0_all.dtype)[None, :]).reshape(-1)
    M = jnp.full((N, H), _NEG, f32).at[rows].max(m_all.reshape(S * Ng, H))
    if self_loops:
        nf_sg = sg(node_feats_h).astype(f32)
        z_self_sg = _leaky(
            jnp.einsum("nhd,hd->nh", nf_sg, a_dst)
            + jnp.einsum("nhd,hd->nh", nf_sg, a_src), negative_slope)
        M = jnp.maximum(M, z_self_sg)
    Mg = sg(jnp.where(M <= _NEG / 2, 0.0, M))

    # 3. this shard's un-normalized sums (custom-VJP boundary — local only)
    U_l, V_l = local_unnorm(node_feats_h, edge_attr, src, dst, edge_mask,
                            attn_vec, Mg, stats, t0, ew, sw, flat, cw)

    # 4. transparent-XLA combine. Comm design (SURVEY §5.7): instead of
    # embedding the (Ng, ·) shard block into node space and psum-ing the
    # full (N, HD)+(N, H) arrays (ring all-reduce moves ~2·N·HD per device
    # REGARDLESS of shard count, plus S× zero-embed HBM work), all_gather
    # only the restricted-grid blocks — (S-1)/S · N·HD per device, the
    # replication floor for the replicated-node-state design — and
    # scatter-add them locally with ONE segment-sum (shard dst ranges
    # overlap in at most the boundary tiles, where the gathered partials
    # simply add; a per-shard dynamic-update-slice chain would serialize S
    # full-array copies behind the gather and block overlap).
    # all_gather/segment-sum stay visible to shard_map's AD, so the
    # collective transpose (psum_scatter) is derived by jax, preserving the
    # gradient-correctness contract described in _make_ep_op.
    U_all = jax.lax.all_gather(U_l, axis)            # (S, Ng, HD)
    V_all = jax.lax.all_gather(V_l, axis)            # (S, Ng, H)
    NUM = jax.ops.segment_sum(U_all.reshape(S * Ng, HD), rows,
                              num_segments=N)
    DEN = jax.ops.segment_sum(V_all.reshape(S * Ng, H), rows,
                              num_segments=N)
    if self_loops:
        nf32 = node_feats_h.astype(f32)
        z_self = _leaky(
            jnp.einsum("nhd,hd->nh", nf32, attn_vec.astype(f32)[:, :D])
            + jnp.einsum("nhd,hd->nh", nf32,
                         attn_vec.astype(f32)[:, D + Da:]), negative_slope)
        es = jnp.exp(z_self - Mg)
        DEN = DEN + es
        NUM = NUM + _hrep_xla(es, D) * node_feats_h.reshape(N, HD).astype(f32)
    DENg = jnp.where(DEN == 0.0, 1.0, DEN)
    out = (NUM / _hrep_xla(DENg, D)).reshape(N, H, D).astype(
        node_feats_h.dtype)

    # ---- attention epilogue (stop-grad, globally normalized) --------------
    nf_sg = sg(node_feats_h).astype(f32)
    w_dst = jnp.einsum("nhd,hd->nh", nf_sg, a_dst)
    w_src = jnp.einsum("nhd,hd->nh", nf_sg, a_src)
    w_ea = sg(edge_attr).astype(f32) @ a_ea.T
    den_s = jnp.where(sg(DEN) == 0.0, 1.0, sg(DEN))
    z = _leaky(w_dst[dst] + w_src[src] + w_ea, negative_slope)
    expo = jnp.where(sg(edge_mask).astype(f32)[:, None] > 0,
                     z - Mg[dst], -jnp.inf)
    p = jnp.exp(expo) / den_s[dst]
    attn = jax.lax.psum(jax.ops.segment_sum(p, src, num_segments=N), axis)
    if self_loops:
        z_self = _leaky(w_dst + w_src, negative_slope)
        attn = attn + jnp.exp(z_self - Mg) / den_s
    return out, attn
