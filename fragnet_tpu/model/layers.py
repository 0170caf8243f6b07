"""FragNetLayer — the four-level attention layer as one pure function.

Re-designs fragnet/model/gat/gat2.py:40-330 (FragNetLayerA.forward) for TPU:
all five passes (bond-graph GAT → atom-graph GAT with self-loops → atom→frag
pooling → fconn-graph GAT → frag-graph GAT) are masked segment ops over
static-shape arrays; interpretability masks are traced index arguments
(vmap-able) instead of module mutation; attention vectors are always computed
and returned (XLA dead-code-eliminates them when unused).

Parameter parity notes (for the torch-checkpoint importer):
  * projection_b/a/fb, edge_attr_bond_embed, edge_attr_fbond_embed and the
    attention vectors a_b/a/f/f_a_b map 1:1 to the reference names.
  * The reference also constructs modules that never affect forward
    (atom_embed, frag_embed, edge_embed, bond_edge_embed, frag_message_mlp,
    atom_mlp, frag_mlp, bias, edge_attr_bond_embed2 — gat2.py:64-85); this
    layer does not create them, and the importer skips their entries.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from fragnet_tpu.ops.dense_gat import dense_attr_gat_pass, dense_gat_pass
from fragnet_tpu.ops.ell import ell_gat_pass
from fragnet_tpu.ops.pallas_gat import pallas_gat_pass, pallas_gat_pass_ep
from fragnet_tpu.ops.tcsr import EPTileMeta, TileMeta
from fragnet_tpu.ops.segment import gat_attention_pass, segment_sum


@dataclasses.dataclass(frozen=True)
class KernelPolicy:
    """Per-level dense-kernel strategy. Defaults = the measured v5e optimum
    (BASELINE.md r4 experiment log):

    * ``bond``: "planes" (host-precomputed value-plane kernel) or "tcsr".
      "attr" is REFUSED here: the dense-attr kernel HUNG the device at
      bond-level shapes (BASELINE.md r4 experiment log — "parked, never
      enable").
    * ``fc``: "planes" | "attr" | "tcsr" — "planes" measured 49.3M vs
      "attr" 47.8M train edges/s once parallel tile-dim semantics fixed the
      7-plane DMA pathology.
    * ``attr``: atom/frag levels (dynamic edge attrs) use the dense-attr
      kernel instead of TCSR k_src=1. Defaults OFF: TCSR measured 47.2M vs
      42.1M (the attr backward needs a re-accumulate + emit kernel).

    Resolved from config/CLI (``finetune.kernel.*``) with env-var overrides
    by train/fastpath.resolve — model code never reads the environment.
    """

    bond: str = "planes"
    fc: str = "planes"
    attr: bool = False

    def __post_init__(self):
        if self.bond == "attr":
            raise ValueError(
                "kernel.bond='attr' is refused: the dense-attr kernel HUNG "
                "the device at bond-level shapes (see BASELINE.md, r4 "
                "on-device experiments: 'parked — never enable'). Use "
                "'planes' or 'tcsr'.")
        if self.bond not in ("planes", "tcsr"):
            raise ValueError(f"kernel.bond={self.bond!r} (planes|tcsr)")
        if self.fc not in ("planes", "attr", "tcsr"):
            raise ValueError(f"kernel.fc={self.fc!r} (planes|attr|tcsr)")


_KERNEL_POLICY = KernelPolicy()


def set_kernel_policy(policy: KernelPolicy) -> None:
    """Install the process-wide kernel strategy (train/fastpath.resolve is
    the production caller; tests may install ad-hoc policies)."""
    global _KERNEL_POLICY
    if not isinstance(policy, KernelPolicy):
        raise TypeError(type(policy))
    _KERNEL_POLICY = policy


def get_kernel_policy() -> KernelPolicy:
    return _KERNEL_POLICY

# torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
torch_linear_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)
# xavier_uniform with gain 1.414 (reference gat2.py:111-115)
xavier_gain = nn.initializers.variance_scaling(
    2.0 * 1.414**2, "fan_avg", "uniform"
)


def _zero_rows(x: jnp.ndarray, idx: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Zero row(s) ``idx`` of x; idx < 0 (or None) is a no-op. Traced-friendly:
    uses a one-hot mask so it vmaps over attribution indices."""
    if idx is None:
        return x
    idx = jnp.asarray(idx)
    if idx.ndim == 0:
        idx = idx[None]
    hit = jnp.zeros((x.shape[0],), dtype=x.dtype)
    for k in range(idx.shape[0]):
        hit = hit + jax.nn.one_hot(idx[k], x.shape[0], dtype=x.dtype)
    return x * (1.0 - jnp.clip(hit, 0.0, 1.0))[:, None]


@struct.dataclass
class LayerHooks:
    """Interpretability masks, all optional traced values (−1 = disabled).

    * bond_mask:      zero bond-feature rows k, k+1      (gat2.py:171-177)
    * frag_bond_mask: zero fconn rows 2k, 2k+1           (gat2.py:274-278)
    * atom_mask:      zero one atom's hidden state       (gat2.py:227-232)
    * atom_zero_vec:  (A,) float mask; 1 → zero that atom's hidden state —
      the multi-atom form used by fragment attribution
      (vizualize/model_attr.py:115-133 zeroes whole-fragment atom sets)
    """

    bond_mask: Optional[jnp.ndarray] = None
    frag_bond_mask: Optional[jnp.ndarray] = None
    atom_mask: Optional[jnp.ndarray] = None
    atom_zero_vec: Optional[jnp.ndarray] = None


def _gat_dispatch(
    nf: jnp.ndarray,            # (N, H, Dp) projected node features
    ea: jnp.ndarray,            # (E, Da) per-edge attrs (embedded/dynamic)
    src: jnp.ndarray,
    dst: jnp.ndarray,
    mask: jnp.ndarray,
    avec: jnp.ndarray,          # (H, 2*Dp + Da) attention vector
    *,
    num_nodes: int,
    tm,                         # TileMeta | EPTileMeta | None
    dp,                         # dense planes | None
    nbr_edge,
    nbr_mask,
    mode: str,                  # "planes" | "attr" | "tcsr"
    fold=None,                  # (v, c) folded edge-attr term (planes mode)
    self_loops: bool = False,
    ep_axis=None,
    xla=None,                   # optional (src, dst, attr, mask) override
                                # for the ELL/XLA fallback (the atom level
                                # appends explicit self-loop rows there)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One GAT pass through whichever kernel the batch metadata + policy
    select. Selection ladder (identical for all four levels — VERDICT r4
    weak #6 wanted this in exactly one place):

      EP mode:  fused TCSR-EP kernel when EPTileMeta is present, else the
                XLA segment path with mesh collectives.
      planes:   dense zero-gather kernel (host-precomputed value planes).
      attr:     dense kernel with in-kernel edge-attr scatter.
      tcsr:     fused TCSR kernel.
      ELL / XLA segment ops as final fallbacks.

    Math contract for every branch: ops/segment.py:gat_attention_pass
    (reference gat2.py:137-169)."""
    H = nf.shape[1]

    def _xla_args():
        if xla is not None:
            return xla
        return src, dst, ea, mask

    if ep_axis is not None:
        if isinstance(tm, EPTileMeta):
            return pallas_gat_pass_ep(nf, ea, src, dst, mask, avec, tm,
                                      axis=ep_axis, self_loops=self_loops)
        xsrc, xdst, xattr, xmask = _xla_args()
        attr_h = jnp.broadcast_to(
            xattr[:, None, :], (xattr.shape[0], H, xattr.shape[1]))
        return gat_attention_pass(nf, attr_h, xsrc, xdst, avec, num_nodes,
                                  edge_mask=xmask, axis_name=ep_axis)
    if mode == "planes" and dp is not None and fold is not None:
        v, c = fold
        return dense_gat_pass(nf, dp, v, c, ea, src, dst, mask, avec)
    if mode == "attr" and dp is not None and isinstance(tm, TileMeta):
        adj = dp if dp.shape[1] == dp.shape[2] \
            else jax.lax.slice_in_dim(dp, 0, dp.shape[2], axis=1)
        return dense_attr_gat_pass(nf, ea, src, dst, mask, avec, adj, tm,
                                   self_loops=self_loops)
    if isinstance(tm, TileMeta):
        return pallas_gat_pass(nf, ea, src, dst, mask, avec, tm,
                               self_loops=self_loops)
    xsrc, xdst, xattr, xmask = _xla_args()
    if nbr_edge is not None:
        return ell_gat_pass(nf, xattr, xsrc, nbr_edge, nbr_mask, avec,
                            num_src_nodes=num_nodes)
    attr_h = jnp.broadcast_to(
        xattr[:, None, :], (xattr.shape[0], H, xattr.shape[1]))
    return gat_attention_pass(nf, attr_h, xsrc, xdst, avec, num_nodes,
                              edge_mask=xmask)


def _fold_planes(emb_module, raw_dim: int, avec: jnp.ndarray, dp0: int,
                 dt) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold an edge-attr embed Dense + the a_ea slice of the attention
    vector into the (v, c) rank terms the planes kernel consumes —
    basis-applied through the SAME flax module so autodiff reaches its
    params (model/layers.py's planes contract, ops/dense_gat.py)."""
    H = avec.shape[0]
    bias_row = emb_module(jnp.zeros((1, raw_dim), dt))
    Wt = emb_module(jnp.eye(raw_dim, dtype=dt)) - bias_row     # (R, Dp)
    a_ea = avec[:, dp0:2 * dp0]
    v = Wt.astype(jnp.float32) @ a_ea.T.astype(jnp.float32)
    c = (bias_row.astype(jnp.float32)
         @ a_ea.T.astype(jnp.float32)).reshape(H)
    return v, c


@struct.dataclass
class LayerAttn:
    atoms: jnp.ndarray   # (A, H) summed attention by source
    frags: jnp.ndarray   # (F, H)
    bonds: jnp.ndarray   # (E, H)
    fbonds: jnp.ndarray  # (C, H)


class FragNetLayer(nn.Module):
    """One four-level message-passing layer.

    ``dtype`` sets the activation/compute precision (params stay fp32;
    softmax logits are always fp32). bfloat16 halves HBM traffic on this
    bandwidth-bound workload."""

    atom_in: int = 128
    atom_out: int = 128
    edge_in: int = 128
    edge_out: int = 128
    fedge_in: int = 128
    bond_edge_in: int = 1
    fbond_edge_in: int = 6
    num_heads: int = 4
    dtype: Any = jnp.float32
    # edge-partitioned mode (dist/edge_partition.py): this layer runs inside
    # shard_map over mesh axis ``ep_axis`` with the per-level EDGE arrays
    # sharded and all node-space state replicated; segment stats combine via
    # pmax/psum (SURVEY.md §5.7 — the north-star scale-out mode).
    ep_axis: Any = None

    @nn.compact
    def __call__(
        self,
        x_atoms: jnp.ndarray,      # (A, atom_in)
        nf_bonds: jnp.ndarray,     # (E, edge_in) bond-graph node features
        nf_fbonds: jnp.ndarray,    # (C, fedge_in) fconn-graph node features
        batch,                     # HierGraphBatch (indices + masks + attrs)
        hooks: Optional[LayerHooks] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, LayerAttn]:
        hooks = hooks or LayerHooks()
        dt = self.dtype
        x_atoms = x_atoms.astype(dt)
        nf_bonds = nf_bonds.astype(dt)
        nf_fbonds = nf_fbonds.astype(dt)
        edge_mask = batch.edge_mask.astype(dt)
        atom_mask = batch.atom_mask.astype(dt)
        frag_mask = batch.frag_mask.astype(dt)
        fconn_mask = batch.fconn_mask.astype(dt)
        H = self.num_heads
        edge_out_ph = self.edge_out // H
        atom_out_ph = self.atom_out // H
        A = x_atoms.shape[0]
        E = nf_bonds.shape[0]
        C = nf_fbonds.shape[0]

        # ---- pass 1: bond-graph GAT (gat2.py:137-169) --------------------
        emb_b = nn.Dense(edge_out_ph, kernel_init=torch_linear_init, dtype=dt,
                         name="edge_attr_bond_embed")
        ea_b = emb_b(batch.ea_bonds.astype(dt))      # (EB, Dp)
        nf_b = nn.Dense(edge_out_ph * H, kernel_init=xavier_gain, dtype=dt,
                        name="projection_b")(nf_bonds)
        nf_b = nf_b.reshape(E, H, edge_out_ph)
        a_b = self.param("a_b", xavier_gain, (H, 3 * edge_out_ph))
        pol = get_kernel_policy()
        fold_b = None
        if self.ep_axis is None and pol.bond == "planes" \
                and batch.dp_bond is not None:
            # raw bond-graph edge attr is the 1-dim cos-angle → rank-1 fold
            fold_b = _fold_planes(emb_b, batch.ea_bonds.shape[1], a_b,
                                  edge_out_ph, dt)
        bond_out, attn_bonds = _gat_dispatch(
            nf_b, ea_b, batch.bg_src, batch.bg_dst, batch.bg_mask, a_b,
            num_nodes=E, tm=batch.tm_bond, dp=batch.dp_bond,
            nbr_edge=batch.bg_nbr_edge, nbr_mask=batch.bg_nbr_mask,
            mode=pol.bond, fold=fold_b, ep_axis=self.ep_axis,
        )
        new_bond_features = bond_out.reshape(E, -1)
        new_bond_features = _zero_rows(
            new_bond_features,
            None if hooks.bond_mask is None
            else jnp.stack([hooks.bond_mask, hooks.bond_mask + 1]),
        )
        new_bond_features = new_bond_features * edge_mask[:, None]

        # ---- pass 2: atom-graph GAT with self-loops (gat2.py:178-224) ----
        # self-loops appended after real edges, zero edge attrs (gat2.py:179-185)
        sl = jnp.arange(A, dtype=batch.edge_src.dtype)
        src = jnp.concatenate([batch.edge_src, sl])
        dst = jnp.concatenate([batch.edge_dst, sl])
        if self.ep_axis is None:
            e_attr = jnp.concatenate(
                [new_bond_features, jnp.zeros((A, self.edge_out), x_atoms.dtype)], axis=0
            )
            e_mask = jnp.concatenate([batch.edge_mask, jnp.ones((A,), x_atoms.dtype)])
        else:
            # local slice of the replicated E-space bond features; self-loop
            # block participates on shard 0 only (exactly once globally)
            Es = batch.edge_src.shape[0]
            aidx = jax.lax.axis_index(self.ep_axis)
            e_attr = jnp.concatenate([
                jax.lax.dynamic_slice_in_dim(new_bond_features, aidx * Es, Es),
                jnp.zeros((A, self.edge_out), x_atoms.dtype),
            ], axis=0)
            sl_on = (aidx == 0).astype(x_atoms.dtype)
            e_mask = jnp.concatenate([
                jax.lax.dynamic_slice_in_dim(edge_mask, aidx * Es, Es),
                jnp.full((A,), 1.0, x_atoms.dtype) * sl_on,
            ])

        nf_a = nn.Dense(atom_out_ph * H, kernel_init=torch_linear_init, dtype=dt,
                        name="projection_a")(x_atoms)
        nf_a = nf_a.reshape(A, H, atom_out_ph)
        a = self.param("a", xavier_gain, (H, 2 * atom_out_ph + self.edge_out))
        if self.ep_axis is not None:
            # local slice of the replicated E-space bond features; the
            # appended self-loops are folded analytically in the combine
            Es = batch.edge_src.shape[0]
            aidx = jax.lax.axis_index(self.ep_axis)
            ea_a = jax.lax.dynamic_slice_in_dim(
                new_bond_features, aidx * Es, Es)
            mask_a = jax.lax.dynamic_slice_in_dim(edge_mask, aidx * Es, Es)
        else:
            ea_a = new_bond_features
            mask_a = batch.edge_mask
        atom_out_feats, attn_atoms_full = _gat_dispatch(
            nf_a, ea_a, batch.edge_src, batch.edge_dst, mask_a, a,
            num_nodes=A, tm=batch.tm_atom, dp=batch.dp_atom,
            nbr_edge=batch.atom_nbr_edge, nbr_mask=batch.atom_nbr_mask,
            mode="attr" if pol.attr else "tcsr", self_loops=True,
            ep_axis=self.ep_axis, xla=(src, dst, e_attr, e_mask),
        )
        x_atoms_new = atom_out_feats.reshape(A, -1)
        x_atoms_new = _zero_rows(x_atoms_new, hooks.atom_mask)
        if hooks.atom_zero_vec is not None:
            x_atoms_new = x_atoms_new * (1.0 - hooks.atom_zero_vec)[:, None]
        x_atoms_new = x_atoms_new * atom_mask[:, None]

        # ---- pass 3: atom → fragment pooling (gat2.py:234) ----------------
        # NOTE: incoming fragment state is recomputed from atoms every layer
        # (the reference overwrites its x_frags argument).
        F = batch.x_frags.shape[0]
        x_frags = segment_sum(x_atoms_new, batch.atom_to_frag, F)

        # ---- pass 4: fconn-graph GAT (gat2.py:238-278) --------------------
        emb_fb = nn.Dense(edge_out_ph, kernel_init=torch_linear_init,
                          dtype=dt, name="edge_attr_fbond_embed")
        ea_fb = emb_fb(batch.ea_fbonds.astype(dt))
        nf_fb = nn.Dense(edge_out_ph * H, kernel_init=torch_linear_init, dtype=dt,
                         name="projection_fb")(nf_fbonds)
        nf_fb = nf_fb.reshape(C, H, edge_out_ph)
        f_a_b = self.param("f_a_b", xavier_gain, (H, 3 * edge_out_ph))
        fold_f = None
        if self.ep_axis is None and pol.fc == "planes" \
                and batch.dp_fc is not None:
            # raw fconn attrs are the 6-dim connection one-hot sums → rank-6
            fold_f = _fold_planes(emb_fb, batch.ea_fbonds.shape[1], f_a_b,
                                  edge_out_ph, dt)
        fbond_out, attn_fbonds = _gat_dispatch(
            nf_fb, ea_fb, batch.fc_src, batch.fc_dst, batch.fc_mask, f_a_b,
            num_nodes=C, tm=batch.tm_fc, dp=batch.dp_fc,
            nbr_edge=batch.fc_nbr_edge, nbr_mask=batch.fc_nbr_mask,
            mode=pol.fc, fold=fold_f, ep_axis=self.ep_axis,
        )
        new_fbond_features = fbond_out.reshape(C, -1)
        new_fbond_features = _zero_rows(
            new_fbond_features,
            None if hooks.frag_bond_mask is None
            else jnp.stack([2 * hooks.frag_bond_mask, 2 * hooks.frag_bond_mask + 1]),
        )
        new_fbond_features = new_fbond_features * fconn_mask[:, None]

        # ---- pass 5: frag-graph GAT (gat2.py:283-316) ---------------------
        # fragment node features enter per-head WITHOUT projection
        nf_f = x_frags.reshape(F, H, -1)
        f = self.param("f", xavier_gain, (H, 2 * (self.atom_out // H) + self.edge_out))
        if self.ep_axis is not None:
            Cs = batch.frag_src.shape[0]
            aidx = jax.lax.axis_index(self.ep_axis)
            ea_f = jax.lax.dynamic_slice_in_dim(
                new_fbond_features, aidx * Cs, Cs)
            mask_f = jax.lax.dynamic_slice_in_dim(fconn_mask, aidx * Cs, Cs)
        else:
            ea_f = new_fbond_features
            mask_f = batch.fconn_mask
        frag_out, attn_frags = _gat_dispatch(
            nf_f, ea_f, batch.frag_src, batch.frag_dst, mask_f, f,
            num_nodes=F, tm=batch.tm_frag, dp=batch.dp_frag,
            nbr_edge=batch.frag_nbr_edge, nbr_mask=batch.frag_nbr_mask,
            mode="attr" if pol.attr else "tcsr", ep_axis=self.ep_axis,
        )
        x_frags_new = frag_out.reshape(F, -1)
        x_frags_new = x_frags_new * frag_mask[:, None]

        attn = LayerAttn(
            atoms=attn_atoms_full[:, :],  # includes self-loop contributions
            frags=attn_frags,
            bonds=attn_bonds,
            fbonds=attn_fbonds,
        )
        return x_atoms_new, x_frags_new, new_bond_features, new_fbond_features, attn
