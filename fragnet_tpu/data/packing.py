"""Single-buffer batch transport for the host→device pipeline.

The tunneled TPU backend serializes host→device copies with compute and has
high per-transfer latency, so a 39-leaf float32 HierGraphBatch (~15 MB at
batch 256) costs ~2x the train step itself. This module packs a batch into
ONE contiguous uint8 buffer (~1 MB) and reconstructs everything else ON
DEVICE inside the jit'd step:

  * x_atoms → sparse rows (col uint8, val int8) — ~11 nonzeros of 167;
  * x_frags → recomputed as segment_sum(x_atoms, atom_to_frag) (exactly its
    definition, reference data.py:421-424);
  * nf_bonds / cnx_attr / nf_fbonds (pure 0/1 one-hots) → bitpacked;
  * edge_attr → aliased to nf_bonds (the builder copies it, build.py:270);
  * validity masks → ONE i32 count each (pad_batch packs real entries as a
    contiguous prefix), decoded as arange < count;
  * bg_dst → uint8 in-degree run lengths (the builder emits the bond line
    graph dst-sorted), decoded with jnp.repeat;
  * bg_src → uint8 molecule-local ids + the per-molecule first-bond base
    recomputed on device from edge_src/atom_batch;
  * TCSR flat_slot → derived from ew_blk + dst + arange (its definition,
    ops/tcsr.py:135);
  * remaining index arrays → uint16 when the level's capacity allows;
  * float attrs (ea_bonds) → bf16 when the model computes in bf16 (the layer
    casts inputs to bf16 anyway, so this is exact equivalence), else f32;
  * y / pretrain targets → f32 (loss targets keep full precision).

Every encoding is validated on the actual arrays at pack time and falls back
to a wider encoding in the layout when an assumption fails. ``unpack_batch``
runs INSIDE jit: static-offset slices + bitcasts + tiny segment ops, fused by
XLA and negligible next to a train step. The decoded batch is numerically
identical to the unpacked path for the model's compute dtype.

No reference analog — the reference feeds torch CUDA tensors over PCIe
(finetune_gat2.py:240, train/utils.py:335). This is the TPU-native
equivalent of its pinned-memory DataLoader path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fragnet_tpu.graphs.hiergraph import HierGraphBatch
from fragnet_tpu.ops.tcsr import TileMeta

# encodings
I8, U8, U16, I32, F32, BF16 = "i8", "u8", "u16", "i32", "f32", "bf16"
SPARSE8 = "sp8"      # sparse rows: (cols u8, vals i8) × k per row
MASKC = "maskc"      # contiguous-prefix 0/1 mask → one i32 count
BITS = "bits"        # 0/1 matrix → little-endian bitpacked rows
RUNS8 = "runs8"      # sorted index array → u8 run lengths per segment
LOC8 = "loc8"        # index array → u8 offsets from a derived per-mol base
_ITEM = {I8: 1, U8: 1, U16: 2, I32: 4, F32: 4, BF16: 2}


@dataclasses.dataclass(frozen=True)
class Entry:
    name: str          # HierGraphBatch field, or "tm_<lvl>.<part>"
    enc: str
    offset: int
    shape: Tuple[int, ...]
    out_dtype: str     # dtype of the decoded array
    k: int = 0         # SPARSE8: max nonzeros/row; RUNS8: run-count rows


@dataclasses.dataclass(frozen=True)
class PackLayout:
    entries: Tuple[Entry, ...]
    total_bytes: int
    aliases: Tuple[Tuple[str, str], ...]   # (field, source-field) exact copies
    recompute_x_frags: Tuple[int, int]     # (n_frags, feat_dim)
    tm_static: Tuple[Tuple[str, Tuple[int, int, int, int]], ...]  # lvl → (tn,te,nc,k)
    # dense planes rebuilt ON DEVICE in unpack_batch (ops/dense_gat.py
    # consumes them): (dp_field, src_f, dst_f, mask_f, ea_f|"", n_nodes, tn)
    # — only levels the loader proved tile-local + collision-free dataset-wide
    dp_specs: Tuple[Tuple[str, str, str, str, str, int, int], ...] = ()

    def entry(self, name: str) -> Entry:
        for e in self.entries:
            if e.name == name:
                return e
        raise KeyError(name)


_MASK_FIELDS = ("atom_mask", "edge_mask", "bg_mask", "frag_mask",
                "fconn_mask", "fc_mask", "graph_mask")
_BITS_FIELDS = ("nf_bonds", "cnx_attr", "nf_fbonds")
_I8_FIELDS = ("ea_fbonds", "protein")
_IDX_FIELDS = {
    # field → capacity source (max exclusive value an index may take)
    "edge_src": "n_atoms", "edge_dst": "n_atoms",
    "frag_src": "n_frags", "frag_dst": "n_frags",
    "fc_src": "n_fconn", "fc_dst": "n_fconn",
    "atom_to_frag": "n_frags", "atom_batch": "n_graphs",
    "frag_batch": "n_graphs",
}
_F_FIELDS = ("ea_bonds", "gene_expr")          # model-dtype floats
_F32_FIELDS = ("y", "bnd_lngth", "bnd_angl", "dh_angl")
_TM_LEVELS = ("tm_atom", "tm_bond", "tm_frag", "tm_fc")
_TM_DST = {"tm_atom": "edge_dst", "tm_bond": "bg_dst",
           "tm_frag": "frag_dst", "tm_fc": "fc_dst"}


def _caps(b: HierGraphBatch) -> dict:
    return {
        "n_atoms": b.x_atoms.shape[0], "n_edges": b.edge_src.shape[0],
        "n_frags": b.x_frags.shape[0], "n_fconn": b.nf_fbonds.shape[0],
        "n_graphs": b.y.shape[0],
    }


def _is_prefix_mask(mask: np.ndarray) -> bool:
    c = int(mask.sum())
    return bool(mask[:c].all()) and not mask[c:].any()


def _bg_runs_ok(b: HierGraphBatch) -> bool:
    """bg_dst must be sorted over the real prefix with in-degrees ≤ 255."""
    c = int(np.asarray(b.bg_mask).sum())
    d = np.asarray(b.bg_dst)[:c]
    if c and (np.diff(d) < 0).any():
        return False
    indeg = np.bincount(d, minlength=b.edge_src.shape[0])
    return indeg.max(initial=0) <= 255


def _bond_base(edge_src: np.ndarray, atom_batch: np.ndarray,
               n_graphs: int) -> np.ndarray:
    """First directed-bond id of each molecule (host mirror of the device
    derivation)."""
    mol = atom_batch[edge_src]
    base = np.full((n_graphs,), len(edge_src), np.int64)
    np.minimum.at(base, mol, np.arange(len(edge_src)))
    return base


def _bg_loc8_ok(b: HierGraphBatch) -> bool:
    caps = _caps(b)
    base = _bond_base(np.asarray(b.edge_src), np.asarray(b.atom_batch),
                      caps["n_graphs"])
    mask = np.asarray(b.bg_mask) > 0
    src = np.asarray(b.bg_src)
    dst = np.asarray(b.bg_dst)
    mol = np.asarray(b.atom_batch)[np.asarray(b.edge_src)[dst]]
    loc = src - base[mol]
    return bool((loc[mask] >= 0).all() and (loc[mask] <= 255).all())


_ALIGNED_NODE_MASKS = ("atom_mask", "edge_mask", "frag_mask", "fconn_mask")


_DP_LEVELS = {
    # dp field → (src, dst, mask, ea or "", n_nodes key)
    "dp_bond": ("bg_src", "bg_dst", "bg_mask", "ea_bonds", "n_edges"),
    "dp_fc": ("fc_src", "fc_dst", "fc_mask", "ea_fbonds", "n_fconn"),
    "dp_atom": ("edge_src", "edge_dst", "edge_mask", "", "n_atoms"),
    "dp_frag": ("frag_src", "frag_dst", "fconn_mask", "", "n_frags"),
}


def dp_level_ok(graphs, level: str, tn: int) -> bool:
    """Can ``level``'s dense planes be rebuilt on device for EVERY batch of
    these graphs? Requires (a) no molecule exceeding tn nodes at the level
    (tile-aligned packing then keeps every edge tile-local) and (b) no
    molecule with duplicate (dst, src) pairs (a dense slot would collide —
    molecules never collide with each other: distinct local id ranges).
    Mirrors ops/dense_gat.build_dense_planes's per-batch None conditions,
    decided once per dataset."""
    import numpy as _np

    count_attr = {"dp_bond": "n_edges", "dp_fc": "n_fconn",
                  "dp_atom": "n_atoms", "dp_frag": "n_frags"}[level]
    idx_attr = {"dp_bond": "ei_bonds", "dp_fc": "ei_fbonds",
                "dp_atom": "edge_index", "dp_frag": "frag_index"}[level]
    for g in graphs:
        if getattr(g, count_attr) > tn:
            return False
        ei = _np.asarray(getattr(g, idx_attr))
        if ei.size:
            key = ei[0].astype(_np.int64) * (1 << 20) + ei[1]
            if len(_np.unique(key)) != key.shape[0]:
                return False
    return True


def build_layout(template: HierGraphBatch, compute_dtype=jnp.float32,
                 sparse_k: Optional[int] = None,
                 compact: bool = False,
                 aligned: bool = False,
                 dp_levels: Tuple[str, ...] = ()) -> PackLayout:
    """Derive the static layout from one template batch (shapes come from the
    PadSpec so every batch of the spec conforms; value-level assumptions are
    re-validated on every pack with automatic errors, and relaxed here when
    the template already violates them).

    ``compact=False`` (default, "fast" profile): every encoding is a host
    memcpy + device bitcast (int8 one-hots, u16/i32 indices, shipped
    flat_slot). The tunnel compresses low-entropy buffers, so minimizing
    pack/unpack CPU beats minimizing bytes. ``compact=True`` adds the
    bit/run/local encodings (~4x smaller buffer) for genuinely
    bandwidth-bound links.

    The dense planes (``dp_bond``/``dp_fc``, ops/dense_gat.py) are
    deliberately NOT transported: they are redundant with the edge lists
    (~13 MB/batch of mostly zeros) and the pipelined path is host-bound —
    decoded batches run the TCSR kernel (k_src=1 under aligned packing)
    instead of the dense one."""
    if template.atom_nbr_edge is not None:
        raise ValueError("packed transport does not support the ELL path")
    if template.x_atoms.shape[1] > 256:
        raise ValueError("sparse x_atoms encoding needs feat dim <= 256")
    fdt = "bfloat16" if jnp.dtype(compute_dtype) == jnp.bfloat16 else "float32"
    caps = _caps(template)
    entries = []
    off = 0

    def add(name, enc, shape, out_dtype, k=0):
        nonlocal off
        n = int(np.prod(shape))
        if enc == SPARSE8:
            nbytes = 2 * shape[0] * k
        elif enc == MASKC:
            nbytes = 4
        elif enc == BITS:
            nbytes = shape[0] * ((shape[1] + 7) // 8)
        elif enc == RUNS8:
            nbytes = k
        elif enc == LOC8:
            nbytes = shape[0]
        else:
            nbytes = n * _ITEM[enc]
        entries.append(Entry(name, enc, off, tuple(int(s) for s in shape),
                             out_dtype, k))
        off += nbytes

    if compact:
        k = sparse_k or int((np.asarray(template.x_atoms) != 0).sum(1).max()) + 2
        add("x_atoms", SPARSE8, template.x_atoms.shape, "float32", k=k)
    else:
        add("x_atoms", I8, template.x_atoms.shape, "float32")

    for f in _MASK_FIELDS:
        arr = np.asarray(getattr(template, f))
        # tile-ALIGNED packing puts gaps mid-array on the four node axes, so
        # a template whose mask happens to be a contiguous prefix (totals
        # landing exactly on tile boundaries) must NOT lock in the one-count
        # encoding — a later batch with a gap would silently decode as a
        # wrong prefix mask (ADVICE r4 medium #1). Force I8 there.
        maskc_ok = _is_prefix_mask(arr) and not (
            aligned and f in _ALIGNED_NODE_MASKS)
        add(f, MASKC if maskc_ok else I8, arr.shape, "float32")
    for f in _BITS_FIELDS:
        arr = np.asarray(getattr(template, f))
        ok = compact and np.isin(arr, (0.0, 1.0)).all()
        add(f, BITS if ok else I8, arr.shape, "float32")
    for f in _I8_FIELDS:
        arr = getattr(template, f)
        if arr is not None:
            add(f, I8, np.asarray(arr).shape,
                "int32" if f == "protein" else "float32")

    # bond line graph: run-length dst + molecule-local src when valid
    E = caps["n_edges"]
    if compact and _bg_runs_ok(template):
        add("bg_dst", RUNS8, np.asarray(template.bg_dst).shape, "int32", k=E)
    else:
        add("bg_dst", U16 if E <= 65535 else I32,
            np.asarray(template.bg_dst).shape, "int32")
    if compact and _bg_loc8_ok(template):
        add("bg_src", LOC8, np.asarray(template.bg_src).shape, "int32")
    else:
        add("bg_src", U16 if E <= 65535 else I32,
            np.asarray(template.bg_src).shape, "int32")

    for f, cap in _IDX_FIELDS.items():
        enc = U16 if caps[cap] <= 65535 else I32
        add(f, enc, np.asarray(getattr(template, f)).shape, "int32")
    for f in _F_FIELDS:
        arr = getattr(template, f)
        if arr is not None:
            add(f, BF16 if fdt == "bfloat16" else F32, np.asarray(arr).shape,
                fdt)
    for f in _F32_FIELDS:
        arr = getattr(template, f)
        if arr is not None:
            add(f, F32, np.asarray(arr).shape, "float32")

    tm_static = []
    for lvl in _TM_LEVELS:
        tm = getattr(template, lvl)
        if tm is None:
            continue
        tm_static.append((lvl, (tm.tn, tm.te, tm.n_chunks, tm.k_src)))
        n_tiles = len(np.asarray(tm.ew_blk))
        add(f"{lvl}.ew_blk", U16, (n_tiles,), "int32")
        add(f"{lvl}.sw_tile", U16, (n_tiles,), "int32")
        add(f"{lvl}.cw", U16, (n_tiles,), "int32")
        if not compact:  # compact derives flat_slot from ew_blk + dst + arange
            add(f"{lvl}.flat_slot", I32,
                np.asarray(tm.flat_slot).shape, "int32")

    aliases = []
    if np.array_equal(np.asarray(template.edge_attr),
                      np.asarray(template.nf_bonds)):
        aliases.append(("edge_attr", "nf_bonds"))
    else:  # defensive; the builder copies nf_bonds from edge_attr
        add("edge_attr", I8, template.edge_attr.shape, "float32")

    dp_specs = []
    if dp_levels and tm_static:
        # per-axis node tiles (PadSpec.tn_of): each dense-plane level uses
        # its OWN tm level's tile size (dp_bond ↔ tm_bond, ...)
        tn_of = {lvl: st[0] for lvl, st in tm_static}
        for lvl in dp_levels:
            src_f, dst_f, mask_f, ea_f, nkey = _DP_LEVELS[lvl]
            tn = tn_of.get("tm_" + lvl[3:], tm_static[0][1][0])
            if caps[nkey] % tn == 0:
                dp_specs.append((lvl, src_f, dst_f, mask_f, ea_f,
                                 caps[nkey], tn))

    return PackLayout(
        entries=tuple(entries), total_bytes=off, aliases=tuple(aliases),
        recompute_x_frags=(int(template.x_frags.shape[0]),
                           int(template.x_frags.shape[1])),
        tm_static=tuple(tm_static),
        dp_specs=tuple(dp_specs),
    )


# ---------------------------------------------------------------------------
# host-side pack
# ---------------------------------------------------------------------------

def _sparse_rows(x: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """(A, D) → (cols (A,k) u8, vals (A,k) i8); unused slots are (0, 0)."""
    A = x.shape[0]
    r, c = np.nonzero(x)
    counts = np.bincount(r, minlength=A)
    if counts.max(initial=0) > k:
        raise ValueError(f"x_atoms row has {counts.max()} nonzeros > k={k}")
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(len(r)) - np.repeat(starts, counts)
    cols = np.zeros((A, k), np.uint8)
    vals = np.zeros((A, k), np.int8)
    v = x[r, c]
    vi = v.astype(np.int8)
    if not np.array_equal(vi.astype(x.dtype), v):
        raise ValueError("x_atoms values are not int8-exact")
    cols[r, pos] = c
    vals[r, pos] = vi
    return cols, vals


def _check_int8(name: str, arr: np.ndarray) -> np.ndarray:
    b = arr.astype(np.int8)
    if not np.array_equal(b.astype(arr.dtype), arr):
        raise ValueError(f"field {name} is not int8-exact")
    return b


def pack_batch(batch: HierGraphBatch, layout: PackLayout,
               validate: bool = False) -> np.ndarray:
    """``validate=True`` runs full value-level checks (every lossy-if-wrong
    encoding is verified exactly). The loaders validate the FIRST batch of a
    spec; later batches come from the same builder invariants, so they skip
    the O(bytes) checks (the cheap range checks always run)."""
    buf = np.empty((layout.total_bytes,), np.uint8)
    caps = _caps(batch)

    def put(e: Entry, raw: np.ndarray):
        bts = raw.tobytes()
        buf[e.offset : e.offset + len(bts)] = np.frombuffer(bts, np.uint8)

    for e in layout.entries:
        if "." in e.name:
            lvl, part = e.name.split(".")
            tm = getattr(batch, lvl)
            if tm is None:
                raise ValueError(
                    f"batch has no {lvl} TileMeta but the pack layout "
                    f"requires it — the batch exceeded the pinned TCSR "
                    f"windows (pad_batch fell back to XLA). Build packed "
                    f"batches with strict_tcsr=True to get the precise "
                    f"level/pin diagnosis (graphs/hiergraph.pad_batch)")
            arr = np.asarray(getattr(tm, part))
        else:
            arr = np.asarray(getattr(batch, e.name))
        if e.enc == SPARSE8:
            cols, vals = _sparse_rows(arr, e.k)
            put(e, np.concatenate(
                [cols.reshape(-1).view(np.uint8),
                 vals.reshape(-1).view(np.uint8)]))
        elif e.enc == MASKC:
            # ALWAYS checked (not just on validate): a non-prefix mask
            # encoded as a count silently corrupts training (ADVICE r4);
            # the check is O(n) — negligible next to the pack itself
            if not _is_prefix_mask(arr):
                raise ValueError(
                    f"mask {e.name} is not a contiguous prefix but the "
                    f"layout chose the count encoding from the template "
                    f"batch; rebuild the layout with aligned=True (or "
                    f"report this as a batcher invariant violation)")
            put(e, np.asarray([int(arr.sum())], np.int32))
        elif e.enc == BITS:
            b = arr.astype(np.uint8)
            if validate and (
                    not np.array_equal(b.astype(arr.dtype), arr)
                    or b.max(initial=0) > 1):
                raise ValueError(f"field {e.name} is not 0/1")
            put(e, np.packbits(b, axis=1, bitorder="little"))
        elif e.enc == RUNS8:
            c = int(np.asarray(batch.bg_mask).sum())
            indeg = np.bincount(arr[:c], minlength=e.k)
            if indeg.max(initial=0) > 255 or (validate and not np.array_equal(
                    np.repeat(np.arange(e.k), indeg), arr[:c])):
                raise ValueError("bg_dst is not run-length-encodable")
            put(e, indeg.astype(np.uint8))
        elif e.enc == LOC8:
            base = _bond_base(np.asarray(batch.edge_src),
                              np.asarray(batch.atom_batch), caps["n_graphs"])
            mol = np.asarray(batch.atom_batch)[
                np.asarray(batch.edge_src)[np.asarray(batch.bg_dst)]]
            loc = arr.astype(np.int64) - base[mol]
            mask = np.asarray(batch.bg_mask) > 0
            loc = np.where(mask, loc, 0)
            if loc.min(initial=0) < 0 or loc.max(initial=0) > 255:
                raise ValueError("bg_src not molecule-local-u8 encodable")
            put(e, loc.astype(np.uint8))
        elif e.enc == I8:
            put(e, _check_int8(e.name, arr) if validate
                else arr.astype(np.int8))
        elif e.enc == U8:
            put(e, arr.astype(np.uint8))
        elif e.enc == U16:
            if validate and (arr.min(initial=0) < 0
                             or arr.max(initial=0) > 65535):
                raise ValueError(f"field {e.name} out of uint16 range")
            put(e, arr.astype(np.uint16))
        elif e.enc == I32:
            put(e, arr if arr.dtype == np.int32 else arr.astype(np.int32))
        elif e.enc == BF16:
            import ml_dtypes  # ships with jax; numpy-compatible bfloat16
            put(e, arr.astype(ml_dtypes.bfloat16))
        else:
            put(e, arr if arr.dtype == np.float32 else arr.astype(np.float32))
    return buf


# ---------------------------------------------------------------------------
# device-side unpack (jit-traceable; layout is static)
# ---------------------------------------------------------------------------

def _decode(buf: jnp.ndarray, e: Entry) -> jnp.ndarray:
    n = int(np.prod(e.shape))
    odt = jnp.dtype(e.out_dtype)
    if e.enc == MASKC:
        cnt = jax.lax.bitcast_convert_type(
            buf[e.offset : e.offset + 4].reshape(1, 4), jnp.int32)[0]
        return (jnp.arange(e.shape[0]) < cnt).astype(odt)
    if e.enc == BITS:
        R, D = e.shape
        nb = (D + 7) // 8
        raw = buf[e.offset : e.offset + R * nb].reshape(R, nb)
        bits = (raw[:, :, None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
        return bits.reshape(R, nb * 8)[:, :D].astype(odt)
    if e.enc in (I8, U8):
        raw = buf[e.offset : e.offset + n]
        out = jax.lax.bitcast_convert_type(raw, jnp.int8) if e.enc == I8 else raw
    elif e.enc == U16:
        raw = buf[e.offset : e.offset + 2 * n]
        out = jax.lax.bitcast_convert_type(raw.reshape(n, 2), jnp.uint16)
    elif e.enc == I32:
        raw = buf[e.offset : e.offset + 4 * n]
        out = jax.lax.bitcast_convert_type(raw.reshape(n, 4), jnp.int32)
    elif e.enc == BF16:
        raw = buf[e.offset : e.offset + 2 * n]
        out = jax.lax.bitcast_convert_type(raw.reshape(n, 2), jnp.bfloat16)
    else:
        raw = buf[e.offset : e.offset + 4 * n]
        out = jax.lax.bitcast_convert_type(raw.reshape(n, 4), jnp.float32)
    return out.reshape(e.shape).astype(odt)


def _decode_sparse(buf: jnp.ndarray, e: Entry) -> jnp.ndarray:
    A, D = e.shape
    k = e.k
    cb = buf[e.offset : e.offset + A * k]
    vb = buf[e.offset + A * k : e.offset + 2 * A * k]
    cols = cb.reshape(A, k).astype(jnp.int32)
    vals = jax.lax.bitcast_convert_type(vb, jnp.int8).reshape(A, k).astype(jnp.float32)
    # k fused one-hot accumulations instead of one HBM scatter (XLA lowers
    # segment scatters serially on TPU; this is pure elementwise work)
    d_iota = jnp.arange(D, dtype=jnp.int32)[None, :]
    x = jnp.zeros((A, D), jnp.float32)
    for j in range(k):
        x = x + jnp.where(cols[:, j : j + 1] == d_iota, vals[:, j : j + 1], 0.0)
    return x


def unpack_batch(buf: jnp.ndarray, layout: PackLayout) -> HierGraphBatch:
    fields: dict = {f.name: None for f in dataclasses.fields(HierGraphBatch)}
    tm_parts: dict = {}
    deferred = []
    for e in layout.entries:
        if "." in e.name:
            lvl, part = e.name.split(".")
            tm_parts.setdefault(lvl, {})[part] = _decode(buf, e)
        elif e.enc == SPARSE8:
            fields[e.name] = _decode_sparse(buf, e)
        elif e.enc in (RUNS8, LOC8):
            deferred.append(e)  # need masks / other index fields first
        else:
            fields[e.name] = _decode(buf, e)

    for e in deferred:
        if e.enc == RUNS8:
            indeg = buf[e.offset : e.offset + e.k].astype(jnp.int32)
            EB = e.shape[0]
            rep = jnp.repeat(jnp.arange(e.k, dtype=jnp.int32), indeg,
                             total_repeat_length=EB)
            fields["bg_dst"] = jnp.where(fields["bg_mask"] > 0, rep, 0)
        else:  # LOC8 bg_src — depends on bg_dst, so RUNS8 decodes first
            loc = buf[e.offset : e.offset + e.shape[0]].astype(jnp.int32)
            E = fields["edge_src"].shape[0]
            G = fields["y"].shape[0] if fields["y"] is not None else None
            mol_of_bond = fields["atom_batch"][fields["edge_src"]]
            base = jax.ops.segment_min(jnp.arange(E, dtype=jnp.int32),
                                       mol_of_bond, num_segments=G)
            src = base[mol_of_bond[fields["bg_dst"]]] + loc
            fields["bg_src"] = jnp.where(fields["bg_mask"] > 0, src, 0)

    for dst_f, src_f in layout.aliases:
        fields[dst_f] = fields[src_f]

    # x_frags ≡ segment_sum(x_atoms, atom_to_frag) (data.py:421-424), but
    # XLA lowers segment scatters SERIALLY on TPU (~35 ms at batch 256 —
    # this one op dominated the unpack). Sort + cumsum + boundary gather is
    # fully vectorized AND exact: the summands are small integers, so f32
    # prefix sums stay exactly representable and the differences are exact.
    F, _ = layout.recompute_x_frags
    x = fields["x_atoms"]
    atf = fields["atom_to_frag"]
    perm = jnp.argsort(atf, stable=True)
    cs = jnp.cumsum(x[perm], axis=0, dtype=jnp.float32)
    csz = jnp.concatenate([jnp.zeros((1, x.shape[1]), cs.dtype), cs], axis=0)
    atf_sorted = atf[perm]
    fidx = jnp.arange(F, dtype=atf.dtype)
    starts = jnp.searchsorted(atf_sorted, fidx, side="left")
    ends = jnp.searchsorted(atf_sorted, fidx, side="right")
    fields["x_frags"] = csz[ends] - csz[starts]

    for lvl, (tn, te, nc, kk) in layout.tm_static:
        parts = tm_parts[lvl]
        if "flat_slot" in parts:
            flat = parts["flat_slot"]
        else:  # derive (its definition, ops/tcsr.py:135)
            dst = fields[_TM_DST[lvl]]
            mask = fields[_TM_DST[lvl].replace("_dst", "_mask")
                          if lvl != "tm_frag" else "fconn_mask"]
            tile = dst // tn
            eids = jnp.arange(dst.shape[0], dtype=jnp.int32)
            flat = tile * (nc * te) + (eids - parts["ew_blk"][tile] * te)
            flat = jnp.where(mask > 0, flat, 0)
        fields[lvl] = TileMeta(ew_blk=parts["ew_blk"], sw_tile=parts["sw_tile"],
                               flat_slot=flat, cw=parts["cw"], tn=tn, te=te,
                               n_chunks=nc, k_src=kk)

    # dense planes rebuilt on device (ops/dense_gat.py layout) with the
    # Pallas plane-builder over the levels' TileMeta edge windows — an XLA
    # scatter here costs ~6 ms/step (serialized on TPU; r5 pipeline
    # experiments), the builder ~1-2 ms, and without planes decoded batches
    # fall to the ~3x slower TCSR bond/fc passes.
    _DP_TM = {"dp_bond": "tm_bond", "dp_fc": "tm_fc",
              "dp_atom": "tm_atom", "dp_frag": "tm_frag"}
    for lvl, src_f, dst_f, mask_f, ea_f, n_nodes, tn in layout.dp_specs:
        tm = fields.get(_DP_TM[lvl])
        if tm is None:
            continue
        from fragnet_tpu.ops.dense_gat import build_dense_planes_device

        fields[lvl] = build_dense_planes_device(
            fields[src_f], fields[dst_f], fields[mask_f],
            fields[ea_f] if ea_f else None, n_nodes, tm)
    return HierGraphBatch(**fields)
