"""Octree family (brick) convolutions — the TPU-native sparse conv engine.

Motivation (measured on TPU v5e through this image's runtime): random
dependent gathers run at ~66M/s, so per-query binary search for every
(point, kernel-offset) pair — the naive gather-GEMM sparse conv — is
latency-bound at ~1s per 32k-point 5^3 conv.  This module restructures
every conv in the codec around the octree parent/child hierarchy:

  * children of one parent are packed into a dense [P, 8, C] *brick*;
  * any kernel-<=5 conv at the child level only touches children of the
    parent's 27 neighbors (per axis: offsets -2..2 from child c of parent p
    live in parents p-1, p, p+1);
  * so a conv = 27 brick gathers (wide rows, efficient) + one
    [P, 8C] x [8C, 8D] matmul per neighbor offset (MXU-sized), with the
    kernel's taps scattered into the (slot_in, slot_out) structure;
  * the only integer search is the *parent-level* 27-neighborhood map —
    27 x P queries instead of 125 x 8P, built once per level and shared by
    every layer operating on that point set (generative transpose +
    occupancy-head convs in g_s, conv+GDN stacks in g_a, h_a/h_s).

This replaces MinkowskiEngine's C++ coordinate-hash kernel maps
(SURVEY.md §2 native component 1) with a formulation XLA can keep on the
MXU.  Morton keys make all bookkeeping trivial: parent = key >> 3,
slot = key & 7, and children of sorted parents are sorted.
"""

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from . import coords as C

_KEY_MASK = (jnp.int64(1) << C.BATCH_SHIFT) - 1


def default_compute_dtype():
    """bf16 matmuls on TPU (MXU native); f32 elsewhere (XLA CPU has no
    bf16 x bf16 dot)."""
    import jax as _jax
    return jnp.bfloat16 if _jax.default_backend() == "tpu" else jnp.float32


def lower_bound(keys, queries):
    """Branchless unrolled binary search: smallest i with keys[i] >= q."""
    n = keys.shape[0]
    step = 1
    while step * 2 <= n:
        step *= 2
    pos = jnp.where(keys[step - 1] < queries, n - step, 0).astype(jnp.int32)
    step >>= 1
    while step > 0:
        probe = pos + step - 1
        pos = jnp.where(keys[probe] < queries, pos + step, pos)
        step >>= 1
    return pos


def find(keys, queries):
    """(idx, found) of each query key in sorted `keys`."""
    idx = jnp.minimum(lower_bound(keys, queries), keys.shape[0] - 1)
    found = (keys[idx] == queries) & C.key_is_valid(queries)
    return idx.astype(jnp.int32), found


_EPS_OFFSETS = np.stack(np.meshgrid(*([np.arange(-1, 2)] * 3), indexing="ij"),
                        axis=-1).reshape(-1, 3)  # [27, 3]


@flax.struct.dataclass
class FamilyMap:
    """Parent-space structure of a sorted point set.

    parent_keys: int64[P] sorted dedup'd parents (sentinel padded)
    point_parent: int32[N] index into parent_keys per point (P if clipped)
    point_slot:  int32[N] child slot (morton & 7) per point
    nbr_idx:     int32[P, 27] parent-neighborhood indices into parent_keys
    nbr_ok:      bool[P, 27]
    """

    parent_keys: jax.Array
    point_parent: jax.Array
    point_slot: jax.Array
    nbr_idx: jax.Array
    nbr_ok: jax.Array
    # static: points are the full child expansion in slot order (point i is
    # child i&7 of parent i>>3) — brick packing/unpacking is then a reshape
    contiguous: bool = flax.struct.field(pytree_node=False, default=False)

    @property
    def num_parents(self):
        return self.parent_keys.shape[0]


def _neighbor_queries(parent_keys):
    """All 27 neighbor keys of every parent in one batch: [P, 27]."""
    b = parent_keys & ~_KEY_MASK
    u = C.key_units(parent_keys)  # [P, 3]
    nu = u[:, None, :] + jnp.asarray(_EPS_OFFSETS, jnp.int32)[None]  # [P,27,3]
    ok = jnp.all(nu >= 0, -1) & jnp.all(nu < (1 << C.COORD_BITS), -1) \
        & C.key_is_valid(parent_keys)[:, None]
    nk = jnp.where(ok, b[:, None] | C.morton_encode(jnp.maximum(nu, 0)),
                   C.SENTINEL)
    return nk, ok


def _parent_neighbors(parent_keys):
    """27-neighborhood map of a sorted parent key set (the only search)."""
    nk, _ = _neighbor_queries(parent_keys)
    idx, found = find(parent_keys, nk.reshape(-1))
    return idx.reshape(nk.shape), found.reshape(nk.shape)


def _derive_tables():
    """Static [8, 27] tables for neighbor-map derivation: for (slot, eps)
    the parent-level offset code and the target child slot.

    target unit = 2*up + slot + eps; its parent = up + floor((slot+eps)/2),
    its slot = (slot+eps) mod 2 — per axis."""
    ecode = np.zeros((8, 27), np.int32)
    slot2 = np.zeros((8, 27), np.int32)
    for s in range(8):
        sv = np.array([(s >> 2) & 1, (s >> 1) & 1, s & 1])
        for ei, e in enumerate(_EPS_OFFSETS):
            t = sv + e
            pe = np.floor_divide(t, 2)
            sl = t - 2 * pe
            ecode[s, ei] = (pe[0] + 1) * 9 + (pe[1] + 1) * 3 + (pe[2] + 1)
            slot2[s, ei] = (sl[0] << 2) | (sl[1] << 1) | sl[2]
    return ecode, slot2


_ECODE, _SLOT2 = _derive_tables()


def parents_of(keys, parent_cap):
    """(parent_keys, point_parent, point_slot) of a sorted key set —
    dedup by stable compaction, no search."""
    fm = build_family(keys, parent_cap=parent_cap,
                      nbr=(jnp.zeros((parent_cap, 27), jnp.int32),
                           jnp.zeros((parent_cap, 27), bool)))
    return fm.parent_keys, fm.point_parent, fm.point_slot


def member_brick(point_parent, point_slot, valid, p_cap, n_members):
    """[P+1, 8] int32: index of the member at (parent, slot), else n_members.
    Invalid rows go to the dump row so they cannot clobber slot (0, 0)."""
    n = point_parent.shape[0]
    return jnp.full((p_cap + 1, 8), n_members, jnp.int32).at[
        jnp.where(valid, jnp.minimum(point_parent, p_cap), p_cap),
        point_slot].set(
        jnp.where(valid, jnp.arange(n, dtype=jnp.int32), n_members),
        mode="drop", unique_indices=True)


def derive_neighbors(q_parent, q_slot, q_valid, parent_nbr, target_brick,
                     n_targets):
    """27-neighborhood of query nodes into a target set, derived from the
    shared parent level's self map in O(1) gathers per (node, offset).

    Queries and targets both live one octree level below P: query node =
    child q_slot of P[q_parent]; target membership is given by
    ``target_brick`` (from member_brick).  Returns (idx int32[N,27],
    ok bool[N,27]) into the target set.

    Column selection by slot uses an 8-way static-permutation select
    (jnp.take_along_axis lowers to a gather that is ~10x slower than the
    equivalent elementwise selects on TPU)."""
    p_nbr_idx, p_nbr_ok = parent_nbr
    p_cap = p_nbr_idx.shape[0]
    pp = jnp.minimum(q_parent, p_cap - 1)
    rows_idx = p_nbr_idx[pp]          # [N, 27] wide row gather
    rows_ok = p_nbr_ok[pp]

    # per-slot static column permutation of the parent's 27 neighbors
    tgt_parent = rows_idx[:, _ECODE[0]]
    tgt_ok = rows_ok[:, _ECODE[0]]
    for s in range(1, 8):
        sel = (q_slot == s)[:, None]
        tgt_parent = jnp.where(sel, rows_idx[:, _ECODE[s]], tgt_parent)
        tgt_ok = jnp.where(sel, rows_ok[:, _ECODE[s]], tgt_ok)
    s2 = jnp.asarray(_SLOT2)[q_slot]  # [N, 27] small-table row gather

    # flattened 1-D gather into the membership brick
    flat = target_brick.reshape(-1)
    idx = flat[jnp.minimum(tgt_parent, p_cap) * 8 + s2]
    ok = tgt_ok & (idx < n_targets) & q_valid[:, None] \
        & (q_parent < p_cap)[:, None]
    return jnp.minimum(idx, n_targets - 1), ok


def derive_self_neighbors(keys, point_parent, point_slot, parent_nbr):
    """Self 27-neighborhood map of a set S ⊆ children(P), derived from P's
    own self map — no binary search."""
    n = keys.shape[0]
    valid = C.key_is_valid(keys)
    p_cap = parent_nbr[0].shape[0]
    sb = member_brick(point_parent, point_slot, valid, p_cap, n)
    return derive_neighbors(point_parent, point_slot, valid, parent_nbr, sb, n)


def pyramid(keys, caps, skip_finest_nbr=False, root_nbr=None):
    """Octree level pyramid with derived neighbor maps.

    keys: finest-level sorted key set.  caps: static capacities of each
    coarser level (len = number of downsamples).  Returns a list of level
    dicts, finest first:
      {keys, pp (parent link into the next level), sl, nbr (self map)}
    The only binary search happens at the coarsest level.
    skip_finest_nbr: don't derive the finest level's self map (down-conv
    stacks never use it — it's the most expensive one).
    root_nbr: optional host-precomputed (idx, ok) self map of the coarsest
    level (see host_root_neighbors) replacing the device binary search."""
    levels = [{"keys": keys}]
    cur = keys
    for cap in caps:
        pk, pp, sl = parents_of(cur, cap)
        levels[-1]["pp"] = pp
        levels[-1]["sl"] = sl
        levels.append({"keys": pk})
        cur = pk
    levels[-1]["nbr"] = root_nbr if root_nbr is not None \
        else root_neighbors(levels[-1]["keys"])
    stop = 1 if skip_finest_nbr else 0
    for i in range(len(levels) - 2, stop - 1, -1):
        levels[i]["nbr"] = derive_self_neighbors(
            levels[i]["keys"], levels[i]["pp"], levels[i]["sl"],
            levels[i + 1]["nbr"])
    return levels


def root_neighbors(keys):
    """Self map by direct binary search — used once, at the coarsest level."""
    return _parent_neighbors(keys)


def host_root_neighbors(keys_np, levels_down, cap, level_caps=None):
    """Host (numpy) twin of the pyramid root: downsample `levels_down`
    octree levels, pad to `cap`, and build the 27-neighborhood self map by
    vectorized searchsorted.

    Dependent gathers on TPU run at ~50M/s, so the root search — whose cost
    is set by the static cap, not the true count — is better done on the
    CPU in microseconds and shipped up (cap x 27 x 5 bytes).  Results are
    bit-identical to the device path because both sides apply the same
    downsample/truncate/sort rules to the same keys: `level_caps` must
    match the device pyramid's per-level capacities (truncation happens at
    *every* level, not just the root)."""
    sent = np.iinfo(np.int64).max
    m = np.asarray(keys_np)
    m = m[m != sent]
    key_mask = (1 << C.BATCH_SHIFT) - 1
    if level_caps is None:
        level_caps = [cap] * levels_down
    for lc in level_caps[:levels_down]:
        m = np.unique((m & ~key_mask) | ((m & key_mask) >> 3))[:lc]
    m = m[:cap]
    n = len(m)
    keys = np.full(cap, sent, np.int64)
    keys[:n] = m

    # work only on the valid prefix; the padded tail is all-invalid
    units = C.morton_decode_np(m & key_mask)
    bbits = m & ~key_mask
    nu = units[:, None, :] + _EPS_OFFSETS[None]  # [n, 27, 3]
    ok = np.all(nu >= 0, -1) & np.all(nu < (1 << C.COORD_BITS), -1)
    nk = np.where(ok, bbits[:, None] | C.morton_encode_np(np.maximum(nu, 0)),
                  sent)
    ii = np.minimum(np.searchsorted(m, nk.reshape(-1)), max(n - 1, 0)) \
        .astype(np.int32).reshape(nk.shape)
    ff = (m[ii] == nk) & (nk != sent) if n else np.zeros_like(ok)
    idx = np.zeros((cap, 27), np.int32)
    found = np.zeros((cap, 27), bool)
    idx[:n] = ii
    found[:n] = ff
    return keys, idx, found


def transpose_cover_table():
    """Static bool [27, 8]: whether child slot s of an output parent at
    offset eps from an input parent receives any kernel-5 transpose tap
    (|slot - 2*eps| <= 2 per axis).  Used by region-candidate mode to mark
    which children of the dilated set are reachable by the generative
    transpose (the reference's ME region semantics,
    /root/reference/model/transforms.py:129-137)."""
    tab = np.zeros((27, 8), bool)
    for ei, e in enumerate(_EPS_OFFSETS):
        for s in range(8):
            sv = np.array([(s >> 2) & 1, (s >> 1) & 1, s & 1])
            if np.all(np.abs(sv - 2 * e) <= 2):
                tab[ei, s] = True
    return tab


def cross_neighbors(out_parent_keys, in_parent_keys):
    """27-neighborhood map from output parents into a *different* input
    parent set (e.g. h_s's final conv evaluated at the y coordinates)."""
    nk, _ = _neighbor_queries(out_parent_keys)
    idx, found = find(in_parent_keys, nk.reshape(-1))
    return idx.reshape(nk.shape), found.reshape(nk.shape)


def build_family(keys, parent_cap=None, parent_keys=None, nbr=None):
    """Build the FamilyMap of a sorted key set.

    If the parent set is already known (e.g. candidates = children(L) have
    parent set exactly L), pass parent_keys (and optionally a precomputed
    (nbr_idx, nbr_ok)) to skip the dedup and/or the search."""
    morton = keys & _KEY_MASK
    slot = jnp.where(C.key_is_valid(keys), morton & 7, 0).astype(jnp.int32)
    pkey = jnp.where(C.key_is_valid(keys),
                     (keys & ~_KEY_MASK) | (morton >> 3), C.SENTINEL)
    if parent_keys is None:
        parent_cap = parent_cap or keys.shape[0]
        new = jnp.concatenate([jnp.array([True]), pkey[1:] != pkey[:-1]])
        new = new & C.key_is_valid(pkey)
        # index of each point's parent among the dedup'd parents
        from .scan import cumsum_i32
        pidx = cumsum_i32(new) - 1
        pidx = jnp.where(C.key_is_valid(pkey), pidx, parent_cap)
        dest = jnp.where(new, pidx, parent_cap)
        parent_keys = jnp.full((parent_cap,), C.SENTINEL, keys.dtype).at[
            dest].set(pkey, mode="drop", unique_indices=True,
                      indices_are_sorted=True)
        point_parent = jnp.minimum(pidx, parent_cap).astype(jnp.int32)
    else:
        # parents are known: locate each point's parent by search (cheap
        # when the caller passes candidates = children(parent_keys), where
        # point_parent = arange >> 3 — see child_family)
        i, f = find(parent_keys, pkey)
        point_parent = jnp.where(f, i, parent_keys.shape[0]).astype(jnp.int32)
    if nbr is None:
        nbr_idx, nbr_ok = _parent_neighbors(parent_keys)
    else:
        nbr_idx, nbr_ok = nbr
    return FamilyMap(parent_keys=parent_keys, point_parent=point_parent,
                     point_slot=slot, nbr_idx=nbr_idx, nbr_ok=nbr_ok)


def child_family(parent_keys, nbr=None):
    """FamilyMap of the full child expansion of `parent_keys` (all 8 slots
    of every parent, in order) — zero search, zero dedup."""
    p = parent_keys.shape[0]
    ar = jnp.arange(8 * p, dtype=jnp.int32)
    if nbr is None:
        nbr_idx, nbr_ok = _parent_neighbors(parent_keys)
    else:
        nbr_idx, nbr_ok = nbr
    return FamilyMap(parent_keys=parent_keys,
                     point_parent=ar >> 3, point_slot=ar & 7,
                     nbr_idx=nbr_idx, nbr_ok=nbr_ok, contiguous=True)


# Brick packing via index scatter + row gather instead of scattering the
# feature rows themselves: the scatter payload drops from C*4 bytes/point
# to 4 bytes/point (TPU scatters are slow per byte; gathers are fast).
# Live A/B on the vox10 bench frame: enc 2.12 -> 1.59 s, dec 2.18 -> 1.77 s,
# bitstream identical — on by default.
BRICK_GATHER = True


def to_brick(fm: FamilyMap, feats):
    """Pack point features into the dense [P+1, 8, C] brick tensor (row P is
    the dump row for clipped parents).  For contiguous (full child
    expansion) families this is a reshape — scattering 2M rows costs
    seconds on TPU, reshaping is free."""
    p = fm.num_parents
    if fm.contiguous:
        b = feats.reshape(p, 8, feats.shape[-1])
        return jnp.concatenate(
            [b, jnp.zeros((1, 8, feats.shape[-1]), feats.dtype)], axis=0)
    if BRICK_GATHER:
        n = feats.shape[0]
        idx = jnp.full((p + 1, 8), n, jnp.int32).at[
            fm.point_parent, fm.point_slot].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop", unique_indices=True)
        fpad = jnp.concatenate(
            [feats, jnp.zeros((1, feats.shape[-1]), feats.dtype)], axis=0)
        return fpad[idx]
    brick = jnp.zeros((p + 1, 8, feats.shape[-1]), feats.dtype)
    return brick.at[fm.point_parent, fm.point_slot].set(
        feats, mode="drop", unique_indices=True)


def from_brick(fm: FamilyMap, brick, valid):
    """Read per-point rows back out of a brick tensor."""
    out = brick[fm.point_parent, fm.point_slot]
    return out * valid[:, None].astype(out.dtype)


def _slot_tap_table(kernel_size):
    """Static [27, 8, 8] table: tap index into the K^3 kernel for
    (parent-offset eps, slot_in, slot_out), or -1 if the tap is outside the
    kernel.  delta = 2*eps + slot_in - slot_out per axis."""
    r = kernel_size // 2
    k = kernel_size
    tab = np.full((27, 8, 8), -1, np.int32)
    for ei, e in enumerate(_EPS_OFFSETS):
        for si in range(8):
            s_in = np.array([(si >> 2) & 1, (si >> 1) & 1, si & 1])
            for so in range(8):
                s_out = np.array([(so >> 2) & 1, (so >> 1) & 1, so & 1])
                d = 2 * e + s_in - s_out
                if np.all(np.abs(d) <= r):
                    # kernel_offsets(k) is meshgrid(ij) of (range - r)
                    di = (d[0] + r) * k * k + (d[1] + r) * k + (d[2] + r)
                    tab[ei, si, so] = di
    return tab


def _expanded_weights(weights, kernel_size):
    """weights [K^3, Cin, Cout] -> [27, 8*Cin, 8*Cout] slot-pair matrices."""
    tab = _slot_tap_table(kernel_size)  # [27, 8, 8]
    cin, cout = weights.shape[1], weights.shape[2]
    wpad = jnp.concatenate(
        [weights, jnp.zeros((1, cin, cout), weights.dtype)], axis=0)
    w = wpad[jnp.asarray(tab)]  # [27, 8, 8, Cin, Cout]; -1 -> zero row
    w = jnp.where(jnp.asarray(tab)[..., None, None] >= 0, w, 0.0)
    # [27, (slot_in, Cin), (slot_out, Cout)]
    return w.transpose(0, 1, 3, 2, 4).reshape(27, 8 * cin, 8 * cout)


def family_conv(fm_in: FamilyMap, in_feats, in_valid, weights, kernel_size,
                out_fm: FamilyMap = None, out_keys_valid=None,
                nbr_cross=None, compute_dtype=None):
    """Sparse conv (stride 1, odd kernel <= 5) over bricks.

    fm_in:  FamilyMap of the input set (brick source).
    out_fm: FamilyMap of the output set; None -> same set as input.
    nbr_cross: optional (idx, ok) mapping *output* parents into *input*
      parents (27-neighborhood).  None -> fm_in.nbr (same parent set).
    Returns per-point output features aligned with the output set.
    """
    compute_dtype = compute_dtype or default_compute_dtype()
    if out_fm is None:
        out_fm = fm_in
    if nbr_cross is None:
        nbr_idx, nbr_ok = fm_in.nbr_idx, fm_in.nbr_ok
    else:
        nbr_idx, nbr_ok = nbr_cross
    brick = to_brick(fm_in, in_feats * in_valid[:, None].astype(in_feats.dtype))
    p_in = fm_in.num_parents
    p_out = nbr_idx.shape[0]
    cin = in_feats.shape[-1]
    cout = weights.shape[-1]
    wexp = _expanded_weights(weights, kernel_size).astype(compute_dtype)
    flat = brick[:p_in].reshape(p_in, 8 * cin).astype(compute_dtype)
    acc = _tap_scan_gemm(flat, p_in, nbr_idx, nbr_ok, wexp, compute_dtype)
    if out_fm.contiguous and out_fm.num_parents == p_out:
        out = acc.reshape(p_out * 8, cout)
    else:
        out_brick = jnp.concatenate(
            [acc.reshape(p_out, 8, cout),
             jnp.zeros((1, 8, cout), jnp.float32)], axis=0)
        out = out_brick[jnp.minimum(out_fm.point_parent, p_out),
                        out_fm.point_slot]
    if out_keys_valid is not None:
        out = out * out_keys_valid[:, None].astype(out.dtype)
    return out


def family_transpose_up(fm_parent_nbr, in_feats, in_valid, weights,
                        kernel_size, compute_dtype=None):
    """Generative transposed conv stride 2 (kernel 2 or 5) onto the full
    child expansion of the input set.

    fm_parent_nbr: (nbr_idx, nbr_ok) 27-neighborhood of the *input* set in
    its own key space (for kernel 2 only the center is used).
    Returns child features [8*N_in, Cout] aligned with
    upsample_children_keys(in_keys)."""
    compute_dtype = compute_dtype or default_compute_dtype()
    n = in_feats.shape[0]
    cin, cout = in_feats.shape[-1], weights.shape[-1]
    x = (in_feats * in_valid[:, None].astype(in_feats.dtype)).astype(compute_dtype)
    if kernel_size == 2:
        # out[8u + s] = in[u] @ W[s]: one einsum, zero gathers.
        w = weights.astype(compute_dtype)  # [8, Cin, Cout]
        out = jnp.einsum("nc,scd->nsd", x, w,
                         preferred_element_type=jnp.float32)
        return out.reshape(8 * n, cout)
    assert kernel_size == 5
    # nbr may be a *cross* map (rows = an output parent set different from
    # the input set, e.g. the dilated set in region-candidate mode); output
    # children align with upsample_children_keys(rows' keys).
    nbr_idx, nbr_ok = fm_parent_nbr
    # delta = slot - 2*eps per axis; valid when |delta| <= 2 (always for
    # slot in {0,1}, eps in {-1,0,1} except slot=1, eps=-1 -> delta=3)
    tab = np.full((27, 8), -1, np.int32)
    for ei, e in enumerate(_EPS_OFFSETS):
        for s in range(8):
            sv = np.array([(s >> 2) & 1, (s >> 1) & 1, s & 1])
            d = sv - 2 * e
            if np.all(np.abs(d) <= 2):
                tab[ei, s] = (d[0] + 2) * 25 + (d[1] + 2) * 5 + (d[2] + 2)
    wpad = jnp.concatenate([weights,
                            jnp.zeros((1, cin, cout), weights.dtype)], 0)
    wt = wpad[jnp.asarray(tab)]  # [27, 8, Cin, Cout]
    wt = jnp.where(jnp.asarray(tab)[..., None, None] >= 0, wt, 0.0)
    # [27, Cin, 8*Cout]: einsum nc,scd->nsd == nb @ wt2 with out slot-major
    wt2 = wt.transpose(0, 2, 1, 3).reshape(27, cin, 8 * cout) \
        .astype(compute_dtype)
    n_out = nbr_idx.shape[0]
    acc = _tap_scan_gemm(x, n, nbr_idx, nbr_ok, wt2, compute_dtype)
    return acc.reshape(8 * n_out, cout)


# -- grandparent-brick ("grand") kernels -------------------------------------
#
# At the decoder's finest level the candidate set is millions of rows while
# its grandparent set G (two octree levels up) is ~64x smaller.  Row gathers
# on TPU are op-bound (~20M rows/s almost independent of row width), so
# folding BOTH child levels into the brick — features live in [G, 64, C]
# grandchild-slot layout and convs gather 27 G-neighbor rows of 2-8 KB —
# cuts gather ops 8x vs the [P, 8, C] child bricks above.  The price is
# denser tap matrices ([64*cin, 64*cout] slot-pair blocks, mostly zeros), so
# this pays only where channels are small: exactly the finest synthesis
# level (transpose N1->N1/4, heads N1/4->N4/8->1).

_GRAND_SLOTS = {"conv": (64, 64), "transpose": (8, 64), "down": (64, 8)}


def _grand_axes(v, n):
    """Per-axis position of slot v within its grandparent (n=64) or parent
    (n=8) cell, following the (x<<2 | y<<1 | z) slot bit convention."""
    if n == 64:
        hi, lo = v >> 3, v & 7
        return np.array([2 * ((hi >> 2) & 1) + ((lo >> 2) & 1),
                         2 * ((hi >> 1) & 1) + ((lo >> 1) & 1),
                         2 * (hi & 1) + (lo & 1)])
    return np.array([(v >> 2) & 1, (v >> 1) & 1, v & 1])


def _grand_tap_table(kernel_size, mode):
    """Static [27, n_in, n_out] tap index into the K^3 kernel for
    (G-offset eps, slot_in, slot_out), -1 outside the kernel.

    Tap conventions match the child-brick kernels above:
      conv:      delta = in - out            = 4e + v_in - v_out
      transpose: delta = out - 2*in (gen-up)  = v_out - 2*v_in - 4e
      down:      delta = in - 2*out (stride2) = 4e + v_in - 2*v_out
    where e is the offset of the *gathered input* G-cell relative to the
    output's G-cell (nbr rows are u + eps in _EPS_OFFSETS order)."""
    r = kernel_size // 2
    k = kernel_size
    n_in, n_out = _GRAND_SLOTS[mode]
    tab = np.full((27, n_in, n_out), -1, np.int32)
    for ei, e in enumerate(_EPS_OFFSETS):
        for si in range(n_in):
            vi = _grand_axes(si, n_in)
            for so in range(n_out):
                vo = _grand_axes(so, n_out)
                if mode == "conv":
                    d = 4 * e + vi - vo
                elif mode == "transpose":
                    d = vo - 2 * vi - 4 * e
                else:
                    d = 4 * e + vi - 2 * vo
                if np.all(np.abs(d) <= r):
                    tab[ei, si, so] = (d[0] + r) * k * k + (d[1] + r) * k \
                        + (d[2] + r)
    return tab


def grand_expand_weights(weights, kernel_size, mode, compute_dtype):
    """weights [K^3, cin, cout] -> [27, n_in*cin, n_out*cout]."""
    tab = _grand_tap_table(kernel_size, mode)
    n_in, n_out = tab.shape[1], tab.shape[2]
    cin, cout = weights.shape[1], weights.shape[2]
    wpad = jnp.concatenate(
        [weights, jnp.zeros((1, cin, cout), weights.dtype)], axis=0)
    w = wpad[jnp.asarray(tab)]  # [27, n_in, n_out, cin, cout]
    w = jnp.where(jnp.asarray(tab)[..., None, None] >= 0, w, 0.0)
    return w.transpose(0, 1, 3, 2, 4).reshape(
        27, n_in * cin, n_out * cout).astype(compute_dtype)


# Row-tiled tap accumulation: flag + tile size.  Off by default until the
# live TPU A/B lands; flipped per-process by bench/codec experiments.
# (GRAND_TILED is the historical name; it now governs every tap scan.)
TAP_TILED = False
TAP_TILE = 1024

# Single-matmul tap accumulation: gather all T taps into [rows, T, K_in]
# and contract (T, K_in) against the weight stack in ONE dot_general.
# Same MACs as the tap scan, but the f32 accumulator lives in
# VMEM/registers inside one MXU pass instead of round-tripping HBM 2*T
# times (the dominant traffic term: 2*27*rows*K_out*4 B ~ 14 GB on the
# decode's top grand conv vs ~1.7 GB of actual gather payload).  The
# gathered stack is materialized (bf16), so peak temp grows by
# rows*T*K_in*2 B; TAP_BIGMM_MAXTMP caps that — larger convs fall back to
# the scan.  Accumulation ORDER differs from the scan (one fused f32
# reduction), so results agree to f32 rounding, not bit-for-bit; encoder
# and decoder share the same graphs, so codec consistency is unaffected.
TAP_BIGMM = False
TAP_BIGMM_MAXTMP = 4 << 30  # bytes of gathered-stack temp allowed

# Tap-GROUPED accumulation: the middle ground between the scan (27 acc
# round-trips) and TAP_BIGMM (whole [rows, 27, K_in] stack resident).
# Scan over T/g groups; each step gathers g taps into [rows, g, K_in] and
# contracts (g, K_in) in ONE dot_general, so the f32 accumulator round-
# trips HBM only 2*(T/g) times instead of 2*T, while the materialized
# gather temp is bounded at rows*g*K_in*2 B per step.  g must divide the
# (zero-padded) tap count; 27 taps pad to 28 for g=4, etc.  Accumulation
# order differs from the plain scan (grouped f32 reductions) — same
# f32-rounding caveat as TAP_BIGMM, encoder/decoder share graphs.
# 1 disables (plain scan).  Flipped per-process by bench/codec A/Bs.
TAP_GROUP = 1


def _tap_scan_gemm(flat, n_src, nbr_idx, nbr_ok, wstack, compute_dtype):
    """acc[r] = sum_k (flat[nbr_idx[r, k]] * ok[r, k]) @ wstack[k].

    flat: [n_src, K_in] compute_dtype.  wstack: [T, K_in, K_out].
    Returns [rows, K_out] float32.

    Three formulations; the two scan forms share one per-element
    accumulation order (bit-identical), TAP_BIGMM agrees to f32 rounding:
      * tap scan (default): lax.scan over the T taps, acc [rows, K_out] f32
        carried through HBM — 2*T acc round-trips dominate traffic at
        production scale (profiler: 24-27 GB per decode grand conv).
      * row-tiled (TAP_TILED): lax.scan over row tiles with all T taps
        unrolled in the body, acc tile written once (compiler estimate on
        the decode's top conv: 49.8 -> 7.7 GB accessed; a wash live — XLA
        still spills the acc tile between the 27 unfused dots).
      * big-matmul (TAP_BIGMM): see flag comment above."""
    rows = nbr_idx.shape[0]
    k_in = wstack.shape[1]
    k_out = wstack.shape[-1]
    taps = wstack.shape[0]
    if TAP_BIGMM and rows * taps * k_in * 2 <= TAP_BIGMM_MAXTMP:
        gathered = flat[jnp.minimum(nbr_idx, n_src - 1)]  # [rows, T, K_in]
        gathered = gathered * nbr_ok[..., None].astype(compute_dtype)
        return jax.lax.dot_general(
            gathered, wstack,
            dimension_numbers=(((1, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32)
    if TAP_GROUP > 1 and taps > TAP_GROUP:
        g = TAP_GROUP
        pad = (-taps) % g
        if pad:
            nbr_idx = jnp.concatenate(
                [nbr_idx, jnp.zeros((rows, pad), nbr_idx.dtype)], 1)
            nbr_ok = jnp.concatenate(
                [nbr_ok, jnp.zeros((rows, pad), nbr_ok.dtype)], 1)
            wstack = jnp.concatenate(
                [wstack, jnp.zeros((pad,) + wstack.shape[1:],
                                   wstack.dtype)], 0)
        n_groups = (taps + pad) // g
        idx_g = nbr_idx.reshape(rows, n_groups, g).transpose(1, 0, 2)
        ok_g = nbr_ok.reshape(rows, n_groups, g).transpose(1, 0, 2)
        w_g = wstack.reshape(n_groups, g, k_in, k_out)

        def gstep(acc, inp):
            ni, ok, wk = inp  # [rows, g], [rows, g], [g, K_in, K_out]
            nb = flat[jnp.minimum(ni, n_src - 1)] \
                * ok[..., None].astype(compute_dtype)  # [rows, g, K_in]
            return acc + jax.lax.dot_general(
                nb, wk, dimension_numbers=(((1, 2), (0, 1)), ((), ())),
                preferred_element_type=jnp.float32), None

        acc0 = jnp.zeros((rows, k_out), jnp.float32)
        acc, _ = jax.lax.scan(gstep, acc0, (idx_g, ok_g, w_g))
        return acc
    if TAP_TILED and rows % TAP_TILE == 0 and rows >= 2 * TAP_TILE:
        t = TAP_TILE
        idx_t = nbr_idx.reshape(rows // t, t, taps)
        ok_t = nbr_ok.reshape(rows // t, t, taps)

        def tile_step(_, inp):
            ni, ok = inp  # [t, taps] each
            acc = jnp.zeros((t, k_out), jnp.float32)
            for k in range(taps):
                nb = flat[jnp.minimum(ni[:, k], n_src - 1)] \
                    * ok[:, k][:, None].astype(compute_dtype)
                acc = acc + jnp.dot(nb, wstack[k],
                                    preferred_element_type=jnp.float32)
            return None, acc

        _, acc = jax.lax.scan(tile_step, None, (idx_t, ok_t))
        return acc.reshape(rows, k_out)

    def step(acc, inp):
        ni, ok, wk = inp
        nb = flat[jnp.minimum(ni, n_src - 1)] * ok[:, None].astype(compute_dtype)
        return acc + jnp.dot(nb, wk, preferred_element_type=jnp.float32), None

    acc0 = jnp.zeros((rows, k_out), jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, (nbr_idx.T, nbr_ok.T, wstack), unroll=9)
    return acc


def grand_apply(g_nbr, in_brick, weights, kernel_size, mode,
                compute_dtype=None):
    """Apply a conv/transpose/down-conv in grandparent-brick layout.

    g_nbr: (idx, ok) 27-neighborhood self map of the G key set.
    in_brick: [G, n_in, cin] with zeros at invalid slots.
    Returns [G, n_out, cout] float32 (callers add bias and re-mask)."""
    compute_dtype = compute_dtype or default_compute_dtype()
    nbr_idx, nbr_ok = g_nbr
    g = nbr_idx.shape[0]
    n_in, n_out = _GRAND_SLOTS[mode]
    cin = in_brick.shape[-1]
    cout = weights.shape[-1]
    wexp = grand_expand_weights(weights, kernel_size, mode, compute_dtype)
    flat = in_brick.reshape(in_brick.shape[0], n_in * cin)[:g] \
        .astype(compute_dtype)
    acc = _tap_scan_gemm(flat, g, nbr_idx, nbr_ok, wexp, compute_dtype)
    return acc.reshape(g, n_out, cout)


def family_down_conv(fm_in: FamilyMap, in_feats, in_valid, weights,
                     kernel_size, compute_dtype=None):
    """Strided (stride 2) conv: output set = fm_in.parent_keys.

    out[p] = sum_delta in[2p + delta] W[delta]; 2p + delta is slot s of
    parent p+eps with delta = 2*eps + s, so this is one brick pass."""
    compute_dtype = compute_dtype or default_compute_dtype()
    brick = to_brick(fm_in, in_feats * in_valid[:, None].astype(in_feats.dtype))
    p = fm_in.num_parents
    cin, cout = in_feats.shape[-1], weights.shape[-1]
    r = kernel_size // 2
    k = kernel_size
    tab = np.full((27, 8), -1, np.int32)
    for ei, e in enumerate(_EPS_OFFSETS):
        for s in range(8):
            sv = np.array([(s >> 2) & 1, (s >> 1) & 1, s & 1])
            d = 2 * e + sv
            if np.all(np.abs(d) <= r):
                tab[ei, s] = (d[0] + r) * k * k + (d[1] + r) * k + (d[2] + r)
    wpad = jnp.concatenate([weights,
                            jnp.zeros((1, cin, cout), weights.dtype)], 0)
    wt = wpad[jnp.asarray(tab)]
    wt = jnp.where(jnp.asarray(tab)[..., None, None] >= 0, wt, 0.0)
    wt = wt.astype(compute_dtype).reshape(27, 8 * cin, cout)
    flat = brick[:p].reshape(p, 8 * cin).astype(compute_dtype)
    acc = _tap_scan_gemm(flat, p, fm_in.nbr_idx, fm_in.nbr_ok, wt,
                         compute_dtype)
    acc = acc * C.key_is_valid(fm_in.parent_keys)[:, None].astype(acc.dtype)
    return acc


# -- rematerialized conv variants for training ------------------------------
#
# Autodiff of the brick convs saves every one of the 27 gathered neighbor
# blocks as a residual (the weight gradient needs them), which is the
# dominant training-memory term: at flagship scale the g_s grand head conv
# alone holds a [27, G, n_in*cin] residual of several GB (observed OOM:
# bf16[3,9,32768,2048] = 3.4 GB for ONE layer).  jax.checkpoint drops the
# residuals and recomputes the gathers in the backward pass — gathers are
# HBM-bandwidth-cheap relative to holding them live across the whole step.
#
# The training drivers flip CONV_REMAT on before tracing their step
# (trainer / dp / 2-D sharded steps); the codec's forward-only graphs never
# differentiate, so they keep the plain variants and their lowering is
# byte-identical to round-1.

CONV_REMAT = False

# static_argnums cover only arguments the layer call sites actually pass
# positionally (kernel_size / mode); compute_dtype stays at its default
family_conv_remat = jax.checkpoint(family_conv, static_argnums=(4,))
family_transpose_up_remat = jax.checkpoint(family_transpose_up,
                                           static_argnums=(4,))
family_down_conv_remat = jax.checkpoint(family_down_conv,
                                        static_argnums=(4,))
grand_apply_remat = jax.checkpoint(grand_apply, static_argnums=(3, 4))


def conv_fns():
    """(family_conv, family_transpose_up, family_down_conv, grand_apply),
    remat-wrapped when CONV_REMAT is set at trace time."""
    if CONV_REMAT:
        return (family_conv_remat, family_transpose_up_remat,
                family_down_conv_remat, grand_apply_remat)
    return family_conv, family_transpose_up, family_down_conv, grand_apply


import contextlib


@contextlib.contextmanager
def conv_remat(enable=True):
    """Trace-time scope: conv calls inside pick the remat variants.  Wrap
    the body of a differentiated loss fn (executes during tracing), so only
    training graphs remat — codec inference graphs stay untouched."""
    global CONV_REMAT
    old = CONV_REMAT
    CONV_REMAT = enable
    try:
        yield
    finally:
        CONV_REMAT = old
