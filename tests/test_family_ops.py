"""Family (brick) convs must match the generic gather-GEMM convs exactly."""

import numpy as np
import pytest

import upcc_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from upcc_tpu.ops import coords as C
from upcc_tpu.ops.sparse import (from_points, downsample_keys,
                                 upsample_children_keys)
from upcc_tpu.ops.conv import apply_sparse_conv
from upcc_tpu.ops import family as F


def make_st(seed, n=200, extent=24, batches=2, cin=6, cap=256):
    rng = np.random.default_rng(seed)
    xyz = rng.integers(0, extent, (n, 3)).astype(np.int32)
    b = rng.integers(0, batches, n).astype(np.int32)
    f = rng.standard_normal((n, cin)).astype(np.float32)
    return jax.jit(lambda b, x, f: from_points(b, x, f, capacity=cap))(
        jnp.asarray(b), jnp.asarray(xyz), jnp.asarray(f))


@pytest.mark.parametrize("ks", [1, 3, 5])
def test_family_conv_same(ks):
    st = make_st(0)
    rng = np.random.default_rng(1)
    offs = C.kernel_offsets(ks)
    w = jnp.asarray(rng.standard_normal((offs.shape[0], 6, 7)).astype(np.float32) * 0.2)

    ref = jax.jit(lambda st, w: apply_sparse_conv(
        st, st.keys, w, None, offs, "same", 1, compute_dtype=jnp.float32).feats)(st, w)

    def fam(st, w):
        fm = F.build_family(st.keys)
        return F.family_conv(fm, st.feats, st.valid, w, ks,
                             out_keys_valid=st.valid,
                             compute_dtype=jnp.float32)
    got = jax.jit(fam)(st, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("ks", [3, 5])
def test_family_down_conv(ks):
    st = make_st(2)
    rng = np.random.default_rng(3)
    offs = C.kernel_offsets(ks)
    w = jnp.asarray(rng.standard_normal((offs.shape[0], 6, 5)).astype(np.float32) * 0.2)

    def ref_fn(st, w):
        dk = downsample_keys(st.keys)
        return dk, apply_sparse_conv(st, dk, w, None, offs, "down", 2,
                                     compute_dtype=jnp.float32).feats
    dk, ref = jax.jit(ref_fn)(st, w)

    def fam(st, w):
        fm = F.build_family(st.keys)
        return fm.parent_keys, F.family_down_conv(fm, st.feats, st.valid, w, ks,
                                                  compute_dtype=jnp.float32)
    pk, got = jax.jit(fam)(st, w)
    # same parent key set (build_family parents == downsample_keys)
    np.testing.assert_array_equal(np.asarray(pk), np.asarray(dk))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("ks", [2, 5])
def test_family_transpose_up(ks):
    st = make_st(4, extent=12, cap=128)
    st = st.replace(stride=2)
    rng = np.random.default_rng(5)
    offs = C.kernel_offsets(ks)
    w = jnp.asarray(rng.standard_normal((offs.shape[0], 6, 4)).astype(np.float32) * 0.2)

    def ref_fn(st, w):
        ok = upsample_children_keys(st.keys)
        return ok, apply_sparse_conv(st, ok, w, None, offs, "up", 1,
                                     compute_dtype=jnp.float32).feats
    ok_keys, ref = jax.jit(ref_fn)(st, w)

    def fam(st, w):
        nbr = F._parent_neighbors(st.keys)
        return F.family_transpose_up(nbr, st.feats, st.valid, w, ks,
                                     compute_dtype=jnp.float32)
    got = jax.jit(fam)(st, w)
    # mask to valid children (generic path zeroes invalid out slots)
    v = np.asarray(ok_keys) != np.iinfo(np.int64).max
    np.testing.assert_allclose(np.asarray(got)[v], np.asarray(ref)[v],
                               rtol=1e-4, atol=1e-4)


def test_child_family_matches_build():
    st = make_st(6, extent=12, cap=128)
    children = jax.jit(upsample_children_keys)(st.keys)

    def both(st, children):
        cf = F.child_family(st.keys)
        bf = F.build_family(children, parent_cap=st.capacity)
        return cf, bf
    cf, bf = jax.jit(both)(st, children)
    nvalid = int(np.asarray(C.key_is_valid(children)).sum())
    a = np.asarray(cf.point_parent)[:nvalid]
    b = np.asarray(bf.point_parent)[:nvalid]
    # parent sets are both == st.keys (sorted); indices must agree
    np.testing.assert_array_equal(np.asarray(cf.parent_keys),
                                  np.asarray(bf.parent_keys)[:cf.parent_keys.shape[0]])
    np.testing.assert_array_equal(a, b)


def test_cross_set_conv():
    """Conv evaluated at a different output set (h_s final conv at y keys)."""
    st = make_st(7, extent=16, cap=256, batches=1)
    rng = np.random.default_rng(8)
    # output set = random subset of input keys
    keys_np = np.asarray(st.keys)
    v = keys_np != np.iinfo(np.int64).max
    sel = np.where(v)[0][rng.random(v.sum()) < 0.6]
    out_keys_np = np.full(128, np.iinfo(np.int64).max, np.int64)
    out_keys_np[:len(sel)] = keys_np[sel]
    out_keys = jnp.asarray(out_keys_np)

    offs = C.kernel_offsets(3)
    w = jnp.asarray(rng.standard_normal((27, 6, 5)).astype(np.float32) * 0.2)
    ref = jax.jit(lambda st, w: apply_sparse_conv(
        st, out_keys, w, None, offs, "same", 1, compute_dtype=jnp.float32).feats)(st, w)

    def fam2(st, w):
        fm_in = F.build_family(st.keys)
        fm_out = F.build_family(out_keys, parent_cap=out_keys.shape[0],
                                nbr=(jnp.zeros((out_keys.shape[0], 27), jnp.int32),
                                     jnp.zeros((out_keys.shape[0], 27), bool)))
        cross = F.cross_neighbors(fm_out.parent_keys, fm_in.parent_keys)
        return F.family_conv(fm_in, st.feats, st.valid, w, 3, out_fm=fm_out,
                             out_keys_valid=C.key_is_valid(out_keys),
                             nbr_cross=cross, compute_dtype=jnp.float32)
    got = jax.jit(fam2)(st, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_derive_self_neighbors():
    """Derived neighbor maps must equal directly-searched ones."""
    st = make_st(9, n=400, extent=32, batches=2, cap=512)
    def run(keys):
        pk, pp, sl = F.parents_of(keys, 512)
        parent_nbr = F.root_neighbors(pk)
        derived = F.derive_self_neighbors(keys, pp, sl, parent_nbr)
        direct = F._parent_neighbors(keys)
        return derived, direct
    (d_idx, d_ok), (s_idx, s_ok) = jax.jit(run)(st.keys)
    np.testing.assert_array_equal(np.asarray(d_ok), np.asarray(s_ok))
    ok = np.asarray(d_ok)
    np.testing.assert_array_equal(np.asarray(d_idx)[ok], np.asarray(s_idx)[ok])


def test_derive_on_child_subset():
    """Derived maps also work for arbitrary subsets of child expansions
    (the pruned g_s levels)."""
    st = make_st(10, n=200, extent=16, batches=1, cap=256)
    rng = np.random.default_rng(11)
    def run(keys, keep):
        from upcc_tpu.ops.topk import prune
        from upcc_tpu.ops.sparse import upsample_children_keys, SparseTensor
        nbr_p = F.root_neighbors(keys)
        children = upsample_children_keys(keys)
        cf = F.child_family(keys, nbr=nbr_p)
        # prune half the candidates, carrying parent links through compaction
        from upcc_tpu.ops.sparse import compact
        keep = keep & (children != jnp.iinfo(jnp.int64).max)
        ckeys, cpp, csl = compact(children, keep,
                                  cf.point_parent, cf.point_slot)
        derived = F.derive_self_neighbors(ckeys, cpp, csl, nbr_p)
        direct = F._parent_neighbors(ckeys)
        return derived, direct
    keep = jnp.asarray(rng.random(256 * 8) < 0.5)
    (d_idx, d_ok), (s_idx, s_ok) = jax.jit(run)(st.keys, keep)
    np.testing.assert_array_equal(np.asarray(d_ok), np.asarray(s_ok))
    ok = np.asarray(d_ok)
    np.testing.assert_array_equal(np.asarray(d_idx)[ok], np.asarray(s_idx)[ok])


def test_host_root_neighbors_match_device():
    """The host (numpy) root map must equal the device-computed one —
    the codec's bit-exactness depends on it."""
    st = make_st(12, n=500, extent=40, batches=3, cap=1024)
    keys_np = np.asarray(st.keys)
    for levels_down, cap in [(2, 256), (4, 128)]:
        hk, hidx, hok = F.host_root_neighbors(keys_np, levels_down, cap,
                                              [cap] * levels_down)

        def dev(keys):
            k = keys
            for _ in range(levels_down):
                k = downsample_keys(k, cap)
            return k, F.root_neighbors(k)
        dk, (didx, dok) = jax.jit(dev)(st.keys)
        np.testing.assert_array_equal(hk, np.asarray(dk))
        np.testing.assert_array_equal(hok, np.asarray(dok))
        ok = hok
        np.testing.assert_array_equal(hidx[ok], np.asarray(didx)[ok])


def _rand_grand_setup(rng, ng=40, extent=16, pick=0.6):
    """Random G set + random x subset of children(G), with maps."""
    from upcc_tpu.ops import coords as C
    from upcc_tpu.ops import family as F
    units = rng.choice(extent ** 3, size=ng, replace=False)
    gu = np.stack([units // (extent * extent), (units // extent) % extent,
                   units % extent], 1).astype(np.int64)
    gk = np.sort(np.asarray(C.morton_encode_np(gu)))
    g_nbr = F.root_neighbors(jnp.asarray(gk))
    # x = random subset of the 8*ng child slots
    sel = np.sort(rng.choice(8 * ng, size=int(pick * 8 * ng), replace=False))
    xk = (gk[sel >> 3] << 3) | (sel & 7)
    ppar = (sel >> 3).astype(np.int32)
    pslot = (sel & 7).astype(np.int32)
    return gk, g_nbr, jnp.asarray(xk), ppar, pslot


def test_grand_transpose_matches_flat():
    from upcc_tpu.ops import family as F
    rng = np.random.default_rng(11)
    gk, g_nbr, xk, ppar, pslot = _rand_grand_setup(rng)
    cin, cout = 5, 3
    nx = xk.shape[0]
    feats = rng.standard_normal((nx, cin)).astype(np.float32)
    w = rng.standard_normal((125, cin, cout)).astype(np.float32) * 0.2
    x_nbr = F.root_neighbors(xk)
    flat = jax.jit(lambda f, w: F.family_transpose_up(
        x_nbr, f, jnp.ones(nx, bool), w, 5))(feats, w)  # [8*nx, cout]
    # brick of x over G
    xb = np.zeros((len(gk), 8, cin), np.float32)
    xb[ppar, pslot] = feats
    grand = jax.jit(lambda b, w: F.grand_apply(g_nbr, b, w, 5, "transpose"))(
        jnp.asarray(xb), w)  # [G, 64, cout]
    got = np.asarray(grand)[ppar[:, None],
                            pslot[:, None] * 8 + np.arange(8)[None]]
    np.testing.assert_allclose(got.reshape(8 * nx, cout), np.asarray(flat),
                               rtol=2e-5, atol=2e-5)


def test_grand_conv_matches_flat():
    from upcc_tpu.ops import family as F
    rng = np.random.default_rng(12)
    gk, g_nbr, xk, ppar, pslot = _rand_grand_setup(rng)
    cin, cout = 4, 6
    nx = xk.shape[0]
    # candidates = children(x); random feats at candidates
    cfeats = rng.standard_normal((8 * nx, cin)).astype(np.float32)
    w = rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.2
    x_nbr = F.root_neighbors(xk)
    cf = F.child_family(xk, nbr=x_nbr)
    cvalid = jnp.ones(8 * nx, bool)
    flat = jax.jit(lambda f, w: F.family_conv(
        cf, f, cvalid, w, 3, out_keys_valid=cvalid))(cfeats, w)
    cb = np.zeros((len(gk), 64, cin), np.float32)
    cb[ppar[:, None], pslot[:, None] * 8 + np.arange(8)[None]] = \
        cfeats.reshape(nx, 8, cin)
    grand = jax.jit(lambda b, w: F.grand_apply(g_nbr, b, w, 3, "conv"))(
        jnp.asarray(cb), w)
    got = np.asarray(grand)[ppar[:, None],
                            pslot[:, None] * 8 + np.arange(8)[None]]
    np.testing.assert_allclose(got.reshape(8 * nx, cout), np.asarray(flat),
                               rtol=2e-5, atol=2e-5)


def test_grand_down_matches_flat():
    from upcc_tpu.ops import family as F
    rng = np.random.default_rng(13)
    gk, g_nbr, xk, ppar, pslot = _rand_grand_setup(rng)
    cin, cout = 4, 3
    nx = xk.shape[0]
    cfeats = rng.standard_normal((8 * nx, cin)).astype(np.float32)
    w = rng.standard_normal((125, cin, cout)).astype(np.float32) * 0.2
    x_nbr = F.root_neighbors(xk)
    cf = F.child_family(xk, nbr=x_nbr)
    cvalid = jnp.ones(8 * nx, bool)
    # flat stride-2 down conv: output set = x
    flat = jax.jit(lambda f, w: F.family_down_conv(cf, f, cvalid, w, 5))(
        cfeats, w)  # [nx, cout]
    cb = np.zeros((len(gk), 64, cin), np.float32)
    cb[ppar[:, None], pslot[:, None] * 8 + np.arange(8)[None]] = \
        cfeats.reshape(nx, 8, cin)
    grand = jax.jit(lambda b, w: F.grand_apply(g_nbr, b, w, 5, "down"))(
        jnp.asarray(cb), w)  # [G, 8, cout]
    np.testing.assert_allclose(np.asarray(grand)[ppar, pslot],
                               np.asarray(flat), rtol=2e-5, atol=2e-5)


def test_tap_tiled_matches_scan():
    """The row-tiled tap accumulation (acc written once per tile) must equal
    the tap-scan formulation for every conv kernel (same per-element
    accumulation order)."""
    from upcc_tpu.ops import family as F
    rng = np.random.default_rng(21)
    g, cin, cout = 1024, 16, 8
    nbr_idx = jnp.asarray(rng.integers(0, g, (g, 27)).astype(np.int32))
    nbr_ok = jnp.asarray(rng.random((g, 27)) < 0.8)
    brick = jnp.asarray(rng.standard_normal((g, 8, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((125, cin, cout)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((g, cin)).astype(np.float32))
    valid = jnp.ones((g,), bool)

    def runs():
        out = {}
        out["grand"] = jax.jit(lambda: F.grand_apply(
            (nbr_idx, nbr_ok), brick, w, 5, "transpose"))()
        out["transpose"] = jax.jit(lambda: F.family_transpose_up(
            (nbr_idx, nbr_ok), feats, valid, w, 5))()
        fm = F.FamilyMap(parent_keys=jnp.arange(g, dtype=jnp.int64) * 8,
                         point_parent=jnp.arange(g, dtype=jnp.int32),
                         point_slot=jnp.zeros((g,), jnp.int32),
                         nbr_idx=nbr_idx, nbr_ok=nbr_ok)
        out["conv"] = jax.jit(lambda: F.family_conv(
            fm, feats, valid, w, 5))()
        out["down"] = jax.jit(lambda: F.family_down_conv(
            fm, feats, valid, w, 5))()
        return out

    ref = runs()
    old_flag, old_tile = F.TAP_TILED, F.TAP_TILE
    try:
        F.TAP_TILED, F.TAP_TILE = True, 256
        tiled = runs()
    finally:
        F.TAP_TILED, F.TAP_TILE = old_flag, old_tile
    for k in ref:
        np.testing.assert_allclose(np.asarray(tiled[k]), np.asarray(ref[k]),
                                   rtol=1e-6, atol=1e-6, err_msg=k)


def test_tap_bigmm_matches_scan():
    """The single-dot_general tap accumulation must match the tap scan for
    every conv kernel.  Accumulation order differs (one fused f32
    reduction), so the tolerance is f32-rounding-level, not exact."""
    from upcc_tpu.ops import family as F
    rng = np.random.default_rng(22)
    g, cin, cout = 1024, 16, 8
    nbr_idx = jnp.asarray(rng.integers(0, g, (g, 27)).astype(np.int32))
    nbr_ok = jnp.asarray(rng.random((g, 27)) < 0.8)
    brick = jnp.asarray(rng.standard_normal((g, 8, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((125, cin, cout)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((g, cin)).astype(np.float32))
    valid = jnp.ones((g,), bool)

    def runs():
        out = {}
        out["grand"] = jax.jit(lambda: F.grand_apply(
            (nbr_idx, nbr_ok), brick, w, 5, "transpose"))()
        out["transpose"] = jax.jit(lambda: F.family_transpose_up(
            (nbr_idx, nbr_ok), feats, valid, w, 5))()
        fm = F.FamilyMap(parent_keys=jnp.arange(g, dtype=jnp.int64) * 8,
                         point_parent=jnp.arange(g, dtype=jnp.int32),
                         point_slot=jnp.zeros((g,), jnp.int32),
                         nbr_idx=nbr_idx, nbr_ok=nbr_ok)
        out["conv"] = jax.jit(lambda: F.family_conv(
            fm, feats, valid, w, 5))()
        out["down"] = jax.jit(lambda: F.family_down_conv(
            fm, feats, valid, w, 5))()
        return out

    ref = runs()
    old = F.TAP_BIGMM
    try:
        F.TAP_BIGMM = True
        big = runs()
        # the temp-size fallback must also kick in and reproduce the scan
        old_cap = F.TAP_BIGMM_MAXTMP
        F.TAP_BIGMM_MAXTMP = 0
        fell_back = jax.jit(lambda: F.grand_apply(
            (nbr_idx, nbr_ok), brick, w, 5, "transpose"))()
    finally:
        F.TAP_BIGMM = old
        F.TAP_BIGMM_MAXTMP = old_cap
    for k in ref:
        np.testing.assert_allclose(np.asarray(big[k]), np.asarray(ref[k]),
                                   rtol=1e-4, atol=1e-4, err_msg=k)
    np.testing.assert_array_equal(np.asarray(fell_back),
                                  np.asarray(ref["grand"]))


def test_to_brick_gather_matches_scatter():
    """Index-scatter + row-gather brick packing must equal the direct
    feature scatter (including dump-row slicing semantics)."""
    from upcc_tpu.ops import family as F
    rng = np.random.default_rng(5)
    p, n, c = 64, 200, 12
    pairs = rng.choice(p * 8, size=n, replace=False)
    pp = jnp.asarray((pairs // 8).astype(np.int32))
    sl = jnp.asarray((pairs % 8).astype(np.int32))
    # a few clipped points land on the dump row p
    pp = pp.at[:5].set(p)
    fm = F.FamilyMap(parent_keys=jnp.arange(p, dtype=jnp.int64),
                     point_parent=pp, point_slot=sl,
                     nbr_idx=jnp.zeros((p, 27), jnp.int32),
                     nbr_ok=jnp.zeros((p, 27), bool))
    feats = jnp.asarray(rng.standard_normal((n, c)).astype(np.float32))
    ref = jax.jit(lambda f: F.to_brick(fm, f))(feats)
    old = F.BRICK_GATHER
    try:
        F.BRICK_GATHER = True
        got = jax.jit(lambda f: F.to_brick(fm, f))(feats)
    finally:
        F.BRICK_GATHER = old
    # compare everything except the (arbitrary, caller-sliced) dump row
    np.testing.assert_array_equal(np.asarray(got)[:p], np.asarray(ref)[:p])


def test_tap_group_matches_scan():
    """Tap-grouped accumulation (TAP_GROUP) must match the tap scan for
    every conv kernel, at every group size including non-divisors of 27
    (zero-padded taps).  Grouped f32 reductions change accumulation order,
    so the tolerance is f32-rounding-level."""
    from upcc_tpu.ops import family as F
    rng = np.random.default_rng(23)
    g, cin, cout = 1024, 16, 8
    nbr_idx = jnp.asarray(rng.integers(0, g, (g, 27)).astype(np.int32))
    nbr_ok = jnp.asarray(rng.random((g, 27)) < 0.8)
    brick = jnp.asarray(rng.standard_normal((g, 8, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((125, cin, cout)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((g, cin)).astype(np.float32))
    valid = jnp.ones((g,), bool)

    def runs():
        out = {}
        out["grand"] = jax.jit(lambda: F.grand_apply(
            (nbr_idx, nbr_ok), brick, w, 5, "transpose"))()
        out["transpose"] = jax.jit(lambda: F.family_transpose_up(
            (nbr_idx, nbr_ok), feats, valid, w, 5))()
        fm = F.FamilyMap(parent_keys=jnp.arange(g, dtype=jnp.int64) * 8,
                         point_parent=jnp.arange(g, dtype=jnp.int32),
                         point_slot=jnp.zeros((g,), jnp.int32),
                         nbr_idx=nbr_idx, nbr_ok=nbr_ok)
        out["conv"] = jax.jit(lambda: F.family_conv(
            fm, feats, valid, w, 5))()
        out["down"] = jax.jit(lambda: F.family_down_conv(
            fm, feats, valid, w, 5))()
        return out

    ref = runs()
    old = F.TAP_GROUP
    try:
        for grp in (3, 4, 9):  # 27 % 4 != 0 exercises the tap padding
            F.TAP_GROUP = grp
            got = runs()
            for k in ref:
                np.testing.assert_allclose(
                    np.asarray(got[k]), np.asarray(ref[k]),
                    rtol=1e-4, atol=1e-4, err_msg=f"{k} group={grp}")
    finally:
        F.TAP_GROUP = old
