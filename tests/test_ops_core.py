import numpy as np
import pytest

import upcc_tpu  # noqa: F401  (enables x64)
import jax
import jax.numpy as jnp

from upcc_tpu.ops import coords as C
from upcc_tpu.ops import (SparseTensor, from_points, features_at, downsample_keys,
                          upsample_children_keys, expand_region_keys,
                          apply_sparse_conv, topk_mask, prune)
from functools import partial

# eager dispatch compiles op-by-op and is slow; jit everything once
from_points = partial(jax.jit, static_argnames=("capacity", "stride", "dedup"))(from_points)
features_at = jax.jit(features_at)
downsample_keys = jax.jit(downsample_keys, static_argnames=("capacity",))
upsample_children_keys = jax.jit(upsample_children_keys)
topk_mask = jax.jit(topk_mask)
prune = jax.jit(prune, static_argnames=("capacity",))
def apply_sparse_conv_j(st, out_keys, w, b, offs, mode, out_stride):
    fn = jax.jit(lambda st, ok, w: apply_sparse_conv(st, ok, w, b, offs, mode, out_stride))
    return fn(st, out_keys, w)


def expand_region_keys_j(keys, offs, capacity):
    return jax.jit(lambda k: expand_region_keys(k, offs, capacity))(keys)



def rand_cloud(rng, n, extent=64, batches=2):
    xyz = rng.integers(0, extent, size=(n, 3)).astype(np.int32)
    b = rng.integers(0, batches, size=(n,)).astype(np.int32)
    f = rng.standard_normal((n, 4)).astype(np.float32)
    return b, xyz, f


def test_morton_roundtrip():
    rng = np.random.default_rng(0)
    u = rng.integers(0, 1 << C.COORD_BITS, size=(1000, 3))
    code = C.morton_encode(jnp.asarray(u))
    back = C.morton_decode(code)
    np.testing.assert_array_equal(np.asarray(back), u)


def test_morton_order_matches_octree():
    # morton(2u+d) == morton(u)*8 + morton(d)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.integers(0, 1 << (C.COORD_BITS - 1), size=(100, 3)))
    for d in [(0, 0, 0), (1, 0, 1), (1, 1, 1)]:
        child = C.morton_encode(2 * u + jnp.asarray(d))
        expect = (C.morton_encode(u) << 3) | int(C.morton_encode(jnp.asarray(d)))
        np.testing.assert_array_equal(np.asarray(child), np.asarray(expect))


def test_from_points_sorted_dedup():
    rng = np.random.default_rng(2)
    b, xyz, f = rand_cloud(rng, 500, extent=16)
    st = from_points(jnp.asarray(b), jnp.asarray(xyz), jnp.asarray(f), capacity=600)
    keys = np.asarray(st.keys)
    assert (np.diff(keys.astype(np.uint64).view(np.int64)) >= 0).all()
    v = np.asarray(st.valid)
    uniq = {(int(bb), *map(int, p)) for bb, p in zip(b, xyz)}
    assert v.sum() == len(uniq)
    # padding slots at the tail, zero feats
    assert not v[-1] or v.sum() == 600
    np.testing.assert_array_equal(np.asarray(st.feats)[~v], 0.0)


def test_features_at():
    rng = np.random.default_rng(3)
    b, xyz, f = rand_cloud(rng, 200, extent=32, batches=1)
    st = from_points(jnp.asarray(b), jnp.asarray(xyz), jnp.asarray(f), capacity=256)
    # query the valid keys themselves -> must return their own features
    got = features_at(st, st.keys)
    np.testing.assert_allclose(np.asarray(got), np.asarray(st.feats), rtol=1e-6)
    # absent key -> zeros
    q = C.make_keys(jnp.asarray([0]), jnp.asarray([[63, 63, 63]]) + 100)
    assert np.asarray(features_at(st, q)).sum() == 0.0


def test_downsample_upsample_keys():
    rng = np.random.default_rng(4)
    b, xyz, f = rand_cloud(rng, 300, extent=64)
    st = from_points(jnp.asarray(b), jnp.asarray(xyz), jnp.asarray(f), capacity=400)
    down = downsample_keys(st.keys)
    dv = np.asarray(C.key_is_valid(down))
    expect = {(int(bb), *(int(c) // 2 for c in p)) for bb, p in zip(b, xyz)}
    assert dv.sum() == len(expect)
    # children of downsampled cover the originals
    children = upsample_children_keys(down)
    ch = set(np.asarray(children)[np.asarray(C.key_is_valid(children))].tolist())
    orig = set(np.asarray(st.keys)[np.asarray(st.valid)].tolist())
    assert orig.issubset(ch)
    # children sorted
    cn = np.asarray(children)
    assert (np.diff(cn) >= 0).all()


def test_expand_region_keys():
    rng = np.random.default_rng(5)
    b, xyz, f = rand_cloud(rng, 50, extent=16, batches=1)
    st = from_points(jnp.asarray(b), jnp.asarray(xyz), jnp.asarray(f), capacity=64)
    offs = C.kernel_offsets(5)
    out = expand_region_keys_j(st.keys, offs, capacity=64 * 125)
    ov = np.asarray(C.key_is_valid(out))
    got = set(np.asarray(out)[ov].tolist())
    # vectorized expectation: all (2p + d) combos in one key computation
    q = (2 * xyz[:, None, :] + offs[None, :, :]).reshape(-1, 3)
    bb = np.repeat(b, offs.shape[0])
    ok = (q >= 0).all(1) & (q < (1 << C.COORD_BITS)).all(1)
    keys = np.asarray(C.make_keys(jnp.asarray(bb[ok]), jnp.asarray(q[ok])))
    expect = set(keys.tolist())
    assert got == expect
    assert (np.diff(np.asarray(out)) >= 0).all()


def dense_conv3d_ref(vol, w, offsets, stride_mode):
    """Dense numpy reference: vol [X,Y,Z,Cin], w [K,Cin,Cout]."""
    X, Y, Z, Cin = vol.shape
    Cout = w.shape[-1]
    occ = np.abs(vol).sum(-1) > 0
    out = {}
    if stride_mode == "same":
        out_pts = np.argwhere(occ)
        scale = 1
    elif stride_mode == "down":
        out_pts = np.unique(np.argwhere(occ) // 2, axis=0)
        scale = 2
    for p in out_pts:
        acc = np.zeros(Cout, np.float32)
        for k, d in enumerate(offsets):
            q = p * scale + d
            if (q >= 0).all() and q[0] < X and q[1] < Y and q[2] < Z and occ[tuple(q)]:
                acc += vol[tuple(q)] @ w[k]
        out[tuple(p)] = acc
    return out


@pytest.mark.parametrize("mode,ks", [("same", 3), ("same", 5), ("down", 3), ("down", 5)])
def test_sparse_conv_vs_dense(mode, ks):
    rng = np.random.default_rng(6)
    n, ext, cin, cout = 80, 12, 5, 7
    xyz = rng.integers(0, ext, size=(n, 3)).astype(np.int32)
    xyz = np.unique(xyz, axis=0)
    f = rng.standard_normal((xyz.shape[0], cin)).astype(np.float32)
    b = np.zeros(xyz.shape[0], np.int32)
    st = from_points(jnp.asarray(b), jnp.asarray(xyz), jnp.asarray(f), capacity=xyz.shape[0] + 10)

    offs = C.kernel_offsets(ks)
    w = rng.standard_normal((offs.shape[0], cin, cout)).astype(np.float32) * 0.1

    vol = np.zeros((ext, ext, ext, cin), np.float32)
    for p, ff in zip(xyz, f):
        vol[tuple(p)] = ff
    ref = dense_conv3d_ref(vol, w, offs, mode)

    if mode == "same":
        out_keys, out_stride = st.keys, 1
    else:
        out_keys, out_stride = downsample_keys(st.keys), 2

    out = apply_sparse_conv_j(st, out_keys, jnp.asarray(w), None, offs, mode, out_stride)
    ov = np.asarray(out.valid)
    units = np.asarray(out.units)[ov]
    feats = np.asarray(out.feats)[ov]
    assert len(units) == len(ref)
    for p, ff in zip(units, feats):
        np.testing.assert_allclose(ff, ref[tuple(p)], rtol=1e-4, atol=1e-4)


def test_generative_transpose_vs_dense():
    """'up' mode: out = expand(region) of in; out[v] = sum_d in[(v-d)/2] W[d]."""
    rng = np.random.default_rng(7)
    n, ext, cin, cout = 40, 8, 3, 4
    xyz = np.unique(rng.integers(0, ext, size=(n, 3)).astype(np.int32), axis=0)
    f = rng.standard_normal((xyz.shape[0], cin)).astype(np.float32)
    b = np.zeros(xyz.shape[0], np.int32)
    # raw coords are 2*units at stride 2
    st = from_points(jnp.asarray(b), jnp.asarray(xyz * 2), jnp.asarray(f),
                     capacity=xyz.shape[0], stride=2)

    offs = C.kernel_offsets(2)  # 8 children
    w = rng.standard_normal((offs.shape[0], cin, cout)).astype(np.float32) * 0.3
    out_keys = upsample_children_keys(st.keys)
    out = apply_sparse_conv_j(st, out_keys, jnp.asarray(w), None, offs, "up", 1)

    in_map = {tuple(p): ff for p, ff in zip(xyz, f)}
    ov = np.asarray(out.valid)
    for p, ff in zip(np.asarray(out.units)[ov], np.asarray(out.feats)[ov]):
        acc = np.zeros(cout, np.float32)
        for k, d in enumerate(offs):
            q = p - d
            if (q >= 0).all() and (q % 2 == 0).all():
                src = in_map.get(tuple(q // 2))
                if src is not None:
                    acc += src @ w[k]
        np.testing.assert_allclose(ff, acc, rtol=1e-4, atol=1e-4)


def test_topk_prune():
    rng = np.random.default_rng(8)
    b, xyz, f = rand_cloud(rng, 300, extent=32, batches=3)
    st = from_points(jnp.asarray(b), jnp.asarray(xyz), jnp.asarray(f), capacity=400)
    logits = jnp.asarray(rng.standard_normal(400).astype(np.float32))
    k = jnp.asarray([10, 25, 7], jnp.int32)
    keep = topk_mask(st, logits, k)
    kn = np.asarray(keep)
    bn = np.asarray(st.batch)
    v = np.asarray(st.valid)
    ln = np.asarray(logits)
    for bi in range(3):
        sel = kn & v & (bn == bi)
        pool = v & (bn == bi)
        kk = min(int(k[bi]), pool.sum())
        assert sel.sum() == kk
        # selected are exactly the top-k logits of this batch
        thresh = np.sort(ln[pool])[::-1][kk - 1]
        assert (ln[sel] >= thresh).all()
    pruned = prune(st, keep, capacity=64)
    assert np.asarray(pruned.valid).sum() == int(kn.sum())
    assert (np.diff(np.asarray(pruned.keys)) >= 0).all()


def test_counts_per_batch():
    rng = np.random.default_rng(9)
    b, xyz, f = rand_cloud(rng, 200, extent=32, batches=4)
    st = from_points(jnp.asarray(b), jnp.asarray(xyz), jnp.asarray(f), capacity=256)
    counts = np.asarray(st.counts_per_batch(4))
    uniq = {}
    for bb, p in zip(b, xyz):
        uniq.setdefault(int(bb), set()).add(tuple(p))
    for bi in range(4):
        assert counts[bi] == len(uniq.get(bi, set()))


def test_topk_exactness_stress():
    """Radix-select top-k equals numpy's partition semantics across many
    shapes, including ties, k=0, k>count, and multi-batch."""
    rng = np.random.default_rng(42)
    for trial in range(5):
        b, xyz, f = rand_cloud(rng, 300, extent=20, batches=4)
        st = from_points(jnp.asarray(b), jnp.asarray(xyz), jnp.asarray(f),
                         capacity=512)
        logits = rng.standard_normal(512).astype(np.float32)
        logits[::7] = logits[0]  # inject ties
        k = jnp.asarray(rng.integers(0, 120, 4), jnp.int32)
        keep = np.asarray(topk_mask(st, jnp.asarray(logits), k))
        v = np.asarray(st.valid)
        bn = np.asarray(st.batch)
        for bi in range(4):
            pool = v & (bn == bi)
            kk = min(int(k[bi]), int(pool.sum()))
            sel = keep & pool
            assert sel.sum() == kk, f"trial {trial} batch {bi}"
            if kk:
                thresh = np.sort(logits[pool])[::-1][kk - 1]
                assert (logits[sel] >= thresh).all()
        assert not (keep & ~v).any()


def test_cumsum_i32_matches_numpy():
    from upcc_tpu.ops.scan import cumsum_i32
    rng = np.random.default_rng(3)
    for n in [1, 100, 4096, 4097, 70000, 300001]:
        x = rng.integers(0, 3, size=(n,)).astype(np.int32)
        got = np.asarray(jax.jit(cumsum_i32)(jnp.asarray(x)))
        np.testing.assert_array_equal(got, np.cumsum(x).astype(np.int32))
    b = rng.random(50000) < 0.3
    got = np.asarray(jax.jit(cumsum_i32)(jnp.asarray(b)))
    np.testing.assert_array_equal(got, np.cumsum(b).astype(np.int32))


def test_compact_gather_semantics():
    from upcc_tpu.ops.sparse import compact
    rng = np.random.default_rng(7)
    n = 9000
    keys = np.sort(rng.choice(1 << 30, size=n, replace=False)).astype(np.int64)
    keep = rng.random(n) < 0.2
    feats = rng.standard_normal((n, 5)).astype(np.float32)
    aux = rng.integers(0, 100, size=(n,)).astype(np.int32)
    jc = jax.jit(compact, static_argnames=("out_capacity",))
    for cap in [None, n, 1024, int(keep.sum())]:
        k2, f2, a2 = jc(jnp.asarray(keys), jnp.asarray(keep),
                        jnp.asarray(feats), jnp.asarray(aux),
                        out_capacity=cap)
        m = n if cap is None else cap
        kk = keys[keep][:m]
        assert k2.shape == (m,)
        np.testing.assert_array_equal(np.asarray(k2)[:len(kk)], kk)
        assert np.all(np.asarray(k2)[len(kk):] == np.iinfo(np.int64).max)
        np.testing.assert_array_equal(np.asarray(f2)[:len(kk)], feats[keep][:m])
        assert np.all(np.asarray(f2)[len(kk):] == 0)
        np.testing.assert_array_equal(np.asarray(a2)[:len(kk)], aux[keep][:m])
        assert np.all(np.asarray(a2)[len(kk):] == 0)


def test_host_downsample_levels_match_device():
    """The codec's host downsample chain (exact-cap sizing) must be
    bit-identical to the device downsample_keys chain."""
    from upcc_tpu.codec.codec import _host_downsample_levels
    from upcc_tpu.ops import coords as C
    from upcc_tpu.ops.sparse import downsample_keys
    rng = np.random.default_rng(21)
    units = rng.integers(0, 64, (4000, 3)).astype(np.int64)
    batch = rng.integers(0, 3, 4000).astype(np.int64)
    keys = np.unique((batch << C.BATCH_SHIFT)
                     | np.asarray(C.morton_encode_np(units)))
    cap = 4096
    arr = np.full(cap, np.iinfo(np.int64).max, np.int64)
    arr[:len(keys)] = keys
    host = _host_downsample_levels(arr, 3)
    dk = jnp.asarray(arr)
    for lvl in host:
        dk = jax.jit(downsample_keys, static_argnames="capacity")(
            dk, capacity=cap)
        got = np.asarray(dk)
        got = got[got != np.iinfo(np.int64).max]
        np.testing.assert_array_equal(got, lvl)
