import time, numpy as np, jax, jax.numpy as jnp
import upcc_tpu
from upcc_tpu.ops import family as F
from upcc_tpu.ops import coords as C
from upcc_tpu.ops.sparse import from_points_host, upsample_children_keys, compact
from upcc_tpu.ops.topk import topk_mask
from upcc_tpu.ops.conv import init_conv_weights
from upcc_tpu.data.synthetic import surface_cloud
T0=time.time()
def log(*a): print(f"[{time.time()-T0:6.1f}s]", *a, flush=True)

def bench(name, f, *args, reps=3):
    r = f(*args); float(jax.tree_util.tree_leaves(r)[0].ravel()[0].astype(jnp.float32))
    t0=time.time()
    for _ in range(reps):
        r = f(*args); float(jax.tree_util.tree_leaves(r)[0].ravel()[0].astype(jnp.float32))
    log(f"{name}: {(time.time()-t0)/reps*1000:.0f} ms")

rng = np.random.default_rng(0)
# input-level set: 760k in 1M cap (analysis finest)
xyz, _ = surface_cloud(rng, extent=1024, n_target=760_000)
N = 1048576
st = from_points_host(np.zeros(len(xyz), np.int32), xyz, np.zeros((len(xyz),4),np.float32), capacity=N)

# 1. pyramid alone (analysis structure)
caps = [N//2, N//4, N//8, N//8]
bench("pyramid 1M (skip finest)", jax.jit(lambda k: F.pyramid(k, caps, skip_finest_nbr=True)[1]["nbr"][0].sum()), st.keys)

# pieces of pyramid
bench("parents_of 1M", jax.jit(lambda k: F.parents_of(k, N//2)[0].sum().astype(jnp.float32)), st.keys)
pk, pp, sl = jax.jit(lambda k: F.parents_of(k, N//2))(st.keys)
nbr_root = jax.jit(lambda k: F.root_neighbors(k))
pk2 = jax.jit(lambda k: F.parents_of(k, N//4)[0])(pk)
bench("root_neighbors 256k-cap", lambda k: nbr_root(k)[0].sum(), pk2)
nbr2 = nbr_root(pk2)
pk_, pp_, sl_ = jax.jit(lambda k: F.parents_of(k, N//4))(pk)
bench("derive 512k-cap", jax.jit(lambda k, pp, sl, ni, no: F.derive_self_neighbors(k, pp, sl, (ni, no))[0].sum()), pk, pp_, sl_, nbr2[0], nbr2[1])

# 2. g_s level-3-like: parents 262144 (k1 bucket), 2M candidates, 128->32ch
P3 = 262144
xyz2, _ = surface_cloud(rng, extent=512, n_target=190_000)
stp = from_points_host(np.zeros(len(xyz2), np.int32), xyz2*2, rng.standard_normal((len(xyz2),128)).astype(np.float32), capacity=P3, stride=2)
nbrP = jax.jit(F.root_neighbors)(stp.keys)
w5, _ = init_conv_weights(jax.random.PRNGKey(0), 5, 128, 32)
bench("transpose5 262k->2M", jax.jit(lambda nbr_i, nbr_o, f, v, w: F.family_transpose_up((nbr_i, nbr_o), f, v, w, 5).sum()), nbrP[0], nbrP[1], stp.feats, stp.valid, w5)

ck = jax.jit(upsample_children_keys)(stp.keys)
cf_pp = jnp.arange(8*P3, dtype=jnp.int32) >> 3
cf_sl = jnp.arange(8*P3, dtype=jnp.int32) & 7
cfeats = jax.jit(lambda nbr_i, nbr_o, f, v, w: F.family_transpose_up((nbr_i, nbr_o), f, v, w, 5))(nbrP[0], nbrP[1], stp.feats, stp.valid, w5)
cvalid = jax.jit(C.key_is_valid)(ck)
w3, _ = init_conv_weights(jax.random.PRNGKey(1), 3, 32, 16)
def headconv(ni, no, f, v, w):
    fm = F.FamilyMap(parent_keys=stp.keys, point_parent=cf_pp, point_slot=cf_sl, nbr_idx=ni, nbr_ok=no)
    return F.family_conv(fm, f, v, w, 3, out_keys_valid=v).sum()
bench("head conv3 2M cand 32->16", jax.jit(headconv), nbrP[0], nbrP[1], cfeats, cvalid, w3)

# topk at 2M
from upcc_tpu.ops.sparse import SparseTensor
cand = SparseTensor(keys=ck, feats=cfeats, stride=1)
logits = jnp.asarray(rng.standard_normal(8*P3).astype(np.float32))
kk = jnp.asarray([700000]+[0]*7, jnp.int32)
bench("topk 2M", jax.jit(lambda c, l, k: topk_mask(c, l, k).sum().astype(jnp.float32)), cand, logits, kk)
keep = jax.jit(topk_mask)(cand, logits, kk)
bench("compact 2M x32ch", jax.jit(lambda k, kp, f, p, s: compact(k, kp, f, p, s)[0].sum().astype(jnp.float32)), ck, keep, cfeats, cf_pp, cf_sl)
bench("derive 2M from 262k", jax.jit(lambda k, pp, sl, ni, no: F.derive_self_neighbors(k, pp, sl, (ni, no))[0].sum()), ck, cf_pp, cf_sl, nbrP[0], nbrP[1])
