import time, numpy as np, jax, jax.numpy as jnp
import upcc_tpu
from upcc_tpu.ops import family as F
T0=time.time()
def log(*a): print(f"[{time.time()-T0:6.1f}s]", *a, flush=True)

G = 131072
rng = np.random.default_rng(0)
nbr_idx = jnp.asarray(rng.integers(0, G, (G, 27)).astype(np.int32))
nbr_ok = jnp.asarray(rng.random((G, 27)) < 0.9)

def timeit(f, *args, reps=5):
    o = f(*args); jax.block_until_ready(o)
    ts = []
    for _ in range(reps):
        t=time.time(); o = f(*args); jax.block_until_ready(o)
        _ = float(jnp.asarray(o).ravel()[0])
        ts.append(time.time()-t)
    return min(ts)

def grand_scan(g_nbr, brick, w, ks, mode):
    return F.grand_apply(g_nbr, brick, w, ks, mode)

def grand_unroll(g_nbr, brick, w, ks, mode, dt=jnp.bfloat16):
    ni, ok = g_nbr
    g = ni.shape[0]
    n_in, n_out = F._GRAND_SLOTS[mode]
    cin = brick.shape[-1]; cout = w.shape[-1]
    wexp = F.grand_expand_weights(w, ks, mode, dt)
    flat = brick.reshape(g, n_in * cin).astype(dt)
    # zero dump row: fold validity into the index instead of a mask multiply
    flatp = jnp.concatenate([flat, jnp.zeros((1, flat.shape[1]), dt)], 0)
    idx = jnp.where(ok, ni, g)
    acc = None
    for e in range(27):
        nb = flatp[idx[:, e]]
        d = jnp.dot(nb, wexp[e], preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    return acc.reshape(g, n_out, cout)

for (mode, ks, cin, cout, tag) in [("transpose",5,128,32,"t lvl2"),
                                   ("conv",3,32,16,"c1 lvl2"),
                                   ("conv",3,16,1,"c2 lvl2")]:
    n_in, n_out = F._GRAND_SLOTS[mode]
    brick = jnp.asarray(rng.standard_normal((G, n_in, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((ks**3, cin, cout)).astype(np.float32)*0.1)
    t=time.time()
    f1 = jax.jit(lambda b, w: grand_scan((nbr_idx, nbr_ok), b, w, ks, mode))
    s = timeit(f1, brick, w); log(f"{tag} scan9 : {s*1e3:7.1f} ms (compile {time.time()-t-s*6:.0f}s)")
    t=time.time()
    f2 = jax.jit(lambda b, w: grand_unroll((nbr_idx, nbr_ok), b, w, ks, mode))
    u = timeit(f2, brick, w); log(f"{tag} unroll: {u*1e3:7.1f} ms (compile {time.time()-t-u*6:.0f}s)")

# family_conv shapes (lvl1 head c1: P=131072, 8 slots, 128->64)
from upcc_tpu.ops.family import _expanded_weights
def fam_unroll(ni, ok, flat, wexp):
    g = ni.shape[0]
    flatp = jnp.concatenate([flat, jnp.zeros((1, flat.shape[1]), flat.dtype)], 0)
    idx = jnp.where(ok, ni, g)
    acc = None
    for e in range(27):
        nb = flatp[idx[:, e]]
        d = jnp.dot(nb, wexp[e], preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    return acc
P = 131072
for cin, cout, tag in [(128, 64, "fam c1 lvl1"), (128,128,"fam transpose-ish")]:
    flat = jnp.asarray(rng.standard_normal((P, 8*cin)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((27, cin, cout)).astype(np.float32)*0.1)
    wexp = _expanded_weights(w, 3).astype(jnp.bfloat16)
    def scan_ver(flat, wexp):
        def step(acc, inp):
            ni, ok, wk = inp
            nb = flat[jnp.minimum(ni, P-1)] * ok[:, None].astype(flat.dtype)
            return acc + jnp.dot(nb, wk, preferred_element_type=jnp.float32), None
        acc0 = jnp.zeros((P, 8*cout), jnp.float32)
        acc, _ = jax.lax.scan(step, acc0, (nbr_idx.T, nbr_ok.T, wexp), unroll=9)
        return acc
    t=time.time(); f1 = jax.jit(scan_ver); s = timeit(f1, flat, wexp)
    log(f"{tag} scan9 : {s*1e3:7.1f} ms (compile {time.time()-t-s*6:.0f}s)")
    t=time.time(); f2 = jax.jit(lambda fl, we: fam_unroll(nbr_idx, nbr_ok, fl, we))
    u = timeit(f2, flat, wexp)
    log(f"{tag} unroll: {u*1e3:7.1f} ms (compile {time.time()-t-u*6:.0f}s)")
