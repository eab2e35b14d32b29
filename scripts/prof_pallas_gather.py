"""Probe tpu.dynamic_gather (jnp.take_along_axis axis=0 in a Pallas kernel)
throughput vs the XLA row-gather it would replace.

The windowed-conv plan realizes each of the 27 tap gathers as a
take_along_axis over a [S, K] VMEM window (indices broadcast across K).
Whether that beats the HBM row gather depends entirely on how Mosaic
lowers sublane-axis dynamic_gather — measure, don't guess.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def timeit(f, *a, reps=20):
    f(*a)[0].block_until_ready() if isinstance(f(*a), tuple) else jax.block_until_ready(f(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    S, K = 4096, 512          # window rows, feature width
    T = 27
    ntiles = 16               # simulate 16 row tiles

    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.standard_normal((ntiles, S, K)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, S, (ntiles, T, S)), jnp.int32)

    # --- Pallas: per grid step, T take_along_axis gathers over the window.
    # Mosaic dynamic_gather needs matching data/index bitwidths: bf16+int16.
    def kern(idx_ref, win_ref, out_ref):
        w = win_ref[0]
        acc = jnp.zeros((S, K), dtype=jnp.float32)
        for k in range(T):
            ii = jnp.broadcast_to(idx_ref[0, k, :][:, None], (S, K))
            g = jnp.take_along_axis(w, ii, axis=0)
            acc = acc + g
        out_ref[0] = acc

    f = pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec((1, T, S), lambda t: (t, 0, 0)),
                  pl.BlockSpec((1, S, K), lambda t: (t, 0, 0))],
        out_specs=pl.BlockSpec((1, S, K), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((ntiles, S, K), jnp.float32),
    )
    fj = jax.jit(f)
    # correctness on one tile
    out = np.asarray(fj(idx, win), np.float32)
    refacc = np.zeros((S, K), np.float32)
    w0 = np.asarray(win[0], np.float32)
    for k in range(T):
        refacc += w0[np.asarray(idx[0, k])]
    err = np.abs(out[0] - refacc.astype(np.float32)).max() / (np.abs(refacc).max() + 1e-9)
    print("pallas dynamic_gather correctness rel err:", err)

    dt = timeit(fj, idx, win)
    rows = ntiles * T * S
    by = rows * K * 4
    print(f"pallas: {dt*1e3:.2f} ms, {rows/dt/1e6:.1f} M gathered rows/s, "
          f"{by/dt/1e9:.1f} GB/s gather payload")

    # --- XLA baseline: same total gather from one flat array in HBM
    flat = jnp.asarray(rng.standard_normal((ntiles * S, K)), jnp.float32)
    gidx = jnp.asarray(rng.integers(0, ntiles * S, (ntiles * T * S,)), jnp.int32)

    @jax.jit
    def xla_gather(flat, gidx):
        g = flat[gidx]
        return g.astype(jnp.float32).sum(0)

    dt2 = timeit(xla_gather, flat, gidx)
    print(f"xla HBM row-gather: {dt2*1e3:.2f} ms, {rows/dt2/1e6:.1f} M rows/s, "
          f"{by/dt2/1e9:.1f} GB/s payload")


if __name__ == "__main__":
    main()
