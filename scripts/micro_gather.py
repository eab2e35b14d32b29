"""Microbenchmarks that decide the windowed-gather kernel design.

A) XLA HBM row-gather rate vs row width K.  Reps are chained through a
   data dependency (idx perturbed by the previous result) because the
   tunnel backend can serve repeated identical executions from cache —
   naive loops measure dispatch, not work.
B) Pallas `tpu.dynamic_gather` throughput on a VMEM-resident tile — the
   core primitive of the planned windowed tap-conv kernel.  Mosaic
   requires index bitwidth == data bitwidth: f32 data pairs with i32
   indices, bf16 data with i16 indices.

Run on the real chip with training paused (tunnel timing).
"""
import sys, time
sys.path.insert(0, "/root/repo")  # NOT via PYTHONPATH (breaks axon plugin)
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T0 = time.time()
def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


def timed_chained(step, idx0, *args, reps=10):
    """step(idx, *args) -> (new_idx, out); chains idx through reps."""
    idx = step(idx0, *args)[0]
    jax.block_until_ready(idx)
    t0 = time.time()
    for _ in range(reps):
        idx, out = step(idx, *args)
    jax.block_until_ready(idx)
    return (time.time() - t0) / reps


# ---------------------------------------------------------------- A: XLA
def xla_gather_bench():
    rng = np.random.default_rng(0)
    R = 1 << 20
    for K in (8, 32, 128, 512):
        tbl = jnp.asarray(rng.standard_normal((R, K)).astype(np.float32)
                          ).astype(jnp.bfloat16)

        @jax.jit
        def step(idx, tbl):
            y = tbl[idx]                       # [R, K] gather
            s = y.sum(axis=1)                  # [R]
            # new idx depends on the gathered data -> no exec caching
            nidx = (idx + (s.astype(jnp.int32) & 1)) % R
            return nidx, s[0]

        idx0 = jnp.asarray(rng.integers(0, R, (R,)).astype(np.int32))
        dt = timed_chained(step, idx0, tbl)
        log(f"XLA random row gather K={K:5d}: {dt*1e3:7.2f} ms  "
            f"{R/dt/1e6:8.1f} M rows/s  {R*K*2/dt/1e9:7.1f} GB/s")

    # near-diagonal indices (the real conv pattern), K=128
    K = 128
    tbl = jnp.asarray(rng.standard_normal((R, K)).astype(np.float32)
                      ).astype(jnp.bfloat16)

    @jax.jit
    def step_nd(idx, tbl):
        y = tbl[idx]
        s = y.sum(axis=1)
        nidx = jnp.clip(idx + (s.astype(jnp.int32) & 1), 0, R - 1)
        return nidx, s[0]

    d = rng.integers(-1024, 1024, (R,))
    idx0 = jnp.asarray(np.clip(np.arange(R) + d, 0, R - 1).astype(np.int32))
    dt = timed_chained(step_nd, idx0, tbl)
    log(f"XLA near-diag gather  K={K:5d}: {dt*1e3:7.2f} ms  "
        f"{R/dt/1e6:8.1f} M rows/s  {R*K*2/dt/1e9:7.1f} GB/s")


# ------------------------------------------------------------- B: Pallas
def make_pallas_tapconv(R, K, KOUT, TAPS, TILE, dtype):
    """Per row tile: TAPS in-VMEM row gathers + matmuls (indices local to
    the tile — halo logic omitted; this measures the primitive)."""
    idt = jnp.int16 if dtype == jnp.bfloat16 else jnp.int32

    def kernel(x_ref, idx_ref, w_ref, o_ref):
        acc = jnp.zeros((TILE, KOUT), jnp.float32)
        for k in range(TAPS):
            ids = jnp.broadcast_to(
                idx_ref[:, k].astype(idt)[:, None], (TILE, K))
            g = jnp.take_along_axis(x_ref[:], ids, axis=0)
            acc += jax.lax.dot_general(
                g, w_ref[k], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[:] = acc

    return pl.pallas_call(
        kernel,
        grid=(R // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, TAPS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TAPS, K, KOUT), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, KOUT), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, KOUT), jnp.float32),
    )


def pallas_gather_bench():
    rng = np.random.default_rng(1)
    R, K, KOUT, TAPS, TILE = 1 << 19, 128, 128, 27, 2048
    w = jnp.asarray(rng.standard_normal((TAPS, K, KOUT)).astype(np.float32))
    loc = rng.integers(0, TILE, (R, TAPS)).astype(np.int32)

    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.standard_normal((R, K)).astype(np.float32)
                        ).astype(dtype)
        wd = w.astype(dtype)
        f = jax.jit(make_pallas_tapconv(R, K, KOUT, TAPS, TILE, dtype))

        @jax.jit
        def step(idx, x, wd, f=f):
            out = f(x, idx, wd)
            nidx = (idx + (out[0, 0].astype(jnp.int32) & 1)) % TILE
            return nidx, out

        try:
            dt = timed_chained(step, jnp.asarray(loc), x, wd)
        except Exception as e:
            log(f"Pallas {dtype.__name__}: FAILED {type(e).__name__}: "
                f"{str(e)[:200]}")
            continue
        ng = R * TAPS
        ideal_mm = 2 * R * TAPS * K * KOUT / 394e12
        log(f"Pallas VMEM gather+mm {dtype.__name__}: {dt*1e3:7.2f} ms  "
            f"{ng/dt/1e9:6.2f} G rows/s  (MXU floor {ideal_mm*1e3:.2f} ms)")

    # XLA same-compute reference (tiled, indices local to tile)
    x = jnp.asarray(rng.standard_normal((R, K)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)

    @jax.jit
    def xla_ref_step(idx, x, w):
        xr = x.reshape(R // TILE, TILE, K)
        ir = idx.reshape(R // TILE, TILE, TAPS)

        def body(c, inp):
            xt, it = inp
            acc = jnp.zeros((TILE, KOUT), jnp.float32)
            for k in range(TAPS):
                g = jnp.take_along_axis(
                    xt, jnp.broadcast_to(it[:, k][:, None], (TILE, K)), 0)
                acc += jax.lax.dot_general(
                    g, w[k], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            return c, acc

        _, out = jax.lax.scan(body, 0, (xr, ir))
        nidx = (idx + (out[0, 0, 0].astype(jnp.int32) & 1)) % TILE
        return nidx, out

    dt = timed_chained(xla_ref_step, jnp.asarray(loc), x, wb)
    log(f"XLA tiled same-compute bf16: {dt*1e3:7.2f} ms  "
        f"{R*TAPS/dt/1e9:6.2f} G rows/s")


if __name__ == "__main__":
    log("devices:", jax.devices())
    xla_gather_bench()
    pallas_gather_bench()
