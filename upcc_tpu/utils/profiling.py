"""Profiling hooks: JAX device traces + stage timers.

The reference has only wall-clock timing around compress/decompress
(/root/reference/utils.py:453-465, SURVEY.md §5.1).  Here:
  * Codec.profile=True gives per-stage wall times (codec/codec.py);
  * device_trace() wraps jax.profiler for a TensorBoard-compatible trace;
  * StageTimer accumulates named sections with means/CIs for CSV export.
"""

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def device_trace(log_dir="/tmp/upcc_trace"):
    import jax
    with jax.profiler.trace(log_dir):
        yield
    print(f"device trace written to {log_dir}")


class StageTimer:
    def __init__(self):
        self.samples = {}

    @contextlib.contextmanager
    def section(self, name):
        t0 = time.time()
        yield
        self.samples.setdefault(name, []).append(time.time() - t0)

    def summary(self):
        out = {}
        for name, vals in self.samples.items():
            v = np.asarray(vals)
            ci = 1.96 * v.std() / max(np.sqrt(len(v)), 1)
            out[name] = {"mean_s": float(v.mean()), "ci95_s": float(ci),
                         "n": len(v)}
        return out
