"""Probe the trained rate-control gain net: scale_nn(q) channel gains.

Reads a weights.msgpack (flax serialized params) directly — no jax, no
device — and prints the per-channel gain distribution over a q sweep.
Interpretation notes in TPU_NOTES.md (round 2, session 5): healthy
monotone rate control shows the mean gain rising with q; early training
shows per-channel selectivity (spread) before the mean moves.

Usage: python scripts/probe_gains.py [results/<exp>/weights.msgpack]
"""
import sys

import numpy as np
from flax import serialization


def softplus(x):
    return np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0.0)


def scale_nn(params, q):
    """Mirror models/layers.py::MLP (Dense/relu stack + final softplus)."""
    x = np.asarray(q, np.float32)
    i = 0
    while f"Dense_{i}" in params:
        d = params[f"Dense_{i}"]
        x = x @ np.asarray(d["kernel"]) + np.asarray(d["bias"])
        if f"Dense_{i+1}" in params:
            x = np.maximum(x, 0.0)
        i += 1
    return softplus(x)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "results/CVPR_inverse_scaling/weights.msgpack"
    with open(path, "rb") as f:
        params = serialization.msgpack_restore(f.read())
    sn = params["entropy_model"]["scale_nn"]
    print(f"{'q':>12} {'mean':>8} {'min':>8} {'max':>8} {'spread':>8}")
    for q in [(0, 0), (0.25, 0.25), (0.5, 0.5), (0.75, 0.75), (1, 1),
              (0, 1), (1, 0)]:
        g = scale_nn(sn, q)
        print(f"{str(q):>12} {g.mean():8.4f} {g.min():8.4f} {g.max():8.4f} "
              f"{g.max() - g.min():8.4f}")


if __name__ == "__main__":
    main()
