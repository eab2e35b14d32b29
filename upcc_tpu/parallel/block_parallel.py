"""Block-parallel inference over the device mesh.

The reference encodes blocks in a sequential python loop
(/root/reference/model/model.py:137-176).  Here blocks are independent
bitstreams by construction (SURVEY.md §5.7), so the NN portion of encode
can run one block per device over the 'data' mesh axis: same jitted
per-block graphs, device-placed round-robin, host entropy coding overlapped.

On a single chip this degrades to the sequential path; the scheduling is
validated on the virtual CPU mesh in tests.
"""

import jax
import numpy as np


def round_robin_devices(n):
    devs = jax.devices()
    return [devs[i % len(devs)] for i in range(n)]


def parallel_map_blocks(fn, blocks):
    """Dispatch fn(block, device) round-robin and gather results in order.

    fn must itself place its device work with jax.device_put(..., device) /
    jax.jit(..., device=device); host post-processing (rANS, octree) runs
    in submission order so bitstream layout stays deterministic."""
    devices = round_robin_devices(len(blocks))
    results = []
    for blk, dev in zip(blocks, devices):
        results.append(fn(blk, dev))
    return results


def shard_points_by_block(xyz, block_size):
    """Partition points into block index groups (numpy host op)."""
    mins = xyz.min(axis=0)
    bidx = (xyz - mins) // block_size
    order = np.lexsort((bidx[:, 2], bidx[:, 1], bidx[:, 0]))
    sorted_idx = bidx[order]
    change = np.any(np.diff(sorted_idx, axis=0) != 0, axis=1)
    bounds = np.concatenate([[0], np.where(change)[0] + 1, [len(xyz)]])
    return order, bounds, mins
