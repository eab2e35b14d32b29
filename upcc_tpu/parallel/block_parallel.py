"""Block-parallel inference over the device mesh.

The reference encodes blocks in a sequential python loop
(/root/reference/model/model.py:137-176).  Here blocks are independent
bitstreams by construction (SURVEY.md §5.7) and already ride batched
device passes in groups of up to 63 (codec/codec.py).  This module runs
*groups* concurrently across devices: one worker thread per device, each
pinning its group's device arrays to its device (jit dispatch follows the
committed inputs), so NN passes execute in parallel while each worker's
host entropy coding (rANS/octree) overlaps the others' device time.
Results are returned in submission order, so the bitstream layout is
identical to the sequential path — asserted by
tests/test_parallel.py::test_block_parallel_bitstream_equality.

On a single chip this degrades to the sequential path.
"""

from concurrent.futures import ThreadPoolExecutor

import jax
import numpy as np


def round_robin_devices(n, devices=None):
    devs = devices or jax.devices()
    return [devs[i % len(devs)] for i in range(n)]


def parallel_map_blocks(fn, blocks, devices=None):
    """Run fn(block, device) for each block, one worker thread per device,
    blocks assigned round-robin.  Returns results in block order.

    fn receives the device and must place its device work there (the codec
    does this by jax.device_put-ing the group inputs; jit executes on the
    committed input device).  Host-side work inside fn (numpy, native
    coders) runs inside the worker and overlaps other workers' device
    time — the GIL is released during device waits and native calls."""
    devs = round_robin_devices(len(blocks), devices)
    n_workers = len(set(devs))
    if n_workers <= 1 or len(blocks) <= 1:
        return [fn(blk, dev) for blk, dev in zip(blocks, devs)]
    with ThreadPoolExecutor(max_workers=n_workers) as pool:
        futures = [pool.submit(fn, blk, dev)
                   for blk, dev in zip(blocks, devs)]
        return [f.result() for f in futures]


def shard_points_by_block(xyz, block_size):
    """Partition points into block index groups (numpy host op)."""
    mins = xyz.min(axis=0)
    bidx = (xyz - mins) // block_size
    order = np.lexsort((bidx[:, 2], bidx[:, 1], bidx[:, 0]))
    sorted_idx = bidx[order]
    change = np.any(np.diff(sorted_idx, axis=0) != 0, axis=1)
    bounds = np.concatenate([[0], np.where(change)[0] + 1, [len(xyz)]])
    return order, bounds, mins
