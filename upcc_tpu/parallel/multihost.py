"""Optional multi-host (DCN) scaling hooks (SURVEY.md §5.8's last clause).

The reference is single-GPU with no distributed backend; this repo's data
parallelism (data_parallel.py) already spans every device jax knows about,
so multi-host scaling only needs (a) the jax.distributed runtime to be
initialized so jax.devices() is global across hosts, and (b) host-side
side effects (checkpoints, CSVs, prints) gated to process 0.

On a single host everything here is a no-op: initialize() skips when no
coordinator is configured, and is_primary() is True.

Host-side batch prep is sharded: each process voxelizes only the DP rows
its local devices own (data_parallel.local_dp_rows) and the global batch
is assembled with jax.make_array_from_process_local_data
(data_parallel.shard_batch_from_local), so prep cost divides across
hosts.  Multi-process execution is untestable on this single-host image;
the single-process path is exercised by the DP equivalence tests and the
row-slicing logic by tests/test_parallel.py.
"""

import os

import jax

_initialized = False


def initialize(coordinator=None, num_processes=None, process_id=None):
    """Initialize jax.distributed when multi-host coordinates are known.

    Resolution order: explicit args, then the standard JAX env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, also
    set by TPU pod runtimes).  Returns True if the distributed runtime is
    (now) initialized, False for the single-host no-op.  Must run before
    any jax device use in the process.
    """
    global _initialized
    if _initialized:
        return True
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coordinator and num_processes is None:
        # single-host: nothing to do (the common local/dev path)
        return False
    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    elif os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    elif os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    _initialized = True
    return True


def is_primary():
    """True on the process that should write checkpoints/CSVs/logs."""
    return jax.process_index() == 0
