"""Data-parallel training over a jax.sharding Mesh.

New capability relative to the reference, which is single-GPU with no
distributed backend (SURVEY.md §5.8, /root/reference/train.py:56-57): cubes
are sharded over the 'data' mesh axis, each device runs the full model on
its local fixed-capacity SparseTensor shard, and gradients are pmean-ed over
ICI inside one jitted shard_map step.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import family as F
from ..ops.sparse import SparseTensor
from ..training.train_step import TrainState


def make_mesh(n_devices=None, axis="data"):
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(devs, (axis,))


def make_dp_train_step(model, loss_obj, optimizer, mesh, aux_weight=1.0,
                       with_root_nbrs=False):
    """Returns a jitted step over per-device batches.

    Inputs carry a leading device axis D == mesh size:
      keys  int64[D, N], feats f32[D, N, C], q/lam f32[D, B, 2],
      rngs  PRNG keys [D]; with ``with_root_nbrs`` also a pytree of
      host-precomputed root neighbor maps with the same leading axis
      (models.unified.host_root_maps, stacked per shard).
    """

    def local_loss(params, keys, feats, q, lam, rng, root_nbrs):
        x = SparseTensor(keys=keys, feats=feats, stride=1)
        with F.conv_remat():
            out = model.apply({"params": params}, x, q, lam, training=True,
                              root_nbrs=root_nbrs, rngs={"noise": rng})
        main, parts = loss_obj(x, out)
        aux = model.apply({"params": params}, method=model.aux_loss)
        return main + aux_weight * aux, {**parts, "aux_loss": aux}

    data_specs = (P("data"),) * (6 if with_root_nbrs else 5)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(),) + data_specs,
             out_specs=(P(), P()),
             check_vma=False)
    def grad_shard(params, keys, feats, q, lam, rng, root_nbrs=None):
        local_nbrs = (jax.tree.map(lambda a: a[0], root_nbrs)
                      if root_nbrs is not None else None)
        (total, parts), grads = jax.value_and_grad(local_loss, has_aux=True)(
            params, keys[0], feats[0], q[0], lam[0], rng[0], local_nbrs)
        grads = jax.lax.pmean(grads, "data")
        metrics = jax.lax.pmean({"loss": total, **parts}, "data")
        return grads, metrics

    @jax.jit
    def step(state: TrainState, keys, feats, q, lam, rngs, root_nbrs=None):
        args = (keys, feats, q, lam, rngs)
        if with_root_nbrs:
            args = args + (root_nbrs,)
        grads, metrics = grad_shard(state.params, *args)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return step


def shard_batch(mesh, keys, feats, q, lam, rngs):
    """Place per-device-stacked arrays with the leading axis on 'data'."""
    sh = NamedSharding(mesh, P("data"))
    return (jax.device_put(keys, sh), jax.device_put(feats, sh),
            jax.device_put(q, sh), jax.device_put(lam, sh),
            jax.device_put(rngs, sh))


def local_dp_rows(mesh, axis="data"):
    """This process's contiguous [lo, hi) rows of the 1-D data axis.

    Multi-host batch prep builds only these rows (each host voxelizes its
    own shards, so prep cost divides across hosts); single-host returns
    (0, n_dp).  Raises if this process's devices are not a contiguous
    block of the axis — make_array_from_process_local_data would then
    need per-shard assembly, which make_mesh's jax.devices() ordering
    never produces.
    """
    # index the named axis, not a flatten of the whole device grid — on a
    # multi-axis mesh the flat order would interleave other axes' devices
    # into the row ranges (ADVICE r4)
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh has no axis {axis!r}: {mesh.axis_names}")
    ax = mesh.axis_names.index(axis)
    grid = np.moveaxis(mesh.devices, ax, 0)
    if grid.size != grid.shape[0]:
        # rows of the data axis span other-axis device groups; a row is
        # "owned" by this process only if every device in it is local
        devs = [g.reshape(-1) for g in grid]
    else:
        devs = [[d] for d in grid.reshape(-1)]
    pid = jax.process_index()
    rows = [i for i, g in enumerate(devs)
            if all(d.process_index == pid for d in g)]
    if not rows:
        raise ValueError(f"process {pid} owns no devices on mesh axis {axis!r}")
    lo, hi = rows[0], rows[-1] + 1
    if rows != list(range(lo, hi)):
        raise ValueError(
            f"process {pid} devices are non-contiguous on axis {axis!r}: {rows}")
    return lo, hi


def shard_batch_from_local(mesh, tree, axis="data"):
    """Build globally DP-sharded arrays from this process's local rows.

    ``tree`` holds arrays whose leading axis is the LOCAL row count
    (hi - lo from local_dp_rows).  Single-process this is plain
    device_put; multi-process it assembles the global array from each
    host's rows without any host ever materializing the full batch.
    """
    import numpy as np
    sh = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.tree.map(lambda a: jax.device_put(a, sh), tree)
    return jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(sh, np.asarray(a)),
        tree)
