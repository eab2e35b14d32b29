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
