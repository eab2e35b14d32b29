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


def make_dp_train_step(model, loss_obj, optimizer, mesh, aux_weight=1.0):
    """Returns a jitted step over per-device batches.

    Inputs carry a leading device axis D == mesh size:
      keys  int64[D, N], feats f32[D, N, C], q/lam f32[D, B, 2],
      rngs  PRNG keys [D].
    """

    def local_loss(params, keys, feats, q, lam, rng):
        x = SparseTensor(keys=keys, feats=feats, stride=1)
        with F.conv_remat():
            out = model.apply({"params": params}, x, q, lam, training=True,
                              rngs={"noise": rng})
        main, parts = loss_obj(x, out)
        aux = model.apply({"params": params}, method=model.aux_loss)
        return main + aux_weight * aux, {**parts, "aux_loss": aux}

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P("data"), P("data"), P("data"), P("data"), P("data")),
             out_specs=(P(), P()),
             check_vma=False)
    def grad_shard(params, keys, feats, q, lam, rng):
        (total, parts), grads = jax.value_and_grad(local_loss, has_aux=True)(
            params, keys[0], feats[0], q[0], lam[0], rng[0])
        grads = jax.lax.pmean(grads, "data")
        metrics = jax.lax.pmean({"loss": total, **parts}, "data")
        return grads, metrics

    @jax.jit
    def step(state: TrainState, keys, feats, q, lam, rngs):
        grads, metrics = grad_shard(state.params, keys, feats, q, lam, rngs)
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
