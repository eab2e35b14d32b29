"""2-D (data x model) sharded training via the XLA SPMD partitioner.

Complements the explicit shard_map data-parallel step (data_parallel.py)
with the annotate-and-let-XLA-partition recipe: build a 2-D device Mesh
("data", "model"), place the batch with its leading axis on "data" and
every large parameter matrix with its output-channel axis on "model", jit
the whole training step, and let the partitioner insert the collectives
(psum for the data-axis gradient reduction, all-gathers at the channel
boundaries of the sharded GEMMs).  Semantically this is *the same step* as
single-device training — sharding only changes placement — which the
equivalence test in tests/test_parallel.py asserts on the virtual CPU mesh.

New capability relative to the reference (single-GPU, SURVEY.md §5.8):
model-axis sharding bounds per-device weight memory (the flagship's conv
stacks are 125-tap [k^3, C, C] tensors), which is what permits scaling
C past one chip's HBM.
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


def make_mesh_2d(n_data, n_model, devices=None):
    devs = list(devices) if devices is not None else jax.devices()
    need = n_data * n_model
    if len(devs) < need:
        raise ValueError(f"need {need} devices, have {len(devs)}")
    arr = np.asarray(devs[:need]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def _leaf_spec(leaf, n_model):
    """Shard the trailing (output-channel) axis over 'model' when it
    divides evenly and a shard keeps at least 2 columns; replicate
    everything else (biases, quantiles, scalars)."""
    shape = getattr(leaf, "shape", ())
    if len(shape) >= 2 and shape[-1] % n_model == 0 \
            and shape[-1] >= 2 * n_model:
        return P(*([None] * (len(shape) - 1) + ["model"]))
    return P()


def shard_params(mesh, tree):
    """device_put every leaf of a params-like tree (params, optimizer
    moments, ...) with the model-axis rule above."""
    n_model = mesh.shape["model"]
    return jax.tree.map(
        lambda leaf: jax.device_put(
            leaf, NamedSharding(mesh, _leaf_spec(leaf, n_model))), tree)


def shard_state(mesh, state: TrainState) -> TrainState:
    return TrainState(shard_params(mesh, state.params),
                      shard_params(mesh, state.opt_state),
                      jax.device_put(state.step,
                                     NamedSharding(mesh, P())))


def shard_inputs(mesh, keys, feats, q, lam, rngs):
    """Leading axis = data shards (one fixed-capacity cube batch each)."""
    sh = NamedSharding(mesh, P("data"))
    return tuple(jax.device_put(a, sh) for a in (keys, feats, q, lam, rngs))


def make_sharded_train_step(model, loss_obj, optimizer, aux_weight=1.0):
    """Returns a jitted (state, keys, feats, q, lam, rngs) -> (state, metrics)
    step.  Inputs carry a leading data-shard axis D; params/opt_state carry
    NamedShardings placed by shard_state.  The same function is correct on
    any mesh (including a 1x1 mesh) — only placement changes."""

    def local_loss(params, keys, feats, q, lam, rng):
        x = SparseTensor(keys=keys, feats=feats, stride=1)
        with F.conv_remat():
            out = model.apply({"params": params}, x, q, lam, training=True,
                              rngs={"noise": rng})
        main, parts = loss_obj(x, out)
        aux = model.apply({"params": params}, method=model.aux_loss)
        return main + aux_weight * aux, {**parts, "aux_loss": aux}

    def batch_loss(params, keys, feats, q, lam, rngs):
        totals, parts = jax.vmap(local_loss, in_axes=(None, 0, 0, 0, 0, 0))(
            params, keys, feats, q, lam, rngs)
        return totals.mean(), jax.tree.map(lambda a: a.mean(0), parts)

    # NOTE: no donate_argnums — device_put may alias replicated leaves with
    # the caller's arrays, and donating aliased buffers deletes them under
    # the caller's feet.  Donation is a memory win only; re-add it with an
    # explicit copy if per-step buffer reuse ever matters.
    @jax.jit
    def step(state: TrainState, keys, feats, q, lam, rngs):
        (total, parts), grads = jax.value_and_grad(
            batch_loss, has_aux=True)(state.params, keys, feats, q, lam, rngs)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(params, opt_state, state.step + 1),
                {"loss": total, **parts})

    return step
