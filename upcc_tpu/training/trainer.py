"""Training driver: config -> folders -> train/val loop -> checkpoints.

Parity target: /root/reference/train.py:43-367.
  * results/<experiment>/{config.yaml, ckpts/, weights.msgpack, val.csv}
  * two optimizer groups (main vs bottleneck quantiles), StepLR schedule,
    grad clipping, per-step random quality q
  * auto-resume from the newest checkpoint (train.py:141-151)
  * every `val_every` epochs, validation runs the *real* codec
    (compress -> bitstream bytes -> decompress) at the four corner
    qualities and logs bpp/PSNR metrics to val.csv (train.py:244-311)

TPU-native: one jitted train step, auto-upgraded to the shard_map
data-parallel variant (parallel/data_parallel.py) when the local mesh has
more than one device — each device consumes one full collated batch and
gradients pmean over ICI (disable with ``data_parallel: false``); orbax
checkpoints (host-resident, so single-device resume works regardless of the
mesh that wrote them); host-side data pipeline feeding fixed-capacity flat
batches.
"""

import csv
import json
import os
import shutil
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
import yaml

from ..data.dataset import StaticDataset, collate_cubes
from ..data.q_func import QFunc
from ..data.transform import build_transforms
from ..models.unified import UnifiedModel, host_root_maps
from ..ops.sparse import SparseTensor, from_points_host, voxelize_host_np
from .loss import Loss
from .train_step import TrainState, make_optimizer, make_train_step

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def make_lr_schedule(config, steps_per_epoch):
    """StepLR: lr * gamma^(epoch // step_size) (reference train.py:77-79)."""
    base = config.get("model_learning_rate", 1e-4)
    step_size = config.get("scheduler_step_size", 150) * steps_per_epoch
    gamma = config.get("scheduler_gamma", 0.1)
    return lambda step: base * gamma ** (step // step_size)


class Training:
    def __init__(self, config_path, capacity="auto", max_steps_per_epoch=None):
        with open(config_path) as f:
            self.config = yaml.safe_load(f)
        cfg = self.config
        self.experiment = cfg.get("experiment_name", "exp")
        self.results_dir = os.path.join(cfg.get("results_path", "./results"),
                                        self.experiment)
        self.ckpt_dir = os.path.join(self.results_dir, "ckpts")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        shutil.copy(config_path, os.path.join(self.results_dir, "config.yaml"))

        self.batch_size = cfg.get("batch_size", 8)
        self.capacity = capacity
        self.epochs = cfg.get("epochs", 300)
        self.val_every = cfg.get("val_every", 10)
        self.max_steps_per_epoch = max_steps_per_epoch

        mcfg = dict(cfg["model"])
        mcfg["max_batch"] = self.batch_size
        self.model = UnifiedModel(mcfg)
        self.loss_obj = Loss(cfg["loss"], max_batch=self.batch_size)
        self.q_func = QFunc(cfg["q_map"])

        transforms = build_transforms(cfg.get("transforms", {}).get("train"))
        data_path = cfg.get("data_path")
        self.train_ds = StaticDataset(
            data_path, "train", min_points=cfg.get("min_points_train", 0),
            transforms=transforms) if data_path else None
        self.val_ds = StaticDataset(
            data_path, "val", min_points=cfg.get("min_points_test", 0)) \
            if data_path else None

        if self.capacity == "auto":
            # static batch capacity from the dataset's real cube sizes
            # (padded work scales ~linearly with capacity)
            if self.train_ds is not None and len(self.train_ds):
                counts = np.diff(self.train_ds.offsets)[self.train_ds.indices]
                # the greedy packer takes at most batch_size cubes, so the
                # typical batch fills ~batch_size*mean points — sizing for
                # the worst-case batch (batch_size *largest* cubes together)
                # made >90% of every step padding.  Cover any single cube
                # (nothing is ever dropped) plus a typical batch with slack.
                need = int(max(1.1 * counts.max(),
                               1.3 * self.batch_size * counts.mean()))
                self.capacity = max(1024, 1 << int(np.ceil(np.log2(need))))
            else:
                self.capacity = 65536
            print(f"auto capacity: {self.capacity}")

        self._init_state()

    # ------------------------------------------------------------------

    def _init_state(self):
        cfg = self.config
        rng = np.random.default_rng(0)
        from ..data.synthetic import batch_of_cubes
        b, x, c = batch_of_cubes(rng, self.batch_size, extent=32, n_per=500,
                                 capacity=self.capacity)
        st = from_points_host(b, x, c, capacity=self.capacity)
        q = jnp.full((self.batch_size, 2), 0.5, jnp.float32)
        lam = jnp.ones((self.batch_size, 2), jnp.float32)
        params = jax.jit(self.model.init)(
            {"params": jax.random.PRNGKey(cfg.get("seed", 0)),
             "noise": jax.random.PRNGKey(1)}, st, q, lam)["params"]
        steps_per_epoch = max(1, (len(self.train_ds) if self.train_ds else 1000)
                              // self.batch_size)
        lr = make_lr_schedule(cfg, steps_per_epoch)
        self.optimizer = make_optimizer(cfg, lr_schedule=lr)
        self.state = TrainState(params, self.optimizer.init(params),
                                jnp.zeros((), jnp.int32))
        self.step_fn = jax.jit(make_train_step(self.model, self.loss_obj,
                                               self.optimizer))
        # data parallelism over the local mesh (SURVEY §5.8): each device
        # consumes one full collated batch, gradients pmean over ICI, one
        # optimizer update per device group.  `data_parallel: false` forces
        # the sequential path; "auto" (default) uses all local devices.
        dp_cfg = cfg.get("data_parallel", "auto")
        n_dev = jax.device_count()
        self.n_dp = n_dev if dp_cfg in ("auto", True) and n_dev > 1 else 1
        if self.n_dp > 1:
            from ..parallel.data_parallel import make_dp_train_step, make_mesh
            self.dp_mesh = make_mesh(self.n_dp)
            self.dp_step_fn = make_dp_train_step(
                self.model, self.loss_obj, self.optimizer, self.dp_mesh,
                with_root_nbrs=True)
            print(f"data-parallel training over {self.n_dp} devices "
                  f"(global batch {self.n_dp * self.batch_size} cubes)")
        self.start_epoch = 0
        self._maybe_resume()

    # ---- checkpointing (reference train.py:314-349) -------------------

    def _ckptr(self):
        return ocp.PyTreeCheckpointer()

    def save_checkpoint(self, epoch):
        # multi-host: only process 0 touches the shared results dir
        from ..parallel.multihost import is_primary
        if not is_primary():
            return
        path = os.path.join(os.path.abspath(self.ckpt_dir), f"ckpt_{epoch:03d}")
        # device_get keeps the checkpoint layout mesh-independent: a run on
        # an 8-device mesh writes the same host arrays a 1-device run does
        payload = {"params": jax.device_get(self.state.params),
                   "opt_state": jax.device_get(self.state.opt_state),
                   "step": jax.device_get(self.state.step), "epoch": epoch}
        if _HAS_ORBAX:
            self._ckptr().save(path, payload, force=True)
        else:  # msgpack fallback
            import flax.serialization as ser
            with open(path + ".msgpack", "wb") as f:
                f.write(ser.to_bytes(payload))
        # rolling weights-only export (reference train.py:171-175)
        import flax.serialization as ser
        wpath = os.path.join(self.results_dir, "weights.msgpack")
        with open(wpath, "wb") as f:
            f.write(ser.to_bytes(self.state.params))
        # sidecar: lets load_codec arbitrate f32-vs-bf16 staleness by
        # recorded step instead of fragile mtimes (ADVICE r2 follow-up)
        with open(wpath + ".meta.json", "w") as f:
            json.dump({"epoch": epoch, "step": int(self.state.step)}, f)
        # committable half-size snapshot (survives host restarts; weights_io)
        from ..utils.weights_io import save_compact
        snap = os.path.join(self.results_dir, "weights_bf16.msgpack")
        save_compact(self.state.params, snap)
        # sidecar so a warm start after full-checkpoint loss resumes the
        # LR schedule at the right point (see _maybe_resume fallback)
        with open(snap + ".meta.json", "w") as f:
            json.dump({"epoch": epoch, "step": int(self.state.step)}, f)
        self._prune_checkpoints(epoch)

    def _prune_checkpoints(self, epoch, keep_last=3):
        """Bound checkpoint disk: keep the newest `keep_last` plus every
        val_every-th epoch (resume always uses the newest, so pruning never
        breaks it).  ~190 MB/epoch at flagship scale without this."""
        import shutil
        every = int(self.config.get("val_every", 10))
        entries = sorted(e for e in os.listdir(self.ckpt_dir)
                         if e.startswith("ckpt_"))
        for e in entries[:-keep_last] if keep_last else entries:
            try:
                ep = int(e.split("_")[1].split(".")[0])
            except (IndexError, ValueError):
                continue
            if every > 0 and ep % every == 0:
                continue
            p = os.path.join(self.ckpt_dir, e)
            shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)

    def _maybe_resume(self):
        entries = sorted(e for e in os.listdir(self.ckpt_dir)
                         if e.startswith("ckpt_")) \
            if os.path.isdir(self.ckpt_dir) else []
        if not entries:
            self._maybe_warm_start()
            return
        latest = os.path.join(os.path.abspath(self.ckpt_dir), entries[-1])
        if _HAS_ORBAX and os.path.isdir(latest):
            target = {"params": self.state.params,
                      "opt_state": self.state.opt_state,
                      "step": self.state.step, "epoch": 0}
            payload = self._ckptr().restore(latest, item=target)
        else:
            import flax.serialization as ser
            target = {"params": self.state.params,
                      "opt_state": self.state.opt_state,
                      "step": self.state.step, "epoch": 0}
            with open(latest, "rb") as f:
                payload = ser.from_bytes(target, f.read())
        self.state = TrainState(payload["params"], payload["opt_state"],
                                payload["step"])
        self.start_epoch = int(payload["epoch"]) + 1
        print(f"resumed from {latest} at epoch {self.start_epoch}")

    def _maybe_warm_start(self):
        """Fallback resume when all full checkpoints were lost (host
        restart wipes the gitignored ckpts/ tree): restore params from the
        committed bf16 snapshot, re-init optimizer moments, and fast-forward
        every scalar-int count leaf of the fresh opt state so the StepLR
        schedule (and Adam bias correction) continue from the right step
        rather than restarting the warm-up-rate regime."""
        snap = os.path.join(self.results_dir, "weights_bf16.msgpack")
        if not os.path.isfile(snap):
            return
        from ..utils.weights_io import load_params
        params = load_params(self.state.params, snap)
        meta_path = snap + ".meta.json"
        if os.path.isfile(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            epoch, step = int(meta["epoch"]), int(meta["step"])
        else:  # legacy snapshot without sidecar: infer from the val trail
            epoch, step = 0, 0
            val_csv = os.path.join(self.results_dir, "val.csv")
            if os.path.isfile(val_csv):
                with open(val_csv) as f:
                    rows = [r for r in f.read().splitlines()[1:] if r]
                if rows:
                    epoch = max(int(r.split(",")[0]) for r in rows) + 1
            steps_per_epoch = max(1, (len(self.train_ds) if self.train_ds
                                      else 1000) // self.batch_size)
            step = epoch * steps_per_epoch

        opt_state = self.optimizer.init(params)
        stepa = jnp.asarray(step, jnp.int32)

        # Fast-forward ONLY the LR-schedule counts.  Adam's own count must
        # stay 0: its bias correction assumes the count matches the moment
        # accumulators, and a fast-forwarded count with zeroed moments makes
        # the first ~1k updates ~3x too large (observed as a diverging loss
        # on the epoch-100 warm restart).
        def ff(node):
            if isinstance(node, optax.ScaleByScheduleState):
                return optax.ScaleByScheduleState(count=stepa)
            if isinstance(node, (list, tuple)) and hasattr(node, "_fields"):
                return type(node)(*(ff(v) for v in node))
            if isinstance(node, tuple):
                return tuple(ff(v) for v in node)
            if isinstance(node, dict):
                return {kk: ff(v) for kk, v in node.items()}
            return node

        opt_state = ff(opt_state)
        self.state = TrainState(params, opt_state, stepa)
        self.start_epoch = epoch + 1 if os.path.isfile(meta_path) else epoch
        print(f"warm-started from {snap} at epoch {self.start_epoch} "
              f"(step {step}; fresh optimizer moments)")

    # ---- loops ---------------------------------------------------------

    # capacity ladder for size-bucketed batching: ~1.3x-geometric steps keep
    # within-bucket padding low while only ~9 step graphs ever compile
    _CAP_LADDER = (8192, 12288, 16384, 24576, 32768, 49152, 65536, 98304,
                   131072)

    def _batches(self, rng):
        """Greedy capacity packing: walk the shuffled order, taking up to
        batch_size cubes while they fit in the static point capacity, so no
        points are dropped (the reference's torch loader handles variable
        sizes natively; with static shapes the capacity is the budget).

        With ``batch_bucketing: true`` the shuffled order is additionally
        sorted within windows of 8*batch_size cubes so batches are
        size-homogeneous, and each batch is padded only to the smallest
        ladder capacity that covers it instead of the global worst case.
        jax.jit retraces the step once per distinct capacity; on the
        committed synthetic_128 set this cuts padded device work to 0.63x
        of flat-capacity batching (measured by packing simulation) with
        identical cube membership per epoch."""
        ds = self.train_ds
        sizes = np.diff(ds.offsets)[ds.indices]
        order = rng.permutation(len(ds))
        bucketing = bool(self.config.get("batch_bucketing", False))
        if bucketing:
            w = 8 * self.batch_size
            order = np.concatenate([
                win[np.argsort(sizes[win], kind="stable")]
                for win in np.array_split(order, max(1, len(order) // w))])
        i = 0
        while i < len(order):
            items, total = [], 0
            while (i < len(order) and len(items) < self.batch_size
                   and (not items or total + sizes[order[i]] <= self.capacity)):
                items.append(ds[order[i]])
                total += sizes[order[i]]
                i += 1
            cap = self.capacity
            if bucketing:
                cap = next((c for c in self._CAP_LADDER
                            if total <= c <= self.capacity), self.capacity)
            yield collate_cubes(items, cap, rng)

    def _seq_step(self, batch, kq, kn):
        """One single-device update on a collated batch.

        Voxelize once on the host and reuse the keys for the root neighbor
        maps (a device binary search at these caps costs more than the whole
        rest of the forward — TPU_NOTES.md).  len(b) is the batch's own
        capacity (the ladder bucket when batch_bucketing is on) — padding
        back to the global cap here would undo the bucketing entirely."""
        b, x, c = batch
        keys_np, feats_np = voxelize_host_np(b, x, c, len(b))
        st = SparseTensor(keys=jnp.asarray(keys_np),
                          feats=jnp.asarray(feats_np), stride=1)
        root_nbrs = host_root_maps(keys_np, self.config["model"])
        q, lam = self.q_func.sample(kq, self.batch_size)
        self.state, metrics = self.step_fn(self.state, st, q, lam, kn,
                                           root_nbrs)
        return metrics

    def _dp_group_arrays(self, group, kq, kn):
        """Stack a group of collated batches along a leading device axis.

        All shards are re-voxelized at the group's max ladder capacity so
        the stacked arrays are rectangular; each shard draws its own quality
        pair (the reference samples one scalar q per step, train.py:215 —
        per-shard q is the DP generalization) and its own noise key.

        Multi-host: only THIS process's rows of the device axis are
        voxelized (parallel.data_parallel.local_dp_rows), so host-side prep
        cost divides across hosts; q/lam/rng are sampled for the full group
        first and then sliced, keeping every shard's draw independent of
        the process count.  Returns local-row arrays — the caller assembles
        the global batch with shard_batch_from_local."""
        from ..parallel.data_parallel import local_dp_rows
        lo, hi = local_dp_rows(self.dp_mesh)
        cap = max(len(b) for b, _, _ in group)
        keys_l, feats_l, nbrs_l = [], [], []
        for b, x, c in group[lo:hi]:
            kk, ff = voxelize_host_np(b, x, c, cap)
            keys_l.append(kk)
            feats_l.append(ff)
            nbrs_l.append(host_root_maps(kk, self.config["model"]))
        keys = np.stack(keys_l)
        feats = np.stack(feats_l)
        nbrs = jax.tree.map(lambda *a: jnp.stack(a), *nbrs_l)
        qs, lams = [], []
        for kqd in jax.random.split(kq, len(group)):
            qd, ld = self.q_func.sample(kqd, self.batch_size)
            qs.append(qd)
            lams.append(ld)
        rngs = jax.random.split(kn, len(group))
        return (keys, feats, jnp.stack(qs[lo:hi]), jnp.stack(lams[lo:hi]),
                rngs[lo:hi], nbrs)

    # Bounded dispatch lookahead: metrics are fetched one step late, so the
    # host prepares batch k+1 (getitem/transforms/voxelize/root maps) and
    # pays the tunnel round-trip while the device still runs step k.  Depth
    # 2 bounds the queued step inputs living in HBM.
    _PIPELINE_DEPTH = 2

    def train_epoch(self, epoch):
        from collections import deque
        rng = np.random.default_rng(epoch)
        key = jax.random.PRNGKey(epoch)
        losses = []
        pending = deque()

        def push(metrics):
            pending.append(metrics)
            if len(pending) >= self._PIPELINE_DEPTH:
                losses.append(float(pending.popleft()["loss"]))

        t0 = time.time()
        gen = self._batches(rng)
        if self.n_dp > 1:
            import itertools

            from ..parallel.data_parallel import shard_batch_from_local
            step = 0
            while True:
                if self.max_steps_per_epoch and step >= self.max_steps_per_epoch:
                    break
                group = list(itertools.islice(gen, self.n_dp))
                if not group:
                    break
                key, kq, kn = jax.random.split(key, 3)
                if len(group) == self.n_dp:
                    local = self._dp_group_arrays(group, kq, kn)
                    keys, feats, q, lam, rngs, nbrs = shard_batch_from_local(
                        self.dp_mesh, local)
                    self.state, metrics = self.dp_step_fn(
                        self.state, keys, feats, q, lam, rngs, nbrs)
                    push(metrics)
                else:
                    # trailing remainder (< n_dp batches): sequential updates
                    # so no cube is ever dropped or double-counted
                    for batch, (kqd, knd) in zip(group, zip(
                            jax.random.split(kq, len(group)),
                            jax.random.split(kn, len(group)))):
                        push(self._seq_step(batch, kqd, knd))
                step += 1
        else:
            for step, batch in enumerate(gen):
                if self.max_steps_per_epoch and step >= self.max_steps_per_epoch:
                    break
                key, kq, kn = jax.random.split(key, 3)
                push(self._seq_step(batch, kq, kn))
        while pending:
            losses.append(float(pending.popleft()["loss"]))
        return {"loss": float(np.mean(losses)) if losses else float("nan"),
                "time": time.time() - t0}

    def val_epoch(self, epoch):
        """Full-codec validation at the four corner qualities
        (reference train.py:244-311)."""
        from ..parallel.multihost import is_primary
        if not is_primary():
            # host-side effects (renders, val.csv) and the expensive
            # full-codec sweep run once, on process 0; params are
            # replicated so every host would compute identical rows
            return []
        from ..codec import Codec
        from ..eval.metrics import pc_metrics
        codec = Codec(self.model, self.state.params)
        codec.update()
        render_dir = os.path.join(self.results_dir, "renders_val")
        rows = []
        max_items = self.config.get("val_max_items", None)
        n_val = len(self.val_ds) if self.val_ds else 0
        if max_items is not None:
            n_val = min(n_val, int(max_items))
        for i in range(n_val):
            xyz, rgb = self.val_ds[i]
            pc = np.concatenate([xyz.astype(np.float32), rgb], axis=1)
            res = float(xyz.max()) or 1.0
            for qg, qa in [(0, 0), (0, 1), (1, 0), (1, 1)]:
                data = codec.compress(pc, q=(qg, qa), block_size=1024)
                rec = codec.decompress(data)
                m = pc_metrics(pc, rec, resolution=res, with_d2=False)
                rows.append({"epoch": epoch, "item": i, "q_g": qg, "q_a": qa,
                             "bpp": len(data) * 8 / len(pc),
                             "sym_y_psnr": m["sym_y_psnr"],
                             "sym_psnr_mse": m["sym_psnr_mse"]})
                if i == 0 and qg == qa:
                    # qualitative renders (reference train.py:279-293)
                    from ..eval.render import render_pointcloud
                    render_pointcloud(rec, path_prefix=os.path.join(
                        render_dir, f"ep{epoch:03d}_q{qg}{qa}"))
        if rows:
            path = os.path.join(self.results_dir, "val.csv")
            write_header = not os.path.exists(path)
            with open(path, "a", newline="") as f:
                w = csv.DictWriter(f, fieldnames=list(rows[0]))
                if write_header:
                    w.writeheader()
                w.writerows(rows)
        return rows

    def train(self):
        for epoch in range(self.start_epoch, self.epochs):
            m = self.train_epoch(epoch)
            print(f"epoch {epoch}: loss {m['loss']:.3f} ({m['time']:.0f}s)")
            if self.val_ds and self.val_every and (epoch + 1) % self.val_every == 0:
                self.val_epoch(epoch)
            self.save_checkpoint(epoch)
