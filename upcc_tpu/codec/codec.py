"""Streaming point-cloud codec: host orchestration around jitted device graphs.

Parity target: ``UnifiedModel.compress/decompress``
(/root/reference/model/model.py:94-250): optional coordinate downscale,
block partitioning, per-block analysis -> entropy coding -> container, and
the inverse.  TPU-native structure:

  * all NN compute is in a handful of jitted graphs, cached per static
    capacity bucket (powers of two), so arbitrary frames reuse compilations;
  * **blocks are batched**: up to 63 blocks ride one device pass through
    the batch bits of the Morton keys (the reference loops python-side over
    blocks, model.py:137-176) — per-block streams stay independent, so the
    bitstream format is unchanged;
  * the encoder derives its Gaussian parameters through the *decoder's*
    graph, making encoder/decoder entropy parameters identical by
    construction (no Sorted*-style machinery needed);
  * coordinates are coded by the native octree codec, features by the native
    rANS coder — no subprocesses, no temp files;
  * transfers through the (33 MB/s) device tunnel are minimized: compact
    uploads (u8 batch + i32 morton + u8 colors), prefix-sliced symbol
    fetches, u8 scale indexes, i32+u8 outputs.
"""

import math
import threading

import jax
import jax.numpy as jnp
import numpy as np

from ..coding import occ as occ_coder
from ..coding import octree, rans
from ..models.entropy import gaussian
from ..models.entropy.bottleneck import build_cdf_tables
from ..models.unified import UnifiedModel
from ..ops import coords as C
from ..ops import family as F
from ..ops.sparse import SparseTensor
from . import bitstream, color_affine, color_resid, refine

MAX_GROUP = 63  # batch bits hold 6 bits; batch index 63 is reserved

# y symbols cross the host<->device tunnel as one int16 word per symbol:
# high byte = rANS table index (uint8, scale table < 256 entries), low
# byte = the symbol clipped to int8.  Symbols outside [-128, 127] are
# rare tail events; they travel in a fixed-capacity escape list and are
# spliced back in exactly on the other side.  ESC_CAP overflow falls
# back to the full-width int16 path (correctness never depends on the
# clip).  Halves the dominant per-frame transfer (fetch_y + y upload).
ESC_CAP = 4096


def splice_escapes(y8, esc_pos, esc_val):
    """Widen int8 symbols to int16 and splice the escape list back in.

    esc_pos holds flat indexes into y8 (fill slots point one past the
    end and are dropped); esc_val the true int16 symbol values."""
    flat = y8.astype(jnp.int16).ravel()
    flat = flat.at[esc_pos].set(esc_val, mode="drop")
    return flat.reshape(y8.shape)


def _bucket(n, lo=512):
    return max(lo, 1 << max(0, math.ceil(math.log2(max(n, 1)))))


# decode groups are bounded by output-point volume as well as block count:
# the reconstruct graph's HBM footprint scales with the group's summed
# final-level k (prune caps x 8-child expansions), and a 63-block vox11
# group (~1.2M pts at block 512) needs ~20 GB — past a v5e chip's 15.75 GB.
# A ~760k-pt group (the vox10 single-block path) compiles at a comfortable
# margin, so cap groups there; oversize single blocks still decode alone.
DEC_GROUP_PTS = 800_000
# encode groups get the same point cap (the batched analysis graph at 63
# blocks x ~1.2M pts needs ~20 GB; measured OOM on the all-64-block Owlii
# stand-ins).  Oversize single blocks still encode alone.
ENC_GROUP_PTS = 800_000
# the reconstruct graph's dominant buffer is the finest grand-layout
# stage's output, [bucket(sum k0), 64, N1/4] f32 — the 32-lane channel
# dim tiles to (8,128), a 4x padding blowup (family.py grand_apply).
# Measured boundary on one v5e: bucket(sum k0) = 2^17 (vox10 single
# group, k0 117k -> 4.3 GB) and 2^18 (the profiling frame's 15-block
# groups, k0 ~197k -> 8.6 GB) compile; 2^19 (the Owlii stand-ins'
# noisy geometry, k0/k2 ~0.41 -> ~330k per 800k-output group) OOMs at
# compile with a 16 GB buffer + 4 GB copy.  Cap the summed level-0 k at
# the 2^18 bucket boundary; keep a level-1 cap at its own known-good
# 2^19 boundary as a second guard (vox10 k1 377k stays single-group).
DEC_GROUP_L0 = 262_144
DEC_GROUP_L1 = 524_288


def _chunk_decode_groups(blocks):
    """Split a container's block list into device decode groups.

    Groups only runs of equal q (a group shares one q vector through the
    batched gain nets; mixing q would desync the rANS indexes), at most
    MAX_GROUP blocks, at most DEC_GROUP_PTS summed output points, and at
    most DEC_GROUP_L1 summed level-1 points (both HBM ceilings on the
    reconstruct graph)."""
    items = []
    cur, pts, l1, l0 = [], 0, 0, 0
    for b in blocks:
        bp = int(b["k"][-1])
        b1 = int(b["k"][1])
        b0 = int(b["k"][0])
        if cur and (cur[-1]["q"] != b["q"] or len(cur) == MAX_GROUP
                    or pts + bp > DEC_GROUP_PTS
                    or l1 + b1 > DEC_GROUP_L1
                    or l0 + b0 > DEC_GROUP_L0
                    or (cur[-1].get("occ_bytes") is None)
                    != (b.get("occ_bytes") is None)):
            items.append(cur)
            cur, pts, l1, l0 = [], 0, 0, 0
        cur.append(b)
        pts += bp
        l1 += b1
        l0 += b0
    if cur:
        items.append(cur)
    return items


def _host_downsample_levels(keys_np, n_levels):
    """Exact per-level octree downsamples (numpy, microseconds): returns the
    sorted valid key array of each level (batch bits preserved).

    The device pyramids' static capacities are sized from these so conv
    work tracks true occupancy instead of worst-case fractional caps —
    surfaces shrink ~4x per halving, so worst-case caps waste 4-10x.  The
    arrays are bit-identical to the device downsample chain (same
    shift+dedup rule, both stable-sorted)."""
    key_mask = (1 << C.BATCH_SHIFT) - 1
    sent = np.iinfo(np.int64).max
    m = np.asarray(keys_np)
    m = m[m != sent]
    out = []
    for _ in range(n_levels):
        m = np.unique((m & ~key_mask) | ((m & key_mask) >> 3))
        out.append(m)
    return out


def _z_hs_caps(n_s16, n_z):
    """Static caps shared bit-exactly by encoder and decoder: both derive
    them from the y key set (s16 downsample count) and the z count."""
    z_caps = (_bucket(n_s16), _bucket(n_z))
    hs_caps = (_bucket(8 * n_z), _bucket(64 * n_z))
    return z_caps, hs_caps


class Codec:
    def __init__(self, model, params, devices=None):
        self.model = model
        # codec-side twin with max_batch=64 so up to 63 blocks share one
        # device pass (parameters are independent of max_batch)
        mcfg = dict(model.config)
        mcfg["max_batch"] = 64
        self.cmodel = UnifiedModel(mcfg)
        self.params = params
        self.tables = None
        self._jits = {}
        self._jit_lock = threading.Lock()
        self.debug = False
        self.debug_info = []
        self.profile = False
        self.stage_times = {}
        # block-parallel inference: groups of blocks dispatch round-robin
        # over these devices (parallel/block_parallel.py); None = default
        # device only (single-chip sequential path)
        self.devices = list(devices) if devices else None
        self._params_dev = {}

    # -- device placement (block-parallel groups) ----------------------------

    def _dev(self, x, device):
        if device is None:
            return jnp.asarray(x)
        return jax.device_put(np.ascontiguousarray(x), device)

    def _params_for(self, device):
        if device is None:
            return self.params
        key = id(device)
        if key not in self._params_dev:
            with self._jit_lock:
                if key not in self._params_dev:
                    self._params_dev[key] = jax.device_put(self.params,
                                                           device)
        return self._params_dev[key]

    def _t(self, name, fn, *args):
        """Run a stage; when profiling, block and accumulate wall time."""
        if not self.profile:
            return fn(*args)
        import time
        t0 = time.time()
        out = fn(*args)
        # force completion with an 8-byte fetch (block_until_ready alone is
        # unreliable through the device tunnel)
        for leaf in jax.tree_util.tree_leaves(out):
            if isinstance(leaf, jax.Array):
                float(leaf.ravel()[0].astype(jnp.float32))
                break
        self.stage_times[name] = self.stage_times.get(name, 0.0) \
            + time.time() - t0
        return out

    # -- table freezing (reference model.update(), model.py:30-34) ----------

    def update(self):
        # one batched device->host transfer: the table builder evaluates the
        # learned density in numpy and would otherwise re-fetch each param
        # array per call through the (high-latency) device tunnel
        bn = jax.device_get(self.params["entropy_model"]["bottleneck"])
        ch = self.model.config["entropy_model"]["C_hyper_bottleneck"]
        self.tables = {
            "z": build_cdf_tables(bn, ch),
            "y": gaussian.build_cdf_tables(),
        }

    # -- cached jitted device graphs ----------------------------------------

    def _jit(self, name, builder):
        with self._jit_lock:
            if name not in self._jits:
                self._jits[name] = builder()
            return self._jits[name]

    def _rebucket(self, src_cap, dst_cap):
        def build():
            def fn(keys, feats):
                if dst_cap <= src_cap:
                    return keys[:dst_cap], feats[:dst_cap]
                pad = dst_cap - src_cap
                k = jnp.concatenate([keys, jnp.full((pad,), C.SENTINEL,
                                                    keys.dtype)])
                f = jnp.concatenate([feats, jnp.zeros((pad, feats.shape[1]),
                                                      feats.dtype)])
                return k, f
            return jax.jit(fn)
        return self._jit(("rebucket", src_cap, dst_cap), build)

    def _analyze(self, cap, level_caps):
        def build():
            def fn(params, batch_u8, morton_i32, colors_u8, rn_idx, rn_ok):
                keys = jnp.where(
                    morton_i32 >= 0,
                    (batch_u8.astype(jnp.int64) << C.BATCH_SHIFT)
                    | morton_i32.astype(jnp.int64), C.SENTINEL)
                feats = colors_u8.astype(jnp.float32) / 255.0
                x = SparseTensor(keys=keys, feats=feats, stride=1)
                return self.cmodel.apply({"params": params}, x,
                                         (rn_idx, rn_ok),
                                         level_caps,
                                         method=self.cmodel.ga_device)
            return jax.jit(fn)
        return self._jit(("analyze", cap, level_caps), build)

    def _hyper_analyze(self, ycap, z_caps):
        def build():
            def fn(params, y_keys, y_feats, rn_idx, rn_ok):
                return self.cmodel.apply({"params": params}, y_keys, y_feats,
                                         (rn_idx, rn_ok), z_caps,
                                         method=self.cmodel.hyper_analyze_device)
            return jax.jit(fn)
        return self._jit(("hyper", ycap, z_caps), build)

    def _params_graph(self, ycap, z_caps, hs_caps):
        def build():
            def fn(params, y_keys, z_sym, q, rn_idx, rn_ok):
                return self.cmodel.apply({"params": params}, y_keys, z_sym, q,
                                         (rn_idx, rn_ok), z_caps, hs_caps,
                                         method=self.cmodel.decode_params_device)
            return jax.jit(fn)
        return self._jit(("params", ycap, z_caps, hs_caps), build)

    def _symbols_graph(self, ycap):
        def build():
            def fn(params, y_feats, dec):
                y_sym = self.cmodel.apply(
                    {"params": params}, y_feats, dec,
                    method=self.cmodel.encode_symbols_device)
                clipped = jnp.clip(y_sym, -128, 127)
                packed = ((dec["indexes"].astype(jnp.int16) << 8)
                          | (clipped.astype(jnp.int16) & 0xFF))
                # escapes (|sym| > 127) are tail events; a cheap count
                # decides whether the host must refetch at full width —
                # a device-side escape *list* (nonzero compaction over
                # ycap*C elements) measured ~0.3 s/frame, far more than
                # the refetch it avoids.
                esc_n = (y_sym != clipped).sum(dtype=jnp.int32)
                return {"y_sym": y_sym, "packed": packed, "esc_n": esc_n}
            return jax.jit(fn)
        return self._jit(("symbols", ycap), build)

    def _reconstruct_graph(self, ycap, prune_caps, fmt="i8"):
        def build():
            def fn(params, y_keys, y_sym, dec, k, esc_pos=None, esc_val=None):
                if fmt == "i8":
                    # int8 upload + exact escape splice (see ESC_CAP note)
                    y_sym = splice_escapes(y_sym, esc_pos, esc_val)
                st = self.cmodel.apply({"params": params}, y_keys, y_sym, dec,
                                       k, prune_caps,
                                       method=self.cmodel.decode_reconstruct_device)
                # compact transfer format: u8 batch + i32 morton + u8 colors
                batch_u8 = jnp.where(st.valid, st.batch, 255).astype(jnp.uint8)
                m = (st.keys & ((jnp.int64(1) << C.BATCH_SHIFT) - 1))
                morton_i32 = jnp.where(st.valid, m, -1).astype(jnp.int32)
                colors8 = jnp.clip(jnp.round(st.feats * 255.0), 0, 255
                                   ).astype(jnp.uint8)
                return batch_u8, morton_i32, colors8
            return jax.jit(fn)
        return self._jit(("reconstruct", ycap, prune_caps, fmt), build)

    # -- coded-occupancy refinement graphs (lossless geometry) ---------------
    # Encoder and decoder MUST share these builders (same jit key -> same
    # HLO -> bit-identical logits/bins): a fused encoder-only variant would
    # round differently and desync the occupancy rANS streams.

    def _refine_graph(self, ycap, caps_prefix, nlv):
        """Stage ``nlv``: levels < nlv-1 select by the supplied keep masks,
        level nlv-1 emits uint8 context bins of its occupancy logits."""
        caps_prefix = tuple(caps_prefix)

        def build():
            def fn(params, y_keys, y_sym, dec, *ext_keep):
                caps = caps_prefix + (8,) * (3 - len(caps_prefix))
                logits = self.cmodel.apply(
                    {"params": params}, y_keys, y_sym, dec,
                    ext_keep=ext_keep, num_levels=nlv, prune_caps=caps,
                    method=self.cmodel.decode_refine_device)
                return refine.bin_logits(logits)
            return jax.jit(fn)
        return self._jit(("refine", ycap, caps_prefix, nlv), build)

    def _coded_final_graph(self, ycap, caps):
        """Final coded-mode pass: all three selections external, color head
        on the exact decoded voxel set; same compact transfer format as
        _reconstruct_graph."""
        caps = tuple(caps)

        def build():
            def fn(params, y_keys, y_sym, dec, keep0, keep1, keep2):
                st = self.cmodel.apply(
                    {"params": params}, y_keys, y_sym, dec,
                    ext_keep=(keep0, keep1, keep2), num_levels=3,
                    prune_caps=caps, emit_last_logits=False,
                    method=self.cmodel.decode_refine_device)
                batch_u8 = jnp.where(st.valid, st.batch, 255).astype(jnp.uint8)
                m = (st.keys & ((jnp.int64(1) << C.BATCH_SHIFT) - 1))
                morton_i32 = jnp.where(st.valid, m, -1).astype(jnp.int32)
                colors8 = jnp.clip(jnp.round(st.feats * 255.0), 0, 255
                                   ).astype(jnp.uint8)
                return batch_u8, morton_i32, colors8
            return jax.jit(fn)
        return self._jit(("coded_final", ycap, caps), build)

    def _occ_stages(self, params, device, y_keys_dev, y_sym_dev, dec, ycap,
                    parents0, g, get_bits):
        """Shared driver of the three staged occupancy passes.

        parents0: sorted valid y keys (numpy).  get_bits(lvl, occ_true,
        bins_np, block_slices) -> occupancy bool array: the encoder codes
        ``occ_true`` and returns it; the decoder ignores it and decodes
        from the streams.  Returns (keeps_dev, caps, parents_final)."""
        keeps_dev, caps = [], ()
        parents = parents0
        for lvl in range(3):
            cap_in = ycap if lvl == 0 else caps[-1]
            bins = self._t(
                f"occ.bins{lvl}", self._refine_graph(ycap, caps, lvl + 1),
                params, y_keys_dev, y_sym_dev, dec, *keeps_dev)
            bins_np = np.asarray(bins[:8 * len(parents)])
            pb = (parents >> refine.BATCH_SHIFT).astype(np.int32)
            counts = np.bincount(pb, minlength=g)[:g] * 8
            ofs = np.concatenate([[0], np.cumsum(counts)])
            slices = [slice(int(ofs[i]), int(ofs[i + 1])) for i in range(g)]
            occ = get_bits(lvl, parents, bins_np, slices)
            cand = refine.children_np(parents)
            sel = cand[occ]
            keep_pad = np.zeros(8 * cap_in, bool)
            keep_pad[:len(occ)] = occ
            keeps_dev.append(self._dev(keep_pad, device))
            caps = caps + (_bucket(len(sel)),)
            parents = sel
        return keeps_dev, caps, parents

    # -- encode --------------------------------------------------------------

    def compress(self, pointcloud, q, path=None, block_size=1024,
                 scaling_factor=1.0, geom="topk"):
        """pointcloud: numpy [N, 6] (xyz int, rgb in [0,1]). q: (q_g, q_a).

        Returns container bytes (or writes to path).

        geom: "topk" (default, the reference's lossy ranked selection) or
        "coded" — entropy-code every candidate's true occupancy bit with
        the learned logit as context (codec/refine.py): geometry decodes
        EXACTLY lossless at a rate cost equal to the heads' cross-entropy.

        block_size is capped at 1024 (vs the reference API's unchecked
        argument, model/model.py:94): block-local Morton codes ride the
        compact int32 device-upload format, which holds 3x10 coordinate
        bits.  The whole eval protocol uses 1024/512 (evaluate.py:43-46);
        larger inputs are covered by more blocks, or pre-scale with
        scaling_factor."""
        assert self.tables is not None, "call update() first"
        assert geom in ("topk", "coded"), geom
        # block-local morton codes must fit int32 for the compact upload
        # format (the reference's eval uses block sizes 1024/512 too,
        # evaluate.py:43-46)
        assert block_size <= 1024, "block_size > 1024 not supported"
        groups, levels = self._partition_blocks(pointcloud, block_size,
                                                scaling_factor)
        qv = np.asarray(q, np.float32).reshape(1, 2)
        results = self._map_groups(
            lambda item, dev: self._compress_group(item[0], item[1], qv,
                                                   levels, device=dev,
                                                   geom=geom),
            groups)
        blocks = [b for r in results for b in r]
        return bitstream.write_container(path, blocks, scaling_factor)

    def compress_multi(self, pointcloud, qs, block_size=1024,
                       scaling_factor=1.0, geom="topk"):
        """Multi-rate encode: one container per q in ``qs``, byte-identical
        to ``[compress(pointcloud, q) for q in qs]``.

        TPU-native serving addition (adaptive-streaming simulcast): the
        rate control q conditions only the gain/rescale nets *after* the
        analysis transform, so the analysis conv stack g_a, the
        hyper-encoder (z), the octree coordinate streams, and the z rANS
        streams are all q-independent and run ONCE; each extra operating
        point pays only the light parameter/symbol graphs plus its y rANS
        pass.  The reference re-encodes every operating point from scratch
        (/root/reference/evaluate.py:102-114)."""
        assert self.tables is not None, "call update() first"
        assert geom in ("topk", "coded"), geom
        assert block_size <= 1024, "block_size > 1024 not supported"
        groups, levels = self._partition_blocks(pointcloud, block_size,
                                                scaling_factor)
        shareds = self._map_groups(
            lambda item, dev: self._encode_shared(item[0], item[1], levels,
                                                  device=dev),
            groups)
        out = []
        for q in qs:
            qv = np.asarray(q, np.float32).reshape(1, 2)
            results = self._map_groups(
                lambda sh, dev: self._encode_at_q(sh, qv, geom=geom),
                shareds)
            blocks = [b for r in results for b in r]
            out.append(bitstream.write_container(None, blocks,
                                                 scaling_factor))
        return out

    def _partition_blocks(self, pointcloud, block_size, scaling_factor):
        """Sort points into per-block groups of up to MAX_GROUP blocks;
        returns ([(blocks, origins), ...], octree levels)."""
        pts = np.asarray(pointcloud)
        xyz = pts[:, :3].astype(np.float64)
        if scaling_factor != 1.0:
            xyz = np.round(xyz / scaling_factor)
        xyz = xyz.astype(np.int32)
        rgb = pts[:, 3:6].astype(np.float32)

        mins = xyz.min(axis=0)
        bidx = (xyz - mins) // block_size
        order = np.lexsort((bidx[:, 2], bidx[:, 1], bidx[:, 0]))
        xyz, rgb, bidx = xyz[order], rgb[order], bidx[order]
        change = np.any(np.diff(bidx, axis=0) != 0, axis=1)
        bounds = np.concatenate([[0], np.where(change)[0] + 1, [len(xyz)]])

        levels = max(1, int(math.ceil(math.log2(max(block_size // 8, 2)))))
        groups = []
        group, group_origins, gpts = [], [], 0
        for s, e in zip(bounds[:-1], bounds[1:]):
            bxyz = xyz[s:e]
            # encode groups are point-capped like decode groups: a 63-block
            # vox11 group (~1.2M pts at block 512) compiles to a ~20 GB
            # analysis graph — past one v5e's 15.75 GB HBM (measured: the
            # Owlii stand-ins occupy all 64 blocks and OOM'd at compile,
            # /tmp/r4_eval_basketball_player.log; per-block streams are
            # group-independent, so containers stay byte-identical)
            if group and (len(group) == MAX_GROUP
                          or gpts + (e - s) > ENC_GROUP_PTS):
                groups.append((group, group_origins))
                group, group_origins, gpts = [], [], 0
            origin = mins + ((bxyz[0] - mins) // block_size) * block_size
            group.append((bxyz - origin, rgb[s:e]))
            group_origins.append(tuple(int(v) for v in origin))
            gpts += e - s
        if group:
            groups.append((group, group_origins))
        return groups, levels

    # -- streaming (multi-frame pipelining) ----------------------------------

    def _stream(self, items, fn, depth):
        """Bounded-depth pipeline: up to ``depth`` frames in flight on
        worker threads, results yielded in input order.  While one frame
        blocks on a device fetch or runs host entropy coding, the next
        frame's device graphs dispatch — single-frame latency is dominated
        by serial host<->device turnarounds, so overlapping frames raises
        throughput without touching the per-frame path.  debug/profile
        recording needs deterministic stage order and forces depth 1."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        if self.debug or self.profile:
            depth = 1
        depth = max(1, int(depth))
        window = deque()
        with ThreadPoolExecutor(max_workers=depth) as ex:
            for item in items:
                window.append(ex.submit(fn, item))
                if len(window) > depth:
                    yield window.popleft().result()
            while window:
                yield window.popleft().result()

    def compress_stream(self, frames, q, block_size=1024, scaling_factor=1.0,
                        depth=2, geom="topk"):
        """Pipelined encode of an iterable of frames; yields container
        bytes in input order, byte-identical to sequential compress()
        (each frame is independent; graphs are pure and shared read-only).
        TPU-native serving addition — the reference encodes strictly
        frame-at-a-time (/root/reference/evaluate.py:102-114)."""
        yield from self._stream(
            frames, lambda f: self.compress(f, q, block_size=block_size,
                                            scaling_factor=scaling_factor,
                                            geom=geom),
            depth)

    def decompress_stream(self, containers, depth=2):
        """Pipelined decode of an iterable of container byte strings;
        yields [N, 6] frames in input order."""
        yield from self._stream(containers, self.decompress, depth)

    def _map_groups(self, fn, items):
        """Round-robin thread-pool over self.devices when there are
        several (parallel/block_parallel.py); on one device, two worker
        threads overlap one group's host entropy coding with another's
        device passes (device calls serialize in the backend queue, the
        host halves genuinely overlap — measured on the 2-group vox11
        decode, scripts/prof_vox11_groups.py).  Results keep input order,
        so containers stay byte-identical to the sequential path.  debug
        and profile recording require deterministic stage order, so they
        force the sequential path."""
        if self.devices and len(self.devices) > 1 and len(items) > 1 \
                and not (self.debug or self.profile):
            from ..parallel.block_parallel import parallel_map_blocks
            return parallel_map_blocks(fn, items, devices=self.devices)
        dev = self.devices[0] if self.devices else None
        if len(items) > 1 and not (self.debug or self.profile):
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=2) as ex:
                futs = [ex.submit(fn, item, dev) for item in items]
                return [f.result() for f in futs]
        return [fn(item, dev) for item in items]

    def _compress_group(self, group, origins, qv, levels, device=None,
                        geom="topk"):
        """Encode up to MAX_GROUP blocks in one batched device pass."""
        shared = self._encode_shared(group, origins, levels, device=device)
        return self._encode_at_q(shared, qv, geom=geom)

    def _encode_shared(self, group, origins, levels, device=None):
        """q-independent half of the encode: voxelize, host pyramid
        bookkeeping, the analysis stack g_a, and the hyper-encoder.
        Returns a state dict `_encode_at_q` turns into blocks for any q
        (coordinate/z streams are filled in lazily on the first q)."""
        from ..ops.sparse import voxelize_host_np
        params = self._params_for(device)
        g = len(group)
        batch = np.concatenate([np.full(len(x), i, np.int32)
                                for i, (x, _) in enumerate(group)])
        local = np.concatenate([x for x, _ in group])
        colors = np.concatenate([c for _, c in group])
        cap = _bucket(len(local))
        keys_host, feats_host = self._t("enc.voxelize", voxelize_host_np,
                                        batch, local, colors, cap)

        # exact host downsample chain: level key sets s2..s32 (microseconds)
        # size every device pyramid tightly and replace device count syncs
        lvl_keys = self._t("enc.host_counts", _host_downsample_levels,
                           keys_host, 5)
        ga_caps4 = tuple(_bucket(len(k)) for k in lvl_keys[:4])
        # host-computed root neighbor maps (device dependent-gather searches
        # cost seconds at these caps; numpy does them in microseconds);
        # per-level caps must mirror AnalysisTransform's pyramid exactly
        # (levels: s2, s4, s8, s16-root)
        _, ga_rn_idx, ga_rn_ok = self._t(
            "enc.host_root", F.host_root_neighbors, keys_host, 4, ga_caps4[3],
            list(ga_caps4))

        key_mask = (1 << C.BATCH_SHIFT) - 1
        sent = np.iinfo(np.int64).max
        valid_in = keys_host != sent
        batch_u8 = np.where(valid_in, keys_host >> C.BATCH_SHIFT, 255
                            ).astype(np.uint8)
        morton_i32 = np.where(valid_in, keys_host & key_mask, -1
                              ).astype(np.int32)
        colors_u8 = np.clip(np.round(feats_host * 255.0), 0, 255
                            ).astype(np.uint8)
        enc = self._t("enc.analyze", self._analyze(cap, ga_caps4), params,
                      self._dev(batch_u8, device), self._dev(morton_i32, device),
                      self._dev(colors_u8, device),
                      self._dev(ga_rn_idx, device), self._dev(ga_rn_ok, device))

        # y is the exact s8 downsample of the input keys, so its count and
        # key array are known on the host already — no device count sync, no
        # re-bucket (the decoder sizes its bucket from the same counts)
        n_y = len(lvl_keys[2])
        ycap = _bucket(n_y)
        assert ycap == ga_caps4[2]
        y_keys, y_feats = enc["y_keys"], enc["y_feats"]
        y_keys_np = np.full(ycap, sent, np.int64)
        y_keys_np[:n_y] = lvl_keys[2]

        z_caps, hs_caps = _z_hs_caps(len(lvl_keys[3]), len(lvl_keys[4]))
        _, z_rn_idx, z_rn_ok = self._t(
            "enc.host_root_z", F.host_root_neighbors, y_keys_np, 2, z_caps[1],
            list(z_caps))
        z_rn = (self._dev(z_rn_idx, device), self._dev(z_rn_ok, device))
        hyp = self._t("enc.hyper", self._hyper_analyze(ycap, z_caps), params,
                      y_keys, y_feats, *z_rn)

        # host: per-block prefix runs (batch-major order) — q-independent
        yv = y_keys_np != sent
        y_batches = (y_keys_np[yv] >> C.BATCH_SHIFT).astype(np.int32)
        ny_b = np.bincount(y_batches, minlength=g)[:g]
        y_ofs = np.concatenate([[0], np.cumsum(ny_b)])

        # z keys are the exact s32 downsample — host array, no device fetch
        n_z = len(lvl_keys[4])
        z_batches = (lvl_keys[4] >> C.BATCH_SHIFT).astype(np.int32)
        nz_b = np.bincount(z_batches, minlength=g)[:g]
        z_ofs = np.concatenate([[0], np.cumsum(nz_b)])

        return {"device": device, "params": params, "g": g,
                "levels": levels, "origins": origins,
                "enc": enc, "hyp": hyp, "z_rn": z_rn,
                "y_keys": y_keys, "y_feats": y_feats,
                # exact GT level sets for the coded-occupancy mode: the
                # selection targets at strides 4, 2, 1 (sorted, batch-major)
                "gt_levels": (lvl_keys[1], lvl_keys[0],
                              keys_host[keys_host != sent]),
                "y_keys_np": y_keys_np, "yv": yv, "n_y": n_y, "ycap": ycap,
                "z_caps": z_caps, "hs_caps": hs_caps, "n_z": n_z,
                "ny_b": ny_b, "y_ofs": y_ofs, "nz_b": nz_b, "z_ofs": z_ofs,
                # q-independent stream bytes, filled on the first q pass
                "z_bytes": None, "coord_bytes": None, "k_all": None}

    def _encode_at_q(self, sh, qv, geom="topk"):
        """q-dependent half of the encode: gain/param graphs, symbol
        extraction, per-block y rANS streams.  Coordinate and z streams
        are coded once and cached in ``sh`` across q passes.  geom="coded"
        additionally closed-loop-codes per-candidate occupancy (the
        streams are q-dependent: the context logits read the dequantized
        latents)."""
        device = sh["device"]
        qv_np = np.asarray(qv, np.float32).reshape(1, 2)
        qv = self._dev(qv_np, device)
        params, enc, hyp = sh["params"], sh["enc"], sh["hyp"]
        g, levels, origins = sh["g"], sh["levels"], sh["origins"]
        n_y, n_z, ycap = sh["n_y"], sh["n_z"], sh["ycap"]
        y_keys_np, yv = sh["y_keys_np"], sh["yv"]
        ny_b, y_ofs, nz_b, z_ofs = (sh["ny_b"], sh["y_ofs"], sh["nz_b"],
                                    sh["z_ofs"])
        key_mask = (1 << C.BATCH_SHIFT) - 1

        dec = self._t("enc.params",
                      self._params_graph(ycap, sh["z_caps"], sh["hs_caps"]),
                      params, sh["y_keys"], hyp["z_sym"], qv, *sh["z_rn"])
        sym_out = self._t("enc.symbols", self._symbols_graph(ycap),
                          params, sh["y_feats"], dec)

        zt, yt = self.tables["z"], self.tables["y"]
        zch = hyp["z_sym"].shape[1]
        ypre = _bucket(n_y, 64)
        # ONE device_get round-trip for everything the host needs from the
        # encode graphs (each separate sync pays ~35 ms tunnel latency)
        z_vals, pk, esc_n, k_all = self._t("enc.fetch_y", lambda: jax.device_get(
            (hyp["z_sym"][:_bucket(n_z, 64)], sym_out["packed"][:ypre],
             sym_out["esc_n"], enc["k"])))
        z_vals = z_vals[:n_z]
        pku = np.asarray(pk).view(np.uint16)
        y_idx = (pku >> 8).astype(np.int32)[:n_y]
        y_vals = (pku & 0xFF).astype(np.uint8).view(np.int8).astype(np.int16)
        if int(esc_n):
            # escapes present: refetch at full width (correctness path)
            y_vals = np.asarray(sym_out["y_sym"][:ypre])
        y_vals = y_vals[:n_y]
        if sh["k_all"] is None:
            sh["k_all"] = k_all

        occ_streams = None
        if geom == "coded":
            occ_streams = [[] for _ in range(g)]
            gt = sh["gt_levels"]

            def _code_bits(lvl, parents, bins_np, slices):
                occ = refine.occupancy_np(refine.children_np(parents),
                                          gt[lvl])
                # occupancy coder v2 (coding/occ.py): one-pass adaptive KT
                # contexts of (logit bin x causal sibling count), seeded
                # from the bin-center sigmoid prior — no table side info,
                # no second pass, and the sibling context carries the
                # surface correlation the per-candidate logits cannot
                for i, s in enumerate(slices):
                    occ_streams[i].append(self._t(
                        "enc.occ_ctx", occ_coder.encode, occ[s], bins_np[s]))
                return occ

            self._occ_stages(params, device, sh["y_keys"],
                             sym_out["y_sym"], dec, ycap,
                             y_keys_np[yv], g, _code_bits)

        fill_shared = sh["z_bytes"] is None
        if fill_shared:
            sh["z_bytes"], sh["coord_bytes"] = [], []
        blocks = []
        for i, origin in enumerate(origins):
            zi = z_vals[z_ofs[i]:z_ofs[i + 1]].reshape(-1)
            if fill_shared:
                z_idx = np.tile(np.arange(zch, dtype=np.int32), int(nz_b[i]))
                sh["z_bytes"].append(self._t(
                    "enc.rans_z", rans.encode_with_indexes,
                    zi, z_idx, zt["cdf"], zt["cdf_length"], zt["offset"]))
            z_bytes = sh["z_bytes"][i]
            yi = y_vals[y_ofs[i]:y_ofs[i + 1]].reshape(-1)
            yidx_i = y_idx[y_ofs[i]:y_ofs[i + 1]].reshape(-1)
            y_bytes = self._t("enc.rans_y", rans.encode_with_indexes,
                              yi, yidx_i, yt["cdf"], yt["cdf_length"],
                              yt["offset"])
            morton = (y_keys_np[yv][y_ofs[i]:y_ofs[i + 1]] & key_mask)
            if fill_shared:
                sh["coord_bytes"].append(self._t(
                    "enc.octree", octree.encode, morton, levels))
            coord_bytes = sh["coord_bytes"][i]

            if self.debug:
                self.debug_info.append({
                    "side": "enc", "y_sym": yi.copy(), "z_sym": zi.copy(),
                    "y_idx": yidx_i.copy(), "y_keys": morton.copy(),
                    "scales": np.asarray(dec["scales_hat"][:ypre])[:n_y][
                        y_ofs[i]:y_ofs[i + 1]].copy(),
                    "means": np.asarray(dec["means_hat"][:ypre])[:n_y][
                        y_ofs[i]:y_ofs[i + 1]].copy()})

            blocks.append({"origin": origin, "levels": levels,
                           "n_y": int(ny_b[i]), "n_z": int(nz_b[i]),
                           "q": (float(qv_np[0, 0]), float(qv_np[0, 1])),
                           "k": sh["k_all"][:, i].tolist(),
                           "coord_bytes": coord_bytes, "y_bytes": y_bytes,
                           "z_bytes": z_bytes,
                           "occ_bytes": (tuple(occ_streams[i])
                                         if occ_streams else None)})
        return blocks

    # -- decode --------------------------------------------------------------

    def decompress(self, path_or_bytes):
        """Returns numpy [N, 6] (xyz int, rgb in [0,1] on the 8-bit grid)."""
        assert self.tables is not None, "call update() first"
        blocks, scaling_factor = bitstream.read_container(path_or_bytes)
        # q is stored per block; a device group shares one q vector (it feeds
        # the batched gain nets), so group only runs of equal q — mixed-q
        # containers decode correctly instead of desyncing the rANS indexes.
        items = _chunk_decode_groups(blocks)
        outs = self._map_groups(
            lambda blks, dev: self._decompress_group(blks, device=dev), items)
        x = np.concatenate(outs, axis=0)
        if scaling_factor != 1.0:
            x[:, :3] = x[:, :3] * scaling_factor
        # frame-level signaled color corrections (encoder refit) — ride the
        # container's first block: affine (codec/color_affine.py) then the
        # residual enhancement layer (codec/color_resid.py), in the same
        # order the encoder fitted them
        aff = blocks[0].get("color_affine") if blocks else None
        if aff is not None and len(x):
            x[:, 3:6] = color_affine.apply(x[:, 3:6], aff)
        resid = blocks[0].get("color_resid") if blocks else None
        if resid is not None and len(x):
            x[:, 3:6] = color_resid.apply(x, resid)
        return x

    def refit_colors(self, data, source_pc, rec=None, source_tree=None,
                     resid_lam=0.0, fit_affine=True, resid_floor=0.0):
        """Encoder-side color refit: fit the frame's signaled corrections
        against the source and return ``(new_container_bytes, corrected
        reconstruction)``.  ``rec`` skips the decode when the caller has
        already decoded ``data`` (the eval driver has); the returned
        reconstruction equals ``decompress(new_container_bytes)``.

        Two layers, both optional and both counted in the new container's
        length: the 48-byte affine (codec/color_affine.py), and — when
        ``resid_lam`` > 0 — the RAHT-coded residual enhancement layer
        (codec/color_resid.py) fitted on the affine-corrected colors with
        Lagrangian weight ``resid_lam`` (lambda_A(q_a) in training-loss
        units).  Geometry and all entropy-coded payloads stay
        byte-identical."""
        if rec is None:
            rec = self.decompress(data)
        src = np.asarray(source_pc)
        W = None
        if fit_affine:
            W, _gain = color_affine.fit(rec, src, source_tree=source_tree)
        out = np.asarray(rec)
        payload = None
        if W is not None:
            out = out.copy()
            out[:, 3:6] = color_affine.apply(out[:, 3:6], W)
        if resid_lam > 0.0:
            payload, corr, _info = color_resid.fit(
                out, src, resid_lam, source_tree=source_tree,
                d_floor=resid_floor)
            if payload is not None:
                out = out.copy() if out is rec else out
                out[:, 3:6] = corr
        if W is None and payload is None:
            return data if isinstance(data, bytes) \
                else bytes(data), out
        blocks, scaling_factor = bitstream.read_container(data)
        assert blocks[0].get("color_affine") is None, \
            "container already carries a color affine"
        if W is not None:
            blocks[0]["color_affine"] = W
        if payload is not None:
            blocks[0]["color_resid"] = payload
        return bitstream.write_container(None, blocks, scaling_factor), out

    def _decompress_group(self, blks, device=None):
        """Decode up to MAX_GROUP blocks in one batched device pass."""
        params = self._params_for(device)
        g = len(blks)
        zt, yt = self.tables["z"], self.tables["y"]
        sent = np.iinfo(np.int64).max
        # the whole group decodes under one q (the Gaussian gains feed the
        # rANS indexes); a mixed-q group would silently desync the coder,
        # so reject it loudly rather than produce garbage
        q0 = np.asarray(blks[0]["q"], np.float32)
        for b in blks[1:]:
            if not np.array_equal(np.asarray(b["q"], np.float32), q0):
                raise ValueError(
                    "mixed per-block q inside one decode group: "
                    f"{q0.tolist()} vs {np.asarray(b['q']).tolist()}; "
                    "group blocks by q before decoding")

        # coordinates: per-block octree decode, batched keys in batch-major
        # order (already sorted: batch bits are the key's high bits)
        mortons = [octree.decode(b["coord_bytes"], b["levels"], b["n_y"] + 8)
                   for b in blks]
        for b, m in zip(blks, mortons):
            assert m.size == b["n_y"], "coordinate count mismatch"
        n_y = sum(b["n_y"] for b in blks)
        ycap = _bucket(n_y)
        y_keys_np = np.full(ycap, sent, np.int64)
        pos = 0
        for i, m in enumerate(mortons):
            y_keys_np[pos:pos + len(m)] = m | (np.int64(i) << C.BATCH_SHIFT)
            pos += len(m)
        y_keys = self._dev(y_keys_np, device)

        # z symbols per block, concatenated in batch-major prefix order
        zch = zt["cdf"].shape[0]
        z_rows = []
        for b in blks:
            z_idx = np.tile(np.arange(zch, dtype=np.int32), b["n_z"])
            vals = self._t("dec.rans_z", rans.decode_with_indexes,
                           b["z_bytes"], z_idx, zt["cdf"], zt["cdf_length"],
                           zt["offset"])
            z_rows.append(vals.reshape(b["n_z"], zch))
        # z/h_s capacities from the y key set — the encoder derived the same
        # values from the same downsample chain, so the shared params graph
        # is bit-identical on both sides
        lvl = _host_downsample_levels(y_keys_np, 2)
        if len(lvl[1]) != sum(b["n_z"] for b in blks):
            raise ValueError(
                f"bitstream z-count mismatch: derived {len(lvl[1])} from the "
                f"coordinates, container says {sum(b['n_z'] for b in blks)}")
        z_caps, hs_caps = _z_hs_caps(len(lvl[0]), len(lvl[1]))
        zcap = z_caps[1]
        # int16 uploads match the device graphs' symbol format (the values
        # are the encoder's int16-clipped symbols by construction)
        z_sym = np.zeros((zcap, zch), np.int16)
        z_all = np.concatenate(z_rows) if z_rows else np.zeros((0, zch), np.int32)
        z_sym[:len(z_all)] = z_all

        qv = self._dev(np.asarray(blks[0]["q"], np.float32).reshape(1, 2),
                       device)
        _, z_rn_idx, z_rn_ok = self._t(
            "dec.host_root", F.host_root_neighbors, y_keys_np, 2, zcap,
            list(z_caps))
        dec = self._t("dec.params", self._params_graph(ycap, z_caps, hs_caps),
                      params, y_keys, self._dev(z_sym, device), qv,
                      self._dev(z_rn_idx, device), self._dev(z_rn_ok, device))

        ypre = _bucket(n_y, 64)
        y_idx = self._t("dec.fetch_idx", lambda: np.asarray(
            dec["indexes"][:ypre]))[:n_y]
        cb = self.model.config["entropy_model"]["C_bottleneck"]
        y_sym = np.zeros((ycap, cb), np.int16)
        pos = 0
        for b in blks:
            idx_i = y_idx[pos:pos + b["n_y"]].reshape(-1)
            vals = self._t("dec.rans_y", rans.decode_with_indexes,
                           b["y_bytes"], idx_i, yt["cdf"], yt["cdf_length"],
                           yt["offset"])
            y_sym[pos:pos + b["n_y"]] = vals.reshape(b["n_y"], cb)
            pos += b["n_y"]

        if self.debug:
            yv = y_keys_np != sent
            pos = 0
            for i, b in enumerate(blks):
                sl = slice(pos, pos + b["n_y"])
                self.debug_info.append({
                    "side": "dec", "y_sym": y_sym[:n_y][sl].reshape(-1).copy(),
                    "z_sym": z_all[int(sum(x["n_z"] for x in blks[:i])):
                                   int(sum(x["n_z"] for x in blks[:i + 1]))]
                    .reshape(-1).copy(),
                    "y_idx": y_idx[sl].reshape(-1).copy(),
                    "y_keys": (y_keys_np[:n_y][sl]
                               & ((1 << C.BATCH_SHIFT) - 1)).copy(),
                    "scales": np.asarray(dec["scales_hat"][:ypre])[:n_y][sl].copy(),
                    "means": np.asarray(dec["means_hat"][:ypre])[:n_y][sl].copy()})
                pos += b["n_y"]

        if blks[0].get("occ_bytes") is not None:
            # coded-occupancy (lossless-geometry) container: staged decode —
            # each level's occupancy bits are context-decoded against the
            # device-computed logit bins + the decoder's own causal sibling
            # counts (coding/occ.py), then fed back as the next stage's
            # selection (codec/refine.py)
            y_sym_dev = self._dev(y_sym, device)

            def _decode_bits(lvl, parents, bins_np, slices):
                occ = np.empty(8 * len(parents), bool)
                for b, s in zip(blks, slices):
                    occ[s] = self._t("dec.occ_ctx", occ_coder.decode,
                                     b["occ_bytes"][lvl],
                                     bins_np[s]).astype(bool)
                return occ

            keeps_dev, ccaps, final_keys = self._occ_stages(
                params, device, y_keys, y_sym_dev, dec, ycap,
                y_keys_np[y_keys_np != sent], g, _decode_bits)
            batch_u8, morton_i32, colors8 = self._t(
                "dec.reconstruct", self._coded_final_graph(ycap, ccaps),
                params, y_keys, y_sym_dev, dec, *keeps_dev)
            opre = min(_bucket(len(final_keys), 64), ccaps[2])
            return self._fetch_points(blks, g, batch_u8, morton_i32,
                                      colors8, opre)

        k = np.zeros((3, 64), np.int32)
        for i, b in enumerate(blks):
            k[:, i] = b["k"]
        # intermediate levels may keep ceil(slack*k) rows (g_s prune_slack) —
        # size the static pruned-level capacities to cover that
        slack = self.model.config["g_s"].get("prune_slack", (1.0, 1.0))
        prune_caps = tuple(
            _bucket(int(np.ceil(k[l].astype(np.float64)
                                * (slack[l] if l < len(slack) else 1.0))
                        .sum())) for l in range(3))
        # y symbols ride the tunnel as int8 + exact escape list (ESC_CAP
        # note above); overflow falls back to the full-width int16 graph
        y8 = np.clip(y_sym, -128, 127).astype(np.int8)
        esc = np.nonzero(y_sym.ravel() != y8.ravel())[0]
        if len(esc) <= ESC_CAP:
            esc_pos = np.full(ESC_CAP, y_sym.size, np.int32)
            esc_pos[:len(esc)] = esc
            esc_val = np.zeros(ESC_CAP, np.int16)
            esc_val[:len(esc)] = y_sym.ravel()[esc]
            batch_u8, morton_i32, colors8 = self._t(
                "dec.reconstruct",
                self._reconstruct_graph(ycap, prune_caps, "i8"),
                params, y_keys, self._dev(y8, device), dec,
                self._dev(k, device), self._dev(esc_pos, device),
                self._dev(esc_val, device))
        else:
            batch_u8, morton_i32, colors8 = self._t(
                "dec.reconstruct",
                self._reconstruct_graph(ycap, prune_caps, "i16"),
                params, y_keys, self._dev(y_sym, device), dec,
                self._dev(k, device))

        # the final compaction leaves valid rows in a contiguous prefix and
        # the container's k rows bound the count, so fetch only that prefix
        # (the output arrays are sized to the coarse capacity bucket, ~2x);
        # single-block frames skip the batch fetch entirely — every point
        # shares origin 0
        opre = min(_bucket(int(k[2].sum()), 64), prune_caps[2])
        return self._fetch_points(blks, g, batch_u8, morton_i32, colors8,
                                  opre)
    def _fetch_points(self, blks, g, batch_u8, morton_i32, colors8, opre):
        """Fetch the decoded prefix and assemble the [N, 6] host cloud."""
        if g == 1:
            mi, co = self._t("dec.fetch_out", lambda: jax.device_get(
                (morton_i32[:opre], colors8[:opre])))
            bu = np.zeros(opre, np.uint8)
        else:
            bu, mi, co = self._t("dec.fetch_out", lambda: jax.device_get(
                (batch_u8[:opre], morton_i32[:opre], colors8[:opre])))
        v = mi >= 0
        units = C.morton_decode_np(mi[v].astype(np.int64))
        origins = np.asarray([b["origin"] for b in blks], np.int32)
        xyz = units + origins[np.minimum(bu[v], g - 1)]
        colors = co[v].astype(np.float32) / 255.0
        return np.concatenate([xyz.astype(np.float32), colors], axis=1)
