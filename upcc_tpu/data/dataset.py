"""Dataset: raw PLY loading, cube slicing, split caching, batching.

Parity targets:
  * RawLoader (/root/reference/data/utils/RawLoader.py): maps
    (sequence, frameIdx) -> PLY path from a loading-config of per-dataset
    path templates and frame ranges.
  * StaticDataset (/root/reference/data/dataloader.py:13-276): on first use
    slices every configured frame into cubes of `cube_size`, caches the
    whole split to one file; train split iterates cubes (with a min_points
    filter), val/test iterate whole frames.  Frame-range DSL "start:stop:step".
  * custom_collate_fn (/root/reference/data/utils/util.py): variable-size
    cubes are batched — here into one fixed-capacity flat array batch with
    batch indices, ready for SparseTensor construction on device.

TPU-native: the cache is a compressed .npz of concatenated points plus
offsets (no torch pickles); collation pads to a static capacity so every
training step reuses one compiled graph.
"""

import os

import numpy as np
import yaml

from .ply import read_ply


def parse_frame_spec(spec):
    """Frame-range DSL: int, "start:stop[:step]", or list of those."""
    if isinstance(spec, int):
        return [spec]
    if isinstance(spec, (list, tuple)):
        out = []
        for s in spec:
            out.extend(parse_frame_spec(s))
        return out
    if isinstance(spec, str):
        parts = spec.split(":")
        if len(parts) == 1:
            return [int(parts[0])]
        start, stop = int(parts[0]), int(parts[1])
        step = int(parts[2]) if len(parts) > 2 else 1
        return list(range(start, stop + 1, step))
    raise ValueError(f"bad frame spec {spec!r}")


class RawLoader:
    """(sequence, frameIdx) -> (xyz float64 [N,3], rgb f32 [N,3])."""

    def __init__(self, loading_config):
        if isinstance(loading_config, str):
            with open(loading_config) as f:
                loading_config = yaml.safe_load(f)
        self.cfg = loading_config
        self.base = self.cfg.get("base_path", ".")

    def path_for(self, sequence, frame_idx):
        for ds_name, ds in self.cfg.get("datasets", {}).items():
            if sequence in ds.get("sequences", {}):
                seq = ds["sequences"][sequence]
                tpl = ds["path_template"]
                return os.path.join(self.base, tpl.format(
                    sequence=sequence, frame=frame_idx,
                    **{k: v for k, v in seq.items() if not isinstance(v, dict)}))
        raise KeyError(f"sequence {sequence} not in loading config")

    def get_pointcloud(self, sequence, frame_idx):
        xyz, rgb = read_ply(self.path_for(sequence, frame_idx))
        if rgb is None:
            rgb = np.zeros((len(xyz), 3), np.float32)
        return xyz, rgb


def slice_into_cubes(xyz, rgb, cube_size):
    """Partition a frame into local-coordinate cubes
    (reference dataloader.py:168-208). Returns list of (xyz_local, rgb)."""
    xyz = np.asarray(xyz)
    idx = np.floor(xyz / cube_size).astype(np.int64)
    order = np.lexsort((idx[:, 2], idx[:, 1], idx[:, 0]))
    xyz, rgb, idx = xyz[order], rgb[order], idx[order]
    change = np.any(np.diff(idx, axis=0) != 0, axis=1)
    bounds = np.concatenate([[0], np.where(change)[0] + 1, [len(xyz)]])
    cubes = []
    for s, e in zip(bounds[:-1], bounds[1:]):
        local = xyz[s:e] - idx[s] * cube_size
        cubes.append((local.astype(np.int32), rgb[s:e].astype(np.float32)))
    return cubes


class StaticDataset:
    """Cached cube/frame dataset over a dataset-config directory.

    data_path must contain config.yaml:
      name, cube_size, and per-split {sequence: frame_spec} maps
      (keys 'train'/'val'/'test').
    """

    def __init__(self, data_path, split, loading_config=None, min_points=0,
                 transforms=None, cache_dir=None):
        with open(os.path.join(data_path, "config.yaml")) as f:
            self.cfg = yaml.safe_load(f)
        self.split = split
        self.cube_size = int(self.cfg.get("cube_size", 128))
        self.min_points = min_points
        self.transforms = transforms or []
        self.cache_dir = cache_dir or data_path
        self.loader = RawLoader(loading_config) if loading_config else None
        self._load()

    def _cache_path(self):
        return os.path.join(self.cache_dir, f"{self.split}.npz")

    def _load(self):
        path = self._cache_path()
        if not os.path.exists(path):
            self._prepare_split(path)
        with np.load(path) as z:
            self.points = z["points"]
            self.colors = z["colors"]
            self.offsets = z["offsets"]
        counts = np.diff(self.offsets)
        if self.split == "train":
            self.indices = np.where(counts >= self.min_points)[0]
        else:
            self.indices = np.arange(len(counts))

    def _prepare_split(self, path):
        assert self.loader is not None, \
            f"no cache at {path} and no loading config given"
        spec = self.cfg.get(self.split, {})
        pts_list, col_list = [], []
        for sequence, frames in spec.items():
            for fidx in parse_frame_spec(frames):
                xyz, rgb = self.loader.get_pointcloud(sequence, fidx)
                if self.split == "train":
                    for cxyz, crgb in slice_into_cubes(xyz, rgb, self.cube_size):
                        pts_list.append(cxyz)
                        col_list.append(crgb)
                else:
                    pts_list.append(xyz.astype(np.int32))
                    col_list.append(rgb.astype(np.float32))
        offsets = np.zeros(len(pts_list) + 1, np.int64)
        offsets[1:] = np.cumsum([len(p) for p in pts_list])
        np.savez_compressed(
            path,
            points=np.concatenate(pts_list) if pts_list else np.zeros((0, 3), np.int32),
            colors=np.concatenate(col_list) if col_list else np.zeros((0, 3), np.float32),
            offsets=offsets)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        j = self.indices[i]
        s, e = self.offsets[j], self.offsets[j + 1]
        xyz = self.points[s:e].copy()
        rgb = self.colors[s:e].copy()
        for t in self.transforms:
            xyz, rgb = t(xyz, rgb)
        return xyz, rgb


def collate_cubes(items, capacity, rng=None):
    """Pad/stack variable-size cubes into one flat batch
    (batch int32 [cap], xyz int32 [cap,3], rgb f32 [cap,3]).
    Overflowing points are dropped uniformly at random."""
    bs, xs, cs = [], [], []
    for b, (xyz, rgb) in enumerate(items):
        bs.append(np.full(len(xyz), b, np.int32))
        xs.append(xyz)
        cs.append(rgb)
    b = np.concatenate(bs) if bs else np.zeros(0, np.int32)
    x = np.concatenate(xs) if xs else np.zeros((0, 3), np.int32)
    c = np.concatenate(cs) if cs else np.zeros((0, 3), np.float32)
    n = len(b)
    if n > capacity:
        rng = rng or np.random.default_rng(0)
        sel = rng.choice(n, capacity, replace=False)
        b, x, c = b[sel], x[sel], c[sel]
        n = capacity
    pad = capacity - n
    if pad:
        b = np.concatenate([b, np.full(pad, -1, np.int32)])
        x = np.concatenate([x, np.zeros((pad, 3), np.int32)])
        c = np.concatenate([c, np.zeros((pad, 3), np.float32)])
    return b, x.astype(np.int32), c.astype(np.float32)
