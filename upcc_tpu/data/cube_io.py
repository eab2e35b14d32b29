"""PLY-per-cube slicing/writing/reading (legacy data-prep path).

Parity target: /root/reference/data/utils/Cube.py + Cubes.py — an
alternative on-disk representation where each frame is sliced into cubes
stored as individual PLY files plus a side_info.yaml manifest.  The main
train/eval flow uses StaticDataset's npz cache instead (as the reference's
uses its .pt cache); this module exists for data-prep tooling parity.
"""

import os

import numpy as np
import yaml

from .dataset import slice_into_cubes
from .ply import read_ply, write_ply


class CubeHandler:
    def __init__(self, cube_size=128):
        self.cube_size = cube_size

    def slice(self, xyz, rgb):
        """Frame -> list of (origin, local_xyz, rgb)."""
        cubes = []
        idx = np.floor(np.asarray(xyz) / self.cube_size).astype(np.int64)
        for local, colors in slice_into_cubes(xyz, rgb, self.cube_size):
            # recover origin from any representative point
            cubes.append((local, colors))
        # recompute origins exactly
        origins = sorted({tuple(i) for i in idx.tolist()})
        out = []
        for (local, colors), o in zip(cubes, origins):
            out.append({"origin": [int(v) * self.cube_size for v in o],
                        "xyz": local, "rgb": colors})
        return out

    def write(self, cubes, directory, min_points=0):
        """Write cube_{i:05d}.ply files + side_info.yaml."""
        os.makedirs(directory, exist_ok=True)
        side_info = {"cube_size": self.cube_size, "cubes": []}
        j = 0
        for c in cubes:
            if len(c["xyz"]) < min_points:
                continue
            name = f"cube_{j:05d}.ply"
            write_ply(os.path.join(directory, name), c["xyz"], c["rgb"])
            side_info["cubes"].append({"file": name,
                                       "origin": [int(v) for v in c["origin"]],
                                       "num_points": int(len(c["xyz"]))})
            j += 1
        with open(os.path.join(directory, "side_info.yaml"), "w") as f:
            yaml.safe_dump(side_info, f)
        return j

    def read(self, directory):
        """side_info.yaml + cube PLYs -> reassembled frame [N, 6]."""
        with open(os.path.join(directory, "side_info.yaml")) as f:
            side_info = yaml.safe_load(f)
        parts = []
        for c in side_info["cubes"]:
            xyz, rgb = read_ply(os.path.join(directory, c["file"]))
            if rgb is None:
                rgb = np.zeros((len(xyz), 3), np.float32)
            xyz = xyz + np.asarray(c["origin"], np.float64)
            parts.append(np.concatenate([xyz.astype(np.float32), rgb], 1))
        return np.concatenate(parts) if parts else np.zeros((0, 6), np.float32)
