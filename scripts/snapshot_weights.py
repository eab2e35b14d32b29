"""Snapshot a training run's rolling weights as a committable bf16 msgpack.

Usage:  python scripts/snapshot_weights.py [experiment]

Reads  results/<exp>/weights.msgpack (float32, gitignored, machine-local)
Writes results/<exp>/weights_bf16.msgpack (half the bytes) — force-add this
to git so trained state survives host restarts (round-2 session 6 lost a
52-epoch flagship run to exactly that).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flax import serialization as ser  # noqa: E402

from upcc_tpu.utils.weights_io import save_compact  # noqa: E402


def main():
    exp = sys.argv[1] if len(sys.argv) > 1 else "CVPR_inverse_scaling"
    exp_dir = os.path.join("results", exp)
    src = os.path.join(exp_dir, "weights.msgpack")
    dst = os.path.join(exp_dir, "weights_bf16.msgpack")
    with open(src, "rb") as f:
        raw = f.read()
    # Deserialize without a template: state-dict of plain numpy arrays.
    params = ser.msgpack_restore(raw)
    save_compact(params, dst)
    # keep the epoch/step sidecar in sync so load_codec's staleness
    # arbitration sees matching provenance for both files
    if os.path.exists(src + ".meta.json"):
        import shutil
        shutil.copyfile(src + ".meta.json", dst + ".meta.json")
    print(f"{src} ({len(raw)/1e6:.1f} MB) -> {dst} "
          f"({os.path.getsize(dst)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
