#!/bin/sh
# One-shot host bootstrap after a re-image: everything outside git is gone
# (dataset .npz caches, orbax checkpoints, XLA compile cache, built .so
# coders).  This regenerates the deterministic synthetic dataset caches and
# pre-builds the native coders so `train.py` / `evaluate.py` start clean.
# Training then warm-starts from the committed bf16 snapshot automatically
# (trainer._maybe_warm_start).
#   sh scripts/bootstrap_host.sh
set -e
cd "$(dirname "$0")/.." || exit 1

# dataset caches (seeded generators -> byte-identical regeneration)
for ds in data/datasets/*/; do
    name=$(basename "$ds")
    [ -f "$ds/config.yaml" ] || continue
    grep -q "synthetic: true" "$ds/config.yaml" || continue
    if [ ! -f "$ds/train.npz" ]; then
        echo "== regenerating $name"
        python - "$ds" <<'EOF'
import sys, yaml
from upcc_tpu.data.make_synth import build
ds = sys.argv[1]
spec = yaml.safe_load(open(ds + "/config.yaml"))
gen = spec.get("generator", {})
def n_frames(rng):  # "a:b" -> count
    a, b = str(rng).split(":")
    return int(b) - int(a) + 1
build(ds, n_frames(spec["train"]["synth"]), n_frames(spec["val"]["synth"]),
      n_frames(spec["test"]["synth"]), gen.get("extent", 1024),
      gen.get("points", 760_000), spec.get("cube_size", 128),
      gen.get("seed0", 0))
EOF
    fi
done

# native coders (auto-build on import; do it now so first train step is clean)
python -c "from upcc_tpu.coding import rans, octree; print('coders ok')"

echo "bootstrap done — launch training with:"
echo "  nohup sh scripts/train_watchdog.sh 28800 configs/CVPR_inverse_scaling.yaml /tmp/train_watch.log &"
