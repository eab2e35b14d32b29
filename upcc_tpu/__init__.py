"""upcc_tpu — TPU-native unified point-cloud compression framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ikt-luh/Unified-Point-Cloud-Compression (learned joint geometry+attribute
point-cloud codec with continuous multimodal rate control, arXiv:2408.00599).

Design pillars (TPU-first, not a port):
  * Sparse voxel tensors are flat, statically-shaped arrays of sorted Morton
    keys with validity sentinels — no dynamic shapes under jit, canonical
    point order by construction (replaces the reference's ``Sorted*`` layer
    family, /root/reference/model/entropy_models.py:28-126).
  * Sparse convolutions are gather-GEMM-accumulate over kernel offsets, with
    the GEMMs on the MXU; coordinate bookkeeping is integer vector math plus
    binary search in sorted key arrays.
  * The entropy models (factorized bottleneck + mean-scale Gaussian
    conditional) are pure JAX; the rANS coder is native C++ driven by
    device-computed CDF indexes.
  * Multi-device scaling is jax.sharding over a Mesh (data-parallel cubes in
    training, block-parallel encode at inference) — new capability, the
    reference is single-GPU (SURVEY.md §5.8).
"""

import os

import jax

# The whole framework keys sparse voxels by 63-bit Morton codes (int64).
# This must be enabled before any key math is traced.
jax.config.update("jax_enable_x64", True)

# Reliable platform selection: this image's sitecustomize registers the
# axon TPU plugin in every python process and pins the platform, so the
# JAX_PLATFORMS *env var* is silently ignored (measured round 4: a
# process launched with JAX_PLATFORMS=cpu still lists [TPU v5 lite0]).
# jax.config.update after import is the only override that sticks —
# tests do it in conftest.py; CLI runs that must stay off the TPU
# (smokes, plot refreshes beside a live trainer) set UPCC_PLATFORM=cpu.
_plat = os.environ.get("UPCC_PLATFORM")
if _plat:
    try:
        jax.config.update("jax_platforms", _plat)
    except RuntimeError:
        pass  # backend already initialized by an earlier device call

# Persistent compilation cache: the codec compiles one graph per capacity
# bucket; cache them across processes.  The dir is keyed by a machine
# signature: XLA:CPU AOT results bake in host ISA features, and loading a
# cache written on a different microarchitecture can SIGILL.
def _machine_tag():
    import hashlib
    sig = jax.__version__
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    sig += line
                    break
    except OSError:
        pass
    return hashlib.sha256(sig.encode()).hexdigest()[:10]


_cache_dir = os.environ.get("UPCC_COMPILATION_CACHE",
                            os.path.expanduser("~/.cache/upcc_tpu_xla-"
                                               + _machine_tag()))
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

__version__ = "0.1.0"
