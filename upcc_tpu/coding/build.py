"""Content-hash-keyed builder for the native C++ host components.

Shared libraries are built into a per-user cache directory keyed by the
SHA-256 of the source file (plus the compile flags), never into the source
tree: a fresh checkout always compiles for the *local* microarchitecture
(sources use -march=native), and editing a .cpp always triggers a rebuild —
mtime comparisons are unreliable after clone/checkout, where every file
shares the checkout timestamp.
"""

import ctypes
import hashlib
import os
import subprocess
import tempfile

_FLAGS = ["-O3", "-march=native", "-funroll-loops", "-shared", "-fPIC",
          "-std=c++17"]


def _cache_dir():
    d = os.environ.get("UPCC_NATIVE_CACHE") or os.path.join(
        os.path.expanduser("~"), ".cache", "upcc_tpu_native")
    os.makedirs(d, exist_ok=True)
    return d


def load_native(src_path, name):
    """Build (if needed) and dlopen the shared lib for ``src_path``.

    Returns a ctypes.CDLL. Raises on compile/load failure — callers decide
    whether to fall back to pure python.
    """
    with open(src_path, "rb") as f:
        digest = hashlib.sha256(f.read() + " ".join(_FLAGS).encode())
    lib_path = os.path.join(_cache_dir(),
                            f"{name}-{digest.hexdigest()[:16]}.so")
    if not os.path.exists(lib_path):
        # build to a temp name then atomic-rename so concurrent processes
        # never dlopen a half-written library
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=_cache_dir())
        os.close(fd)
        try:
            subprocess.run(["g++", *_FLAGS, src_path, "-o", tmp],
                           check=True, capture_output=True)
            os.replace(tmp, lib_path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    return ctypes.CDLL(lib_path)
