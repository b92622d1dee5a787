"""Native (C++) runtime components, loaded via ctypes.

The reference implements its runtime in C++ (TBB concurrent voxel maps,
thread pools, binary serialization); the TPU rebuild keeps the compute
path in JAX/XLA and uses C++ for the host-side runtime pieces where the
data-structure work dominates.  Libraries are compiled on first use with
g++ into this package's ``_build`` directory and cached; every consumer
has a pure-numpy fallback, so a missing toolchain degrades performance,
not functionality.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_BUILD = os.path.join(_DIR, "_build")
_lock = threading.Lock()
_cache = {}


def _compile(name: str) -> Optional[str]:
    src = os.path.join(_DIR, f"{name}.cpp")
    out = os.path.join(_BUILD, f"lib{name}.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    os.makedirs(_BUILD, exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", out]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return None
    return out


def load(name: str) -> Optional[ctypes.CDLL]:
    """Compile (if needed) and dlopen ``<name>.cpp``; None on failure."""
    with _lock:
        if name in _cache:
            return _cache[name]
        lib = None
        path = _compile(name)
        if path is not None:
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                lib = None
        _cache[name] = lib
        return lib
