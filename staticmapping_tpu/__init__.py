"""staticmapping_tpu — a TPU-native LiDAR SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
EdwardLiuyc/StaticMapping (see SURVEY.md): point-cloud pre-processing,
scan-to-submap registration (point-to-plane ICP / NDT), M2DP loop detection,
an incremental pose-graph back end, and probability-filtered static-map
generation — expressed as fixed-shape batched array programs that shard over
TPU meshes.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry everywhere in this library (pose products, point transforms,
# covariance solves) needs f32 matmuls.  On TPU the *default* matmul
# precision is bf16-in/f32-acc, whose ~2⁻⁸ input rounding is catastrophic
# for 4×4 pose chains and metre-scale point coordinates (a 50 m coordinate
# rounds by ~0.25 m).  Force full-f32 passes by default; the deliberately
# throughput-bound kernels (ops/nn_search.py) already pin their own
# precision explicitly, so this only affects small/accuracy-critical ops.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the remote-TPU AOT compiler takes tens of
# seconds per program, and a SLAM pipeline has ~10 distinct programs —
# cache them on disk so every process (tests, bench, CLI) after the first
# pays none of it.  Override dir with STATICMAPPING_TPU_CACHE; disable by
# setting it empty.
import os as _os

_cache_dir = _os.environ.get(
    "STATICMAPPING_TPU_CACHE",
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "..",
                  ".jax_cache"))
if _cache_dir:
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
