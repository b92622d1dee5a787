"""staticmapping_tpu — a TPU-native LiDAR SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
EdwardLiuyc/StaticMapping (see SURVEY.md): point-cloud pre-processing,
scan-to-submap registration (point-to-plane ICP / NDT), M2DP loop detection,
an incremental pose-graph back end, and probability-filtered static-map
generation — expressed as fixed-shape batched array programs that shard over
TPU meshes.
"""

__version__ = "0.1.0"
