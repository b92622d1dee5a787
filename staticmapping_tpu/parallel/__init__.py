"""Distributed / batched execution layer (SURVEY §2.9, §5.8).

Re-expresses the reference's thread-pool task parallelism
(builder/map_builder.cc:705-709, back_end/loop_detector.cc:224-228) as
batched jitted programs, sharded over a ``jax.sharding.Mesh`` when more
than one device is present.
"""
from .align_pairs import (align_pairs, align_pairs_sharded, align_pair_list,
                          make_submap_mesh, pad_pairs, stack_pairs)

__all__ = [
    "align_pairs", "align_pairs_sharded", "align_pair_list",
    "make_submap_mesh", "pad_pairs", "stack_pairs",
]
