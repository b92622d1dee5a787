"""Nearest-neighbor search as tiled dense distance computation.

TPU-native replacement for the reference's libnabo kd-trees
(registrators/icp_fast.cc:466-468, FindClosests cc:169-180). kd-trees are
pointer-chasing and hostile to TPU; instead we compute distances with the
MXU:  ``d²(q, t) = |q|² + |t|² − 2 q·t``  tiled over the target so the
``[M, T]`` block stays bounded, with a running min/top-k carried through a
``lax.scan``.

Accuracy note: the cross term runs at ``precision=HIGHEST`` and callers
should demean clouds first (the reference demeans its target too,
icp_fast.cc:457-463) so f32 cancellation error stays ~1e-4 m² or better.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

# Far-away coordinate used for invalid/padded points.
_FAR = 1.0e6
_INF = jnp.inf


def _dist2_block(query: jax.Array, target_tile: jax.Array) -> jax.Array:
    """``[M, 3] × [T, 3] → [M, T]`` squared distances on the MXU."""
    q2 = jnp.sum(query * query, axis=-1, keepdims=True)            # [M, 1]
    t2 = jnp.sum(target_tile * target_tile, axis=-1)[None, :]      # [1, T]
    cross = jnp.dot(query, target_tile.T,
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)               # [M, T]
    return jnp.maximum(q2 + t2 - 2.0 * cross, 0.0)


@partial(jax.jit, static_argnames=("tile",))
def nearest_1(query: jax.Array, target: jax.Array, target_mask: jax.Array,
              tile: int = 1024):
    """1-NN of every query point in target.

    Args:
      query: ``[M, 3]`` (masked-out queries may hold garbage; result for them
        is meaningless and must be masked by the caller).
      target: ``[N, 3]``; ``target_mask``: ``[N] bool``.
    Returns:
      ``(d2 [M], idx [M])`` squared distance and target index of the nearest
      valid target point.
    """
    n = target.shape[0]
    assert n % tile == 0, f"target capacity {n} not divisible by tile {tile}"
    tgt = jnp.where(target_mask[:, None], target,
                    jnp.full_like(target, _FAR))
    tgt_tiles = tgt.reshape(n // tile, tile, 3)
    mask_tiles = target_mask.reshape(n // tile, tile)

    m = query.shape[0]
    init = (jnp.full((m,), _INF, dtype=jnp.float32),
            jnp.zeros((m,), dtype=jnp.int32))

    def body(carry, inputs):
        best_d, best_i = carry
        t_tile, m_tile, tile_idx = inputs
        d2 = _dist2_block(query, t_tile)
        d2 = jnp.where(m_tile[None, :], d2, _INF)
        tile_best = jnp.min(d2, axis=1)
        tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + tile_idx * tile
        take = tile_best < best_d
        return (jnp.where(take, tile_best, best_d),
                jnp.where(take, tile_arg, best_i)), None

    (best_d, best_i), _ = lax.scan(
        body, init,
        (tgt_tiles, mask_tiles, jnp.arange(n // tile, dtype=jnp.int32)))
    return best_d, best_i


@partial(jax.jit, static_argnames=("k", "tile"))
def knn(query: jax.Array, target: jax.Array, target_mask: jax.Array,
        k: int, tile: int = 1024):
    """k-NN: returns ``(d2 [M, k], idx [M, k])`` sorted ascending by d2."""
    n = target.shape[0]
    assert n % tile == 0
    tgt = jnp.where(target_mask[:, None], target,
                    jnp.full_like(target, _FAR))
    tgt_tiles = tgt.reshape(n // tile, tile, 3)
    mask_tiles = target_mask.reshape(n // tile, tile)

    m = query.shape[0]
    init = (jnp.full((m, k), _INF, dtype=jnp.float32),
            jnp.zeros((m, k), dtype=jnp.int32))

    def body(carry, inputs):
        best_d, best_i = carry
        t_tile, m_tile, tile_idx = inputs
        d2 = _dist2_block(query, t_tile)
        d2 = jnp.where(m_tile[None, :], d2, _INF)
        idx = jnp.broadcast_to(
            jnp.arange(tile, dtype=jnp.int32)[None, :] + tile_idx * tile,
            d2.shape)
        cat_d = jnp.concatenate([best_d, d2], axis=1)
        cat_i = jnp.concatenate([best_i, idx], axis=1)
        neg_top, top_pos = lax.top_k(-cat_d, k)
        return (-neg_top, jnp.take_along_axis(cat_i, top_pos, axis=1)), None

    (best_d, best_i), _ = lax.scan(
        body, init,
        (tgt_tiles, mask_tiles, jnp.arange(n // tile, dtype=jnp.int32)))
    return best_d, best_i


def masked_quantile(values: jax.Array, mask: jax.Array, q) -> jax.Array:
    """Quantile over the valid entries, matching the reference's
    ``GetDistsQuantile`` exactly: sorted[floor(count * q)]
    (icp_fast.cc:65-90 uses nth_element at index size*quantile).
    """
    big = jnp.where(mask, values, _INF)
    s = jnp.sort(big)
    count = jnp.sum(mask)
    idx = jnp.clip((count * q).astype(jnp.int32), 0, values.shape[0] - 1)
    idx = jnp.minimum(idx, jnp.maximum(count - 1, 0))
    return s[idx]
