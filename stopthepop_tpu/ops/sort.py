"""Global (tile, depth) sort and tile-range identification (pure jnp).

TPU-native replacement for the reference's CUB DeviceRadixSort over packed
64-bit keys + identifyTileRanges kernel (rasterizer_impl.cu:37-52, 133-158,
344-362):

  * instead of packing ``tile_id << 32 | float_bits(depth)`` into a u64 we do
    a lexicographic two-key ``lax.sort`` ((tile, depth) pairs) — XLA's sort is
    a total order on floats, so no bit tricks are needed;
  * instead of a transition-detection kernel, per-tile [start, end) ranges
    come from two vectorized ``searchsorted`` calls on the sorted tile ids.

Invalid / unissued pair slots carry ``INVALID_TILE_ID`` which sorts after all
real tiles (the reference's own sentinel trick, stopthepop_common.cuh:504-508).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import INVALID_TILE_ID


def sort_pairs(tile_ids, depths, values):
    """Sort (tile, depth, value) triples by tile then depth.

    Args:
      tile_ids: [C] int32 (INVALID_TILE_ID for inactive slots).
      depths:   [C] float32.
      values:   [C] int32 Gaussian indices (or any int payload).

    Returns sorted (tile_ids, depths, values).
    """
    return jax.lax.sort((tile_ids, depths, values), num_keys=2)


def identify_tile_ranges(sorted_tile_ids, num_tiles: int):
    """Per-tile [start, end) ranges into the sorted pair list.

    Returns (starts [num_tiles], ends [num_tiles]) int32.
    """
    tids = jnp.arange(num_tiles, dtype=sorted_tile_ids.dtype)
    starts = jnp.searchsorted(sorted_tile_ids, tids, side="left")
    ends = jnp.searchsorted(sorted_tile_ids, tids, side="right")
    return starts.astype(jnp.int32), ends.astype(jnp.int32)


def is_valid_pair(tile_ids):
    return tile_ids != INVALID_TILE_ID
