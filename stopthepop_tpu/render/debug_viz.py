"""Debug visualization subsystem.

Mirror of the reference's DebugVisualization pipeline (rasterizer_debug.h:
11-56, applyDebugVisualization rasterizer_impl.cu:54-109, colormap render
forward.cu:674-729): six scalar-field modes, min/max/mean/std statistics, an
optional data callback for GUI pixel probing, and in-place colormap rendering
— magma for counts/errors/transmittance, turbo for depth.

TPU design notes:
  * Depth and Transmittance come from the production kernels for free (the
    packed tile output carries final_T and the w*depth accumulator — the
    reference's ENABLE_DEBUG_VIZ accumulation, stopthepop_common.cuh:277-298).
  * GaussianCountPerTile reads the per-tile pair ranges (the sorted
    duplication list), GaussianCountPerPixel the committed-contributor count.
  * The sort-error modes (the paper's popping-artifact metric,
    stopthepop_common.cuh:264-282) are computed by a vectorized jnp pass over
    the GLOBAL blend order: per pixel, a committed-contribution running max
    of per-ray depth; error = opacity- (or depth-gap-) weighted mass blended
    out of order. O(P x pixels) — a diagnostics path, like the reference's
    which is also compiled out of production kernels.
  * Colormap tables are generated from matplotlib's public magma/turbo data
    at import (256-entry lookup), with linear-ramp fallbacks.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DebugVisualization
from ..constants import TILE_X, TILE_Y
from ..ops.stopthepop import depth_along_ray
from ..ops.transforms import compute_view_ray
from .naive import _alpha, _pixel_grid
from .preprocess import PreprocessOutput


def _make_table(name: str) -> np.ndarray:
    try:
        import matplotlib.pyplot as plt

        cmap = plt.get_cmap(name)
        return np.asarray([cmap(i / 255.0)[:3] for i in range(256)],
                          dtype=np.float32)
    except Exception:
        ramp = np.linspace(0.0, 1.0, 256, dtype=np.float32)
        return np.stack([ramp, ramp * 0.5, 1.0 - ramp], axis=1)


MAGMA_TABLE = _make_table("magma")
TURBO_TABLE = _make_table("turbo")


def apply_colormap(x01: jnp.ndarray, table: np.ndarray) -> jnp.ndarray:
    """x01 [H, W] in [0, 1] -> [3, H, W] colormapped image."""
    idx = jnp.clip((x01 * 255.0).astype(jnp.int32), 0, 255)
    return jnp.transpose(jnp.asarray(table)[idx], (2, 0, 1))


@dataclass
class DebugVisualizationData:
    """Mirror of the reference's DebugVisualizationData
    (rasterizer_debug.h:43-56)."""

    debug_pixel: Optional[tuple] = None   # (x, y) probe
    data_callback: Optional[Callable] = None
    minimum: float = 0.0
    maximum: float = 0.0
    mean: float = 0.0
    std: float = 0.0
    debug_pixel_value: float = 0.0
    timings_text: str = ""


def field_stats(field: jnp.ndarray):
    return (
        jnp.min(field), jnp.max(field), jnp.mean(field), jnp.std(field)
    )


def normalize_field(field: jnp.ndarray, lo=None, hi=None):
    lo = jnp.min(field) if lo is None else lo
    hi = jnp.max(field) if hi is None else hi
    return (field - lo) / jnp.maximum(hi - lo, 1e-12)


def sort_error_maps(
    prep: PreprocessOutput,
    width: int,
    height: int,
    campos: jnp.ndarray,
    inverse_vp: jnp.ndarray,
    sort_order=None,
):
    """(error_opacity [H, W], error_distance [H, W]) of a GLOBAL-mode order.

    Per pixel, contributions are replayed in the mode's stream order
    (``sort_order``: Z_DEPTH default, PTD_CENTER / PTD_MAX per-tile keys);
    whenever a committed contribution has a smaller per-ray depth than the
    running maximum of prior committed contributions, its opacity (resp.
    its depth gap, opacity-weighted) is accumulated — the paper's measure
    of how much mass is blended out of order. The resort modes' maps come
    from their oracles (naive.render_{kbuffer,hierarchical}_naive with
    sort_error=True), which replay the actual pop order.
    """
    from ..config import GlobalSortOrder
    from .naive import pair_stream_keys

    if sort_order is None:
        sort_order = GlobalSortOrder.Z_DEPTH
    N = width * height
    pix = _pixel_grid(width, height)
    pix_tile = jnp.stack(
        [
            (pix[:, 0] // TILE_X).astype(jnp.int32),
            (pix[:, 1] // TILE_Y).astype(jnp.int32),
        ],
        axis=-1,
    )

    alpha, skip = _alpha(prep.conic_opacity, prep.mean2d, pix)
    in_rect = (
        (pix_tile[None, :, 0] >= prep.rect_min[:, None, 0])
        & (pix_tile[None, :, 0] < prep.rect_max[:, None, 0])
        & (pix_tile[None, :, 1] >= prep.rect_min[:, None, 1])
        & (pix_tile[None, :, 1] < prep.rect_max[:, None, 1])
    )
    a_eff = jnp.where(
        skip | ~in_rect | ~prep.valid[:, None], 0.0, alpha
    )
    stream_key = pair_stream_keys(
        prep, pix_tile, sort_order, campos, inverse_vp, width, height
    )  # [P, N] ([P, 1]-broadcast for the depth orders)
    stream_key = jnp.where(a_eff > 0.0, stream_key, jnp.inf)
    stream_key = jnp.broadcast_to(stream_key, a_eff.shape)
    order = jnp.argsort(stream_key, axis=0, stable=True)  # [P, N]
    a_eff = jnp.take_along_axis(a_eff, order, axis=0)
    viewdir = compute_view_ray(pix, width, height, inverse_vp, campos)
    ray_d = depth_along_ray(
        prep.cov3d_inv9[:, None, :], viewdir[None, :, :]
    )  # [P, N]
    ray_d = jnp.take_along_axis(ray_d, order, axis=0)

    # Committed mask via the masked-cumprod transmittance recurrence.
    from ..constants import T_THRESHOLD

    logU = jnp.cumsum(jnp.log1p(-a_eff), axis=0)
    U = jnp.exp(logU)
    commit = (U >= T_THRESHOLD) & (a_eff > 0.0)

    d_masked = jnp.where(commit, ray_d, -jnp.inf)
    cummax = jax.lax.associative_scan(jnp.maximum, d_masked, axis=0)
    prior_max = jnp.concatenate(
        [jnp.full((1, N), -jnp.inf), cummax[:-1]], axis=0
    )
    # Tie handling and weighting follow the reference exactly
    # (stopthepop_common.cuh:264-282): tied depths count as out-of-order
    # (depth <= currentMaxDepth), the opacity error adds the contribution's
    # alpha, and the distance error adds the UNWEIGHTED depth gap — so the
    # per-mode tables in benchmarks/quality.py compare like with like
    # against the naive oracles' pop-order accumulation (round-4 advice).
    out_of_order = commit & (ray_d <= prior_max)
    err_op = jnp.sum(jnp.where(out_of_order, a_eff, 0.0), axis=0)
    err_dist = jnp.sum(
        jnp.where(out_of_order, prior_max - ray_d, 0.0), axis=0
    )
    return err_op.reshape(height, width), err_dist.reshape(height, width)


def tile_count_map(pair_counts: jnp.ndarray, width: int, height: int):
    """Per-pixel value = pair count of the pixel's tile. [H, W]."""
    grid_x = (width + TILE_X - 1) // TILE_X
    grid_y = (height + TILE_Y - 1) // TILE_Y
    per_tile = pair_counts.reshape(grid_y, grid_x).astype(jnp.float32)
    full = jnp.repeat(jnp.repeat(per_tile, TILE_Y, axis=0), TILE_X, axis=1)
    return full[:height, :width]


def apply_debug_visualization(
    mode: DebugVisualization,
    *,
    final_t: jnp.ndarray,             # [H, W]
    n_contrib: jnp.ndarray,           # [H, W]
    depth_acc: Optional[jnp.ndarray] = None,   # [H, W] sum(w * depth)
    pair_counts: Optional[jnp.ndarray] = None,  # [num_tiles]
    prep: Optional[PreprocessOutput] = None,
    campos=None,
    inverse_vp=None,
    width: int = 0,
    height: int = 0,
    data: Optional[DebugVisualizationData] = None,
):
    """Scalar field -> stats -> colormapped [3, H, W] image.

    The reference's applyDebugVisualization post-pass
    (rasterizer_impl.cu:54-109): compute the per-pixel scalar field for
    ``mode``, record min/max/mean/std (and the probe pixel) into ``data``,
    invoke its callback, and return the colormap rendering.
    """
    mode = DebugVisualization(mode)
    table = MAGMA_TABLE
    if mode == DebugVisualization.Depth:
        # Expected depth of the blended mass (turbo, like the reference).
        field = depth_acc / jnp.maximum(1.0 - final_t, 1e-6)
        table = TURBO_TABLE
    elif mode == DebugVisualization.Transmittance:
        field = final_t
    elif mode == DebugVisualization.GaussianCountPerPixel:
        field = n_contrib.astype(jnp.float32)
    elif mode == DebugVisualization.GaussianCountPerTile:
        field = tile_count_map(pair_counts, width, height)
    elif mode in (
        DebugVisualization.SortErrorOpacity,
        DebugVisualization.SortErrorDistance,
    ):
        err_op, err_dist = sort_error_maps(
            prep, width, height, campos, inverse_vp
        )
        field = (
            err_op if mode == DebugVisualization.SortErrorOpacity else err_dist
        )
    else:
        raise ValueError(f"not a renderable debug mode: {mode}")

    lo, hi, mean, std = field_stats(field)
    if data is not None:
        try:  # host-side stats: best effort, requires eager values
            data.minimum = float(lo)
            data.maximum = float(hi)
            data.mean = float(mean)
            data.std = float(std)
            if data.debug_pixel is not None:
                x, y = data.debug_pixel
                data.debug_pixel_value = float(field[y, x])
            if data.data_callback is not None:
                data.data_callback(data)
        except jax.errors.TracerArrayConversionError:
            pass
    return apply_colormap(normalize_field(field, lo, hi), table)
