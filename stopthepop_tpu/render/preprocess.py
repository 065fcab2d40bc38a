"""Per-Gaussian preprocessing: cull, project, color (pure jnp, differentiable).

TPU-native re-design of the reference preprocess kernel (forward.cu:68-229):
one fully-vectorized masked pass over all P Gaussians instead of one CUDA
thread per Gaussian with early returns. Invalid Gaussians keep flowing through
the math with ``valid=False`` (the analog of the reference's
RETURN_OR_INACTIVE, forward.cu:101) and are zeroed at the end.

Everything here is differentiable, so jax.grad replaces the hand-written
preprocess backward (backward.cu:146-434) entirely.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..config import GlobalSortOrder
from ..constants import ALPHA_THRESHOLD, EXTENT_SIGMA, MIN_LAMBDA, TILE_X, TILE_Y
from ..ops.covariance import (
    compute_cov3d,
    compute_inv_cov3d,
    conic_opacity,
    dilate_cov2d,
    compute_cov2d,
    unpack_sym3,
)
from ..ops.sh import eval_sh
from ..ops.stopthepop import pack_inv_cov3d_from_inv6
from ..ops.transforms import in_frustum, ndc2pix, world2ndc


class PreprocessOutput(NamedTuple):
    valid: jnp.ndarray          # [P] bool — survives all culling
    p_view: jnp.ndarray         # [P, 3] view-space position
    mean2d: jnp.ndarray         # [P, 2] pixel-space center
    depth: jnp.ndarray          # [P] global sort depth (z or distance)
    conic_opacity: jnp.ndarray  # [P, 4] (a, b, c, opacity)
    rgb: jnp.ndarray            # [P, 3]
    clamped: jnp.ndarray        # [P, 3] bool SH clamp mask
    radius: jnp.ndarray         # [P] float screen-space radius
    radii: jnp.ndarray          # [P] int32 ceil(radius), 0 if culled
    rect_dims: jnp.ndarray      # [P, 2] per-axis rect extents (pixels)
    rect_min: jnp.ndarray       # [P, 2] int32 tile-space rect min (inclusive)
    rect_max: jnp.ndarray       # [P, 2] int32 tile-space rect max (exclusive)
    tiles_touched: jnp.ndarray  # [P] int32 rect tile count (0 if culled)
    cov3d_inv9: jnp.ndarray     # [P, 9] packed Sigma^-1 + Sigma^-1(mu - cam)
    opacity_power_threshold: jnp.ndarray  # [P] log(opacity / alpha_thresh)


def get_rect(mean2d, rect_dims, grid_x: int, grid_y: int,
             tile_x: int = TILE_X, tile_y: int = TILE_Y):
    """Tile-space bounding rect of a screen-space extent box.

    Reference: auxiliary.h:91-101 (getRect) — min inclusive, max exclusive,
    both clamped to [0, grid].
    """
    lo = jnp.stack(
        [
            jnp.clip(jnp.floor((mean2d[..., 0] - rect_dims[..., 0]) / tile_x), 0, grid_x),
            jnp.clip(jnp.floor((mean2d[..., 1] - rect_dims[..., 1]) / tile_y), 0, grid_y),
        ],
        axis=-1,
    ).astype(jnp.int32)
    hi = jnp.stack(
        [
            jnp.clip(jnp.ceil((mean2d[..., 0] + rect_dims[..., 0]) / tile_x), 0, grid_x),
            jnp.clip(jnp.ceil((mean2d[..., 1] + rect_dims[..., 1]) / tile_y), 0, grid_y),
        ],
        axis=-1,
    ).astype(jnp.int32)
    return lo, hi


def preprocess(
    means3d: jnp.ndarray,
    opacities: jnp.ndarray,
    *,
    scales: Optional[jnp.ndarray] = None,
    rotations: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
    shs: Optional[jnp.ndarray] = None,
    colors_precomp: Optional[jnp.ndarray] = None,
    scale_modifier: float = 1.0,
    viewmatrix: jnp.ndarray,
    projmatrix: jnp.ndarray,
    campos: jnp.ndarray,
    tanfovx: float,
    tanfovy: float,
    image_width: int,
    image_height: int,
    sh_degree: int = 0,
    sort_order: GlobalSortOrder = GlobalSortOrder.Z_DEPTH,
    rect_bounding: bool = False,
    tight_opacity_bounding: bool = False,
    proper_ewa_scaling: bool = False,
    tile_x: int = TILE_X,
    tile_y: int = TILE_Y,
) -> PreprocessOutput:
    """Vectorized preprocess of all Gaussians. All flags are static.

    ``tile_x``/``tile_y`` set the binning tile (default 16x16 = reference
    parity, config.h:16-17; 32x16 shrinks the pair domain ~35%% on TPU).
    """
    P = means3d.shape[0]
    opacities = opacities.reshape(P)
    grid_x = (image_width + tile_x - 1) // tile_x
    grid_y = (image_height + tile_y - 1) // tile_y
    # Focal lengths from tan-fov, reference rasterizer_impl.cu:251-252.
    focal_y = image_height / (2.0 * tanfovy)
    focal_x = image_width / (2.0 * tanfovx)

    visible, p_view = in_frustum(means3d, viewmatrix)
    # Keep the math finite for culled Gaussians (z <= 0.2 would blow up 1/z).
    p_view_safe = jnp.where(
        visible[:, None], p_view, jnp.array([0.0, 0.0, 1.0], p_view.dtype)
    )

    if cov3d_precomp is not None:
        cov3d = cov3d_precomp
    else:
        cov3d = compute_cov3d(scales, scale_modifier, rotations)

    cov2d_raw = compute_cov2d(
        p_view_safe, focal_x, focal_y, tanfovx, tanfovy, cov3d, viewmatrix
    )
    cov2d, det, conv_factor = dilate_cov2d(cov2d_raw, proper_ewa_scaling)
    valid = visible & (det != 0.0)
    det_safe = jnp.where(det == 0.0, 1.0, det)

    co = conic_opacity(cov2d, opacities, det_safe, conv_factor)
    valid = valid & (co[:, 3] >= ALPHA_THRESHOLD)

    opw_safe = jnp.maximum(co[:, 3], ALPHA_THRESHOLD)
    opacity_power_threshold = jnp.log(opw_safe / ALPHA_THRESHOLD)

    if tight_opacity_bounding:
        extent = jnp.minimum(
            EXTENT_SIGMA, jnp.sqrt(2.0 * opacity_power_threshold)
        )
    else:
        extent = jnp.full_like(opacity_power_threshold, EXTENT_SIGMA)

    mid = 0.5 * (cov2d[:, 0] + cov2d[:, 2])
    lam = mid + jnp.sqrt(jnp.maximum(MIN_LAMBDA, mid * mid - det_safe))
    radius = extent * jnp.sqrt(lam)
    valid = valid & (radius > 0.0)

    p_proj = world2ndc(means3d, projmatrix)
    mean2d = jnp.stack(
        [ndc2pix(p_proj[:, 0], image_width), ndc2pix(p_proj[:, 1], image_height)],
        axis=-1,
    )

    if rect_bounding:
        # Per-axis bounding (forward.cu:173-175): tighter than the
        # radius-square for anisotropic Gaussians.
        ext_x = jnp.minimum(extent * jnp.sqrt(cov2d[:, 0]), radius)
        ext_y = jnp.minimum(extent * jnp.sqrt(cov2d[:, 2]), radius)
    else:
        ext_x = radius
        ext_y = radius
    rect_dims = jnp.stack([ext_x, ext_y], axis=-1)

    rect_min, rect_max = get_rect(mean2d, rect_dims, grid_x, grid_y, tile_x, tile_y)
    tile_count = jnp.prod(
        jnp.maximum(rect_max - rect_min, 0), axis=-1
    ).astype(jnp.int32)
    valid = valid & (tile_count > 0)

    if colors_precomp is not None:
        rgb = colors_precomp
        clamped = jnp.zeros((P, 3), dtype=bool)
    else:
        rgb, clamped = eval_sh(shs, means3d, campos, sh_degree)

    # Inverse covariance payload for per-ray depths. Prefer the scale/rot
    # path (has the reference's 1e-3 scale floor); fall back to inverting the
    # precomputed covariance.
    if scales is not None and rotations is not None:
        inv6 = compute_inv_cov3d(scales, scale_modifier, rotations)
        cov3d_inv9 = pack_inv_cov3d_from_inv6(inv6, means3d, campos)
    else:
        sigma = unpack_sym3(cov3d)
        inv = jnp.linalg.inv(
            sigma + 1e-8 * jnp.eye(3, dtype=sigma.dtype)
        )
        inv6 = jnp.stack(
            [
                inv[:, 0, 0], inv[:, 0, 1], inv[:, 0, 2],
                inv[:, 1, 1], inv[:, 1, 2], inv[:, 2, 2],
            ],
            axis=-1,
        )
        cov3d_inv9 = pack_inv_cov3d_from_inv6(inv6, means3d, campos)

    if sort_order == GlobalSortOrder.DISTANCE:
        depth = jnp.linalg.norm(means3d - campos, axis=-1)
    else:
        # VIEWSPACE_Z for Z_DEPTH and both per-tile-depth orders (the global
        # depth is unused for PTD_* but kept for parity, forward.cu:223).
        depth = p_view_safe[:, 2]

    radii = jnp.where(valid, jnp.ceil(radius), 0.0).astype(jnp.int32)
    tiles_touched = jnp.where(valid, tile_count, 0)

    return PreprocessOutput(
        valid=valid,
        p_view=p_view_safe,
        mean2d=mean2d,
        depth=depth,
        conic_opacity=co,
        rgb=rgb,
        clamped=clamped,
        radius=radius,
        radii=radii,
        rect_dims=rect_dims,
        rect_min=rect_min,
        rect_max=rect_max,
        tiles_touched=tiles_touched,
        cov3d_inv9=cov3d_inv9,
        opacity_power_threshold=opacity_power_threshold,
    )
