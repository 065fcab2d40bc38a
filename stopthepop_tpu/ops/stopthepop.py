"""StopThePop core math: per-ray depths and tile power bounds (pure jnp).

Re-derivations of cuda_rasterizer/stopthepop/stopthepop_common.cuh:
  * depth_along_ray        — :44-66
  * evaluate_opacity(_factor) — :76-84
  * max_contrib_power_rect — :130-174 (the float variant used in kernels)
  * per_tile_depth_target  — :309-322 + :439-453 (tile_function)

Packing convention for the inverse covariance ("cov3d_inv9" [..., 9]):
rows (xx, xy, xz), (yy, yz, zz), u = Sigma^-1 (mean - campos) — same payload
as the reference's 3x float4 (forward.cu:208-220) minus the padding lanes.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import (
    PER_TILE_DEPTH_BIAS,
    RAY_DEPTH_DEN_FLOOR,
    TILE_X,
    TILE_Y,
)
from .covariance import compute_inv_cov3d
from .transforms import pix2world


def pack_inv_cov3d(scales, scale_modifier, rotations, means3d, campos):
    """[..., 9] packed Sigma^-1 rows + Sigma^-1(mean-campos).

    Reference: forward.cu:208-220 (the negated product -Sigma^-1(campos-mean)
    is stored, i.e. Sigma^-1 (mean - campos)).
    """
    inv6 = compute_inv_cov3d(scales, scale_modifier, rotations)
    return pack_inv_cov3d_from_inv6(inv6, means3d, campos)


def pack_inv_cov3d_from_inv6(inv6, means3d, campos):
    """Same as pack_inv_cov3d but from an already-computed packed Sigma^-1.

    The symmetric matrix-vector product is written in component form — a
    batched [..., 3, 3] einsum lowers to tiny per-row dots that strand the
    TPU's vector unit (see covariance._rotmat_rows).
    """
    xx, xy, xz, yy, yz, zz = (inv6[..., i] for i in range(6))
    v = means3d - campos
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    u = jnp.stack(
        [
            xx * vx + xy * vy + xz * vz,
            xy * vx + yy * vy + yz * vz,
            xz * vx + yz * vy + zz * vz,
        ],
        axis=-1,
    )
    return jnp.concatenate([inv6, u], axis=-1)


def depth_along_ray(cov3d_inv9, viewdir):
    """Depth of the max-contribution point of a Gaussian along a world ray.

    t* = (u . d) / (d^T Sigma^-1 d), with the reference's denominator floor
    (stopthepop_common.cuh:44-55). Broadcasts over leading dims.
    """
    xx, xy, xz, yy, yz, zz = (cov3d_inv9[..., i] for i in range(6))
    ux, uy, uz = (cov3d_inv9[..., 6 + i] for i in range(3))
    dx, dy, dz = viewdir[..., 0], viewdir[..., 1], viewdir[..., 2]
    num = ux * dx + uy * dy + uz * dz
    den = (
        xx * dx * dx
        + yy * dy * dy
        + zz * dz * dz
        + 2.0 * (xy * dx * dy + xz * dx * dz + yz * dy * dz)
    )
    return num / jnp.maximum(RAY_DEPTH_DEN_FLOOR, den)


def evaluate_opacity_factor(dx, dy, conic):
    """0.5 (a dx^2 + c dy^2) + b dx dy. stopthepop_common.cuh:76-79."""
    return 0.5 * (conic[..., 0] * dx * dx + conic[..., 2] * dy * dy) + conic[
        ..., 1
    ] * dx * dy


def evaluate_opacity(dx, dy, conic_opac):
    """opacity * exp(-factor). stopthepop_common.cuh:81-84."""
    return conic_opac[..., 3] * jnp.exp(
        -evaluate_opacity_factor(dx, dy, conic_opac)
    )


def max_contrib_power_rect(
    conic_opac, mean2d, rect_min, rect_max, patch_w=TILE_X - 1, patch_h=TILE_Y - 1
):
    """Minimum Gaussian power over an axis-aligned pixel rect.

    Branch-free form of stopthepop_common.cuh:130-174
    (max_contrib_power_rect_gaussian_float): clamp the 1D line parameter from
    the nearest rect corner along each edge. Returns
    (max_contrib_power [...], max_pos [..., 2]). Power 0 means the mean lies
    inside the rect.
    """
    mx, my = mean2d[..., 0], mean2d[..., 1]
    co_x, co_y, co_z = conic_opac[..., 0], conic_opac[..., 1], conic_opac[..., 2]

    x_left = (rect_min[..., 0] - mx) > 0.0
    y_above = (rect_min[..., 1] - my) > 0.0
    not_in_x = x_left | (mx > rect_max[..., 0])
    not_in_y = y_above | (my > rect_max[..., 1])
    outside = not_in_x | not_in_y

    px = jnp.where(x_left, rect_min[..., 0], rect_max[..., 0])
    py = jnp.where(y_above, rect_min[..., 1], rect_max[..., 1])
    dx = jnp.where(x_left, float(patch_w), -float(patch_w))
    dy = jnp.where(y_above, float(patch_h), -float(patch_h))

    diffx = mx - px
    diffy = my - py

    tx = jnp.where(
        not_in_y,
        jnp.clip((dx * co_x * diffx + dx * co_y * diffy) / (dx * dx * co_x), 0.0, 1.0),
        0.0,
    )
    ty = jnp.where(
        not_in_x,
        jnp.clip((dy * co_y * diffx + dy * co_z * diffy) / (dy * dy * co_z), 0.0, 1.0),
        0.0,
    )
    cand_x = px + tx * dx
    cand_y = py + ty * dy
    max_x = jnp.where(outside, cand_x, mx)
    max_y = jnp.where(outside, cand_y, my)

    power = jnp.where(
        outside,
        evaluate_opacity_factor(mx - max_x, my - max_y, conic_opac),
        0.0,
    )
    return power, jnp.stack([max_x, max_y], axis=-1)


def tile_rect_bounds(tx, ty, tile_x=TILE_X, tile_y=TILE_Y):
    """Pixel-space (min, max) corners of tile (tx, ty) as used for culling.

    Reference: stopthepop_common.cuh:429-430 — max corner is inclusive
    ((x+1)*16 - 1).
    """
    tile_min = jnp.stack([tx * tile_x, ty * tile_y], axis=-1).astype(jnp.float32)
    tile_max = jnp.stack(
        [(tx + 1) * tile_x - 1, (ty + 1) * tile_y - 1], axis=-1
    ).astype(jnp.float32)
    return tile_min, tile_max


def per_tile_depth(
    target_pos, cov3d_inv9, campos, w, h, inverse_vp
):
    """Per-tile sort depth: ray through target_pos, biased and floored.

    Reference: stopthepop_common.cuh:439-453 —
    depth = max(0, depthAlongRay(ray to target) + 8).
    """
    p_world = pix2world(target_pos, w, h, inverse_vp)
    d = p_world - campos
    viewdir = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.maximum(0.0, depth_along_ray(cov3d_inv9, viewdir) + PER_TILE_DEPTH_BIAS)
