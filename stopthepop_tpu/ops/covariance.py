"""Gaussian covariance math (pure jnp, differentiable).

Re-derivations of forward_common.h (computeCov3D/computeCov2D/dilateCov2D/
computeConicOpacity) and stopthepop_common.cuh:13-41 (computeInvCov3D), in
standard row-vector math instead of glm column-major. ``jax.grad`` through
these replaces backward.cu:146-379 (computeCov2DCUDA + scale/rot backward).

Conventions:
  * quaternions are (r, x, y, z) and NOT normalized here — the reference also
    skips normalization (forward_common.h:158) and relies on the caller.
  * cov3d is packed upper-triangular: (xx, xy, xz, yy, yz, zz).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Covariance math is numerically sensitive (3x3 products feeding conics and
# gradients): force full f32 on the MXU instead of the TPU default bf16.
_HIGHEST = jax.lax.Precision.HIGHEST

from ..constants import (
    DILATION_H_VAR,
    EWA_DET_FLOOR,
    FOV_CLAMP,
    INV_COV_SCALE_FLOOR,
)


def quat_to_rotmat(q):
    """Standard rotation matrix from (r, x, y, z) quaternion [..., 4] -> [..., 3, 3].

    Matches the reference's effective world rotation: forward_common.h:165-169
    builds R in glm column-major; composed through Sigma = R S^2 R^T this is
    the standard formula below.
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack(
                [
                    1.0 - 2.0 * (y * y + z * z),
                    2.0 * (x * y - r * z),
                    2.0 * (x * z + r * y),
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    2.0 * (x * y + r * z),
                    1.0 - 2.0 * (x * x + z * z),
                    2.0 * (y * z - r * x),
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    2.0 * (x * z - r * y),
                    2.0 * (y * z + r * x),
                    1.0 - 2.0 * (x * x + y * y),
                ],
                axis=-1,
            ),
        ],
        axis=-2,
    )


def _pack_sym3(m):
    """[..., 3, 3] symmetric -> packed (xx, xy, xz, yy, yz, zz) [..., 6]."""
    return jnp.stack(
        [
            m[..., 0, 0],
            m[..., 0, 1],
            m[..., 0, 2],
            m[..., 1, 1],
            m[..., 1, 2],
            m[..., 2, 2],
        ],
        axis=-1,
    )


def unpack_sym3(c):
    """Packed [..., 6] -> full symmetric [..., 3, 3]."""
    xx, xy, xz, yy, yz, zz = (c[..., i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], axis=-1),
            jnp.stack([xy, yy, yz], axis=-1),
            jnp.stack([xz, yz, zz], axis=-1),
        ],
        axis=-2,
    )


def compute_cov3d(scales, scale_modifier, rotations):
    """World covariance Sigma = R diag(s^2) R^T, packed [..., 6].

    Reference: forward_common.h:149-183 (computeCov3D).
    """
    R = quat_to_rotmat(rotations)
    s2 = jnp.square(scales * scale_modifier)
    sigma = jnp.einsum("...ij,...j,...kj->...ik", R, s2, R, precision=_HIGHEST)
    return _pack_sym3(sigma)


def compute_inv_cov3d(scales, scale_modifier, rotations):
    """Inverse world covariance Sigma^-1 = R diag(1/s^2) R^T, packed [..., 6].

    The scale floor matches stopthepop_common.cuh:19-21 (effectively thickens
    degenerate Gaussians).
    """
    R = quat_to_rotmat(rotations)
    s = jnp.maximum(scales, INV_COV_SCALE_FLOOR) * scale_modifier
    inv_s2 = 1.0 / jnp.square(s)
    inv = jnp.einsum("...ij,...j,...kj->...ik", R, inv_s2, R, precision=_HIGHEST)
    return _pack_sym3(inv)


def compute_cov2d(p_view, focal_x, focal_y, tan_fovx, tan_fovy, cov3d, viewmatrix):
    """EWA-splatting 2D covariance (before dilation), [..., 3] = (xx, xy, yy).

    Reference: forward_common.h:72-106 (computeCov2D). In row-vector math the
    composition is  cov2d = J R_w2v Sigma R_w2v^T J^T  with the clamped-view
    Jacobian J and R_w2v = viewmatrix[:3,:3]^T (viewmatrix is the transposed
    world-to-view matrix).
    """
    tx, ty, tz = p_view[..., 0], p_view[..., 1], p_view[..., 2]
    limx = FOV_CLAMP * tan_fovx
    limy = FOV_CLAMP * tan_fovy
    tx = jnp.clip(tx / tz, -limx, limx) * tz
    ty = jnp.clip(ty / tz, -limy, limy) * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    zeros = jnp.zeros_like(tz)
    # J: [..., 2, 3] projection Jacobian (third output row is all-zero in the
    # reference and contributes nothing, so it is dropped).
    J = jnp.stack(
        [
            jnp.stack([focal_x * inv_z, zeros, -focal_x * tx * inv_z2], axis=-1),
            jnp.stack([zeros, focal_y * inv_z, -focal_y * ty * inv_z2], axis=-1),
        ],
        axis=-2,
    )
    W = viewmatrix[:3, :3].T  # R_w2v
    T = jnp.matmul(J, W, precision=_HIGHEST)  # [..., 2, 3]
    sigma = unpack_sym3(cov3d)
    cov = jnp.matmul(jnp.matmul(T, sigma, precision=_HIGHEST), jnp.swapaxes(T, -1, -2), precision=_HIGHEST)
    return jnp.stack([cov[..., 0, 0], cov[..., 0, 1], cov[..., 1, 1]], axis=-1)


def dilate_cov2d(cov2d, proper_ewa_scaling: bool):
    """Low-pass dilation (+0.3 px variance) and Mip-Splatting compensation.

    Reference: forward_common.h:108-131 (dilateCov2D).

    Returns (dilated cov2d [..., 3], det_dilated [...], scaling factor [...]).
    """
    xx = cov2d[..., 0] + DILATION_H_VAR
    xy = cov2d[..., 1]
    yy = cov2d[..., 2] + DILATION_H_VAR
    det_dilated = xx * yy - xy * xy
    if proper_ewa_scaling:
        det_orig = cov2d[..., 0] * cov2d[..., 2] - cov2d[..., 1] * cov2d[..., 1]
        factor = jnp.sqrt(jnp.maximum(EWA_DET_FLOOR, det_orig / det_dilated))
    else:
        factor = jnp.ones_like(det_dilated)
    return jnp.stack([xx, xy, yy], axis=-1), det_dilated, factor


def conic_opacity(cov2d, opacity, det, convolution_scaling_factor):
    """Invert the 2D covariance into a conic, fused with opacity [..., 4].

    Reference: forward_common.h:133-144 (computeConicOpacity).
    """
    det_inv = 1.0 / det
    return jnp.stack(
        [
            cov2d[..., 2] * det_inv,
            -cov2d[..., 1] * det_inv,
            cov2d[..., 0] * det_inv,
            opacity * convolution_scaling_factor,
        ],
        axis=-1,
    )
