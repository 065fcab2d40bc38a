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


def _rotmat_rows(q):
    """Rotation matrix entries as 9 separate [...] arrays (row-major).

    Batched [..., 3, 3] matrices force XLA to run tiny 3x3 dot_generals —
    catastrophic on TPU (each matrix pads onto MXU tiles). Keeping the nine
    entries as flat vectors keeps everything on the VPU at full width.
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return (
        1.0 - 2.0 * (y * y + z * z),
        2.0 * (x * y - r * z),
        2.0 * (x * z + r * y),
        2.0 * (x * y + r * z),
        1.0 - 2.0 * (x * x + z * z),
        2.0 * (y * z - r * x),
        2.0 * (x * z - r * y),
        2.0 * (y * z + r * x),
        1.0 - 2.0 * (x * x + y * y),
    )


def _rot_diag_rot_t(q, d):
    """Packed symmetric R diag(d) R^T from component math (VPU-only).

    sigma_ik = sum_j R_ij d_j R_kj; six unique outputs.
    """
    m = _rotmat_rows(q)
    d0, d1, d2 = d[..., 0], d[..., 1], d[..., 2]
    rows = ((m[0], m[1], m[2]), (m[3], m[4], m[5]), (m[6], m[7], m[8]))

    def entry(i, k):
        a, b, c = rows[i]
        e, f, g = rows[k]
        return d0 * a * e + d1 * b * f + d2 * c * g

    return jnp.stack(
        [entry(0, 0), entry(0, 1), entry(0, 2),
         entry(1, 1), entry(1, 2), entry(2, 2)],
        axis=-1,
    )


def compute_cov3d(scales, scale_modifier, rotations):
    """World covariance Sigma = R diag(s^2) R^T, packed [..., 6].

    Reference: forward_common.h:149-183 (computeCov3D).
    """
    s2 = jnp.square(scales * scale_modifier)
    return _rot_diag_rot_t(rotations, s2)


def compute_inv_cov3d(scales, scale_modifier, rotations):
    """Inverse world covariance Sigma^-1 = R diag(1/s^2) R^T, packed [..., 6].

    The scale floor matches stopthepop_common.cuh:19-21 (effectively thickens
    degenerate Gaussians).
    """
    s = jnp.maximum(scales, INV_COV_SCALE_FLOOR) * scale_modifier
    inv_s2 = 1.0 / jnp.square(s)
    return _rot_diag_rot_t(rotations, inv_s2)


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
    # Projection Jacobian rows (the reference's third row is all-zero and is
    # dropped). Kept as component vectors — see _rotmat_rows for why no
    # [..., 2, 3] matrices.
    j00 = focal_x * inv_z
    j02 = -focal_x * tx * inv_z2
    j11 = focal_y * inv_z
    j12 = -focal_y * ty * inv_z2

    W = viewmatrix[:3, :3].T  # R_w2v, a single constant 3x3
    # T = J @ W: t_{il} = sum_m J_im W_ml with J sparse (J01 = J10 = 0).
    t0 = [j00 * W[0, l] + j02 * W[2, l] for l in range(3)]
    t1 = [j11 * W[1, l] + j12 * W[2, l] for l in range(3)]

    # cov = T Sigma T^T with packed symmetric Sigma.
    xx, xy, xz, yy, yz, zz = (cov3d[..., i] for i in range(6))

    def sigma_dot(v):  # Sigma @ v for component vector v
        return (
            xx * v[0] + xy * v[1] + xz * v[2],
            xy * v[0] + yy * v[1] + yz * v[2],
            xz * v[0] + yz * v[1] + zz * v[2],
        )

    s0 = sigma_dot(t0)
    c00 = t0[0] * s0[0] + t0[1] * s0[1] + t0[2] * s0[2]
    c01 = t1[0] * s0[0] + t1[1] * s0[1] + t1[2] * s0[2]
    s1 = sigma_dot(t1)
    c11 = t1[0] * s1[0] + t1[1] * s1[1] + t1[2] * s1[2]
    return jnp.stack([c00, c01, c11], axis=-1)


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
