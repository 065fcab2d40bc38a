"""Camera / projection transforms (pure jnp, fully differentiable).

Matrix convention matches the reference / torch-3DGS: ``viewmatrix`` and
``projmatrix`` are the transposed world-to-view / world-to-clip matrices, so a
point transforms as ``p_out = [p, 1] @ M``  (reference: auxiliary.h:130-149
``transformPoint4x3/4x4`` index with glm column-major over a row-major torch
tensor, which is exactly ``p @ M``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import NDC_W_EPS, NEAR_Z


def transform_point_4x3(p, m):
    """p [..., 3], m [4, 4] -> view-space point [..., 3].

    Reference: auxiliary.h:130-138. Full f32 precision: TPU matmuls round
    inputs to bf16 by default, which jitters projected positions by ~0.1 px
    — a real quality loss (and a 3e-2 image divergence vs CPU). These are
    K=3 contractions; the extra MXU passes are free at P-domain sizes.
    """
    return jnp.matmul(p, m[:3, :3],
                      precision=jax.lax.Precision.HIGHEST) + m[3, :3]


def transform_point_4x4(p, m):
    """p [..., 3], m [4, 4] -> homogeneous [..., 4]. auxiliary.h:140-149."""
    return jnp.matmul(p, m[:3, :],
                      precision=jax.lax.Precision.HIGHEST) + m[3, :]


def world2ndc(p_world, viewproj):
    """NDC coordinates with the reference's w-epsilon. auxiliary.h:83-90."""
    p_hom = transform_point_4x4(p_world, viewproj)
    rcp_w = 1.0 / (p_hom[..., 3:4] + NDC_W_EPS)
    return p_hom[..., :3] * rcp_w


def ndc2pix(v, size):
    """NDC [-1, 1] to continuous pixel coordinate. auxiliary.h:66-69."""
    return ((v + 1.0) * size - 1.0) * 0.5


def pix2world(pix, w, h, inverse_vp):
    """Pixel coordinate [..., 2] to the world-space point on the camera plane.

    Reference: auxiliary.h:71-81 (uses rows 0, 1, 3 of the torch-layout
    inverse view-projection matrix).
    """
    ndc_x = pix[..., 0] * (2.0 / w) - 1.0
    ndc_y = pix[..., 1] * (2.0 / h) - 1.0
    p = (
        ndc_x[..., None] * inverse_vp[0]
        + ndc_y[..., None] * inverse_vp[1]
        + inverse_vp[3]
    )
    return p[..., :3] / p[..., 3:4]


def compute_view_ray(pix, w, h, inverse_vp, campos):
    """Normalized world-space ray direction through a pixel.

    Reference: stopthepop_common.cuh:68-74 (computeViewRay).
    """
    p_world = pix2world(pix, w, h, inverse_vp)
    d = p_world - campos
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def in_frustum(means3d, viewmatrix):
    """Near-plane visibility plus view-space position.

    Reference: auxiliary.h:211-236 (``in_frustum``: only z > 0.2 is tested;
    the lateral NDC test is commented out upstream).

    Returns (visible [P] bool, p_view [P, 3]).
    """
    p_view = transform_point_4x3(means3d, viewmatrix)
    return p_view[..., 2] > NEAR_Z, p_view


def mark_visible(positions, viewmatrix, projmatrix):
    """Standalone frustum marking, reference rasterizer_impl.cu:161-173."""
    del projmatrix  # matches reference: only the view matrix is used
    visible, _ = in_frustum(positions, viewmatrix)
    return visible
