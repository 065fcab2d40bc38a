"""Synthetic scenes and cameras for tests and benchmarks.

Camera matrices follow the torch-3DGS convention the reference expects
(transposed world-to-view / world-to-clip; see config.py docstring).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Camera(NamedTuple):
    viewmatrix: jnp.ndarray        # [4, 4] transposed world-to-view
    projmatrix: jnp.ndarray        # [4, 4] transposed world-to-clip (full)
    inv_viewprojmatrix: jnp.ndarray  # [4, 4]
    campos: jnp.ndarray            # [3]
    tanfovx: float
    tanfovy: float
    width: int
    height: int


def make_camera(
    width: int,
    height: int,
    fovx_deg: float = 60.0,
    campos=(0.0, 0.0, -4.0),
    znear: float = 0.01,
    zfar: float = 100.0,
) -> Camera:
    """Axis-aligned camera at ``campos`` looking along +z (identity rotation)."""
    tanfovx = math.tan(math.radians(fovx_deg) / 2.0)
    tanfovy = tanfovx * height / width
    c = np.asarray(campos, dtype=np.float32)

    # world-to-view (math convention): p_view = p - c.
    w2v = np.eye(4, dtype=np.float32)
    w2v[:3, 3] = -c

    proj = np.zeros((4, 4), dtype=np.float32)
    proj[0, 0] = 1.0 / tanfovx
    proj[1, 1] = 1.0 / tanfovy
    proj[2, 2] = zfar / (zfar - znear)
    proj[2, 3] = -(zfar * znear) / (zfar - znear)
    proj[3, 2] = 1.0

    full = proj @ w2v
    viewmatrix = jnp.asarray(w2v.T)
    projmatrix = jnp.asarray(full.T)
    inv_vp = jnp.asarray(np.linalg.inv(full).T)
    return Camera(
        viewmatrix=viewmatrix,
        projmatrix=projmatrix,
        inv_viewprojmatrix=inv_vp,
        campos=jnp.asarray(c),
        tanfovx=tanfovx,
        tanfovy=tanfovy,
        width=width,
        height=height,
    )


class Scene(NamedTuple):
    means3d: jnp.ndarray    # [P, 3]
    scales: jnp.ndarray     # [P, 3]
    rotations: jnp.ndarray  # [P, 4] normalized (r, x, y, z)
    opacities: jnp.ndarray  # [P]
    shs: jnp.ndarray        # [P, 16, 3]
    colors: jnp.ndarray     # [P, 3] precomputed alternative


def random_scene(key, num_gaussians: int, extent: float = 1.5, scale_range=(0.01, 0.12)) -> Scene:
    ks = jax.random.split(key, 6)
    means = jax.random.uniform(
        ks[0], (num_gaussians, 3), minval=-extent, maxval=extent
    )
    log_lo, log_hi = math.log(scale_range[0]), math.log(scale_range[1])
    scales = jnp.exp(
        jax.random.uniform(ks[1], (num_gaussians, 3), minval=log_lo, maxval=log_hi)
    )
    q = jax.random.normal(ks[2], (num_gaussians, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    opac = jax.random.uniform(ks[3], (num_gaussians,), minval=0.2, maxval=0.95)
    shs = 0.3 * jax.random.normal(ks[4], (num_gaussians, 16, 3))
    colors = jax.random.uniform(ks[5], (num_gaussians, 3))
    return Scene(means, scales, q, opac, shs, colors)


def bucket_pair_capacity(prep) -> int:
    """Pair capacity bucketized to a power of two (min 2048).

    For tests: a scene-exact capacity gives every test a distinct payload
    shape, so no two tests can share a compiled executable (or a
    persistent-cache entry). Rounding UP to a coarse bucket is always
    correct (padding is masked) and collapses the shape space.
    """
    from ..render.duplicate import count_pairs

    n = int(count_pairs(prep)) + 64
    cap = 2048
    while cap < n:
        cap *= 2
    return cap
