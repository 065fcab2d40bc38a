"""GaussianModel: the trainable 3DGS parameter pytree.

The reference repo is only the rasterizer; its consuming trainer holds the
parameters (means, log-scales, quaternions, opacity logits, SH coefficients)
with the standard 3DGS activations. This module supplies that model family so
the framework is usable standalone (BASELINE config 4).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


class GaussianModel(NamedTuple):
    """Raw (pre-activation) parameters. All leaves are [P, ...] arrays."""

    means3d: jnp.ndarray        # [P, 3]
    scales_log: jnp.ndarray     # [P, 3] log-scales
    rotations: jnp.ndarray      # [P, 4] unnormalized quaternions (r, x, y, z)
    opacity_logit: jnp.ndarray  # [P]
    sh_dc: jnp.ndarray          # [P, 1, 3]
    sh_rest: jnp.ndarray        # [P, M-1, 3]

    @property
    def num_gaussians(self) -> int:
        return self.means3d.shape[0]

    # -- activations (standard 3DGS) --
    def scales(self):
        return jnp.exp(self.scales_log)

    def opacities(self):
        return jax.nn.sigmoid(self.opacity_logit)

    def rotations_normalized(self):
        return self.rotations / jnp.linalg.norm(
            self.rotations, axis=-1, keepdims=True
        )

    def shs(self):
        return jnp.concatenate([self.sh_dc, self.sh_rest], axis=1)


def init_random(key, num_gaussians: int, extent: float = 1.5, sh_degree: int = 3):
    """Random initialization (for tests/benchmarks)."""
    m = (sh_degree + 1) ** 2
    ks = jax.random.split(key, 5)
    means = jax.random.uniform(ks[0], (num_gaussians, 3), minval=-extent, maxval=extent)
    scales_log = jnp.log(
        jnp.exp(
            jax.random.uniform(ks[1], (num_gaussians, 3),
                               minval=math.log(0.01), maxval=math.log(0.1))
        )
    )
    q = jnp.zeros((num_gaussians, 4)).at[:, 0].set(1.0)
    q = q + 0.1 * jax.random.normal(ks[2], (num_gaussians, 4))
    opacity_logit = jax.random.uniform(ks[3], (num_gaussians,), minval=-1.0, maxval=2.0)
    sh = 0.3 * jax.random.normal(ks[4], (num_gaussians, m, 3))
    return GaussianModel(
        means3d=means,
        scales_log=scales_log,
        rotations=q,
        opacity_logit=opacity_logit,
        sh_dc=sh[:, :1],
        sh_rest=sh[:, 1:],
    )


def _morton_codes(points, bits: int = 10):
    """Interleaved-bit Morton codes of points quantized to a 2^bits grid."""
    lo = points.min(axis=0)
    hi = points.max(axis=0)
    q = ((points - lo) / jnp.maximum(hi - lo, 1e-12) * ((1 << bits) - 1)).astype(
        jnp.int32
    )
    code = jnp.zeros(points.shape[0], dtype=jnp.int32)
    for b in range(bits):
        for axis in range(3):
            bit = (q[:, axis] >> b) & 1
            code = code | (bit << (3 * b + axis))
    return code


def mean_knn_distance(points, k: int = 3, window: int = 8):
    """Approximate mean distance to the k nearest neighbors per point.

    The 3DGS trainer uses a CUDA KNN (simple_knn) for its scale init; the
    TPU-native equivalent sorts points along a Morton space-filling curve and
    searches only a +-window neighborhood in curve order — fully vectorized
    (one sort + 2*window shifted distance evaluations), accurate to a few
    percent for the init's purpose, and O(P log P) at any P.
    """
    P = points.shape[0]
    order = jnp.argsort(_morton_codes(points))
    sorted_pts = points[order]
    dists = []
    for s in range(1, window + 1):
        for sign in (1, -1):
            shifted = jnp.roll(sorted_pts, sign * s, axis=0)
            d = jnp.linalg.norm(sorted_pts - shifted, axis=1)
            idx = jnp.arange(P)
            # Roll wraps around the curve ends; wrapped candidates are far
            # in space anyway, but mask them to be exact.
            invalid = (idx - sign * s < 0) | (idx - sign * s >= P)
            dists.append(jnp.where(invalid, jnp.inf, d))
    dmat = jnp.stack(dists, axis=1)  # [P, 2*window]
    knn = jax.lax.top_k(-dmat, k)[0] * -1.0  # k smallest
    knn = jnp.where(jnp.isfinite(knn), knn, 0.0)
    mean_d = jnp.mean(knn, axis=1)
    # Un-sort back to input order.
    out = jnp.zeros((P,), points.dtype).at[order].set(mean_d)
    return out


def from_points(points, colors, sh_degree: int = 3, initial_opacity: float = 0.1,
                knn_scale_init: bool = True):
    """3DGS-style init from a point cloud (e.g. COLMAP sparse points):
    isotropic log-scales from the mean 3-NN distance (the upstream trainer's
    simple_knn rule: scale = log(sqrt(mean squared 3-NN dist))), DC color
    from RGB via the inverse SH_C0 transform, opacity logit at 0.1."""
    P = points.shape[0]
    m = (sh_degree + 1) ** 2
    if knn_scale_init and P > 4:
        d = mean_knn_distance(points, k=3)
        d = jnp.maximum(d, 1e-7)
        scales_log = jnp.log(d)[:, None] * jnp.ones((1, 3), points.dtype)
    else:
        extent = jnp.maximum(points.max(axis=0) - points.min(axis=0), 1e-6)
        avg_spacing = (jnp.prod(extent) / P) ** (1.0 / 3.0)
        scales_log = jnp.full((P, 3), jnp.log(jnp.maximum(avg_spacing, 1e-7)))
    q = jnp.zeros((P, 4)).at[:, 0].set(1.0)
    inv_sigmoid = math.log(initial_opacity / (1 - initial_opacity))
    sh_dc = ((colors - 0.5) / 0.28209479177387814)[:, None, :]
    return GaussianModel(
        means3d=points,
        scales_log=scales_log,
        rotations=q,
        opacity_logit=jnp.full((P,), inv_sigmoid),
        sh_dc=sh_dc,
        sh_rest=jnp.zeros((P, m - 1, 3)),
    )
