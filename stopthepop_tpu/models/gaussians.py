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


def from_points(points, colors, sh_degree: int = 3, initial_opacity: float = 0.1):
    """3DGS-style init from a point cloud: isotropic scales from mean
    nearest-neighbor-ish spacing, DC color from RGB (inverse SH_C0 transform)."""
    P = points.shape[0]
    m = (sh_degree + 1) ** 2
    # Approximate per-point spacing by the scene extent heuristic.
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
