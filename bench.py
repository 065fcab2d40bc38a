"""Headline benchmark: fwd+bwd rays/s (Mpix/s) per chip at 1080p.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The reference repo publishes no numbers (BASELINE.md); vs_baseline is the
ratio against a 60 Mpix/s nominal figure (~15 training it/s at 1080p, the
ballpark of the reference CUDA rasterizer's fwd+bwd on its supported GPUs).
"""

import json
import time

import jax
import jax.numpy as jnp

from stopthepop_tpu.config import ExtendedSettings, GaussianRasterizationSettings
from stopthepop_tpu.models.gaussians import init_random
from stopthepop_tpu.train.loss import rgb_loss
from stopthepop_tpu.train.trainer import CameraArrays, render_model
from stopthepop_tpu.utils.testing import make_camera

NOMINAL_BASELINE_MPIX_S = 60.0


def main():
    width, height = 1920, 1080
    num_gaussians = 500_000
    capacity = 6_000_000
    interpret = jax.default_backend() != "tpu"

    cam = make_camera(width, height, campos=(0.0, 0.0, -4.0))
    static = GaussianRasterizationSettings(
        image_height=height, image_width=width,
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        bg=jnp.zeros(3), scale_modifier=1.0,
        viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
        inv_viewprojmatrix=cam.inv_viewprojmatrix,
        sh_degree=3, campos=cam.campos, prefiltered=False,
        settings=ExtendedSettings(),
    )
    model = init_random(jax.random.PRNGKey(0), num_gaussians, extent=1.5)
    cam_arrays = CameraArrays(
        cam.viewmatrix, cam.projmatrix, cam.inv_viewprojmatrix, cam.campos
    )
    target = jax.random.uniform(jax.random.PRNGKey(1), (3, height, width))

    def loss_fn(model):
        color, _ = render_model(
            model, cam_arrays, static=static,
            pair_capacity=capacity, interpret=interpret,
        )
        return rgb_loss(color, target)

    step = jax.jit(jax.grad(loss_fn))
    g = jax.block_until_ready(step(model))

    n = 10
    t0 = time.time()
    for _ in range(n):
        g = step(model)
    jax.block_until_ready(g)
    dt = (time.time() - t0) / n

    mpix_s = width * height / dt / 1e6
    print(json.dumps({
        "metric": "fwd+bwd throughput, 1080p, 500K gaussians, L1+D-SSIM",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s per chip",
        "vs_baseline": round(mpix_s / NOMINAL_BASELINE_MPIX_S, 3),
    }))


if __name__ == "__main__":
    main()
