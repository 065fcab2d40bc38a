"""Best-config sweep of the headline train step (bench.py's scene).

Measures the full training step (render + L1+D-SSIM + grads) across the
performance-option matrix the framework exposes:

  * culling: default vs rect + tight-opacity bounding (the paper's culling,
    forward.cu:152-175 — also a TPU win because every sort/gather domain
    scales with the surviving pair stream);
  * binning tile (``tile_shape``): 16x16 (reference parity, config.h:16-17)
    vs 32x16 / 32x32 — larger bins cut pairs per Gaussian and tile-padding
    overhead at the cost of blending more Gaussians per pixel;
  * ``carry_bf16``: bf16-packed cotangent carriers in the backward unsort
    (halves the carry-sort operand count; gradients stay f32 downstream).

Per variant the pair capacity is auto-sized from the measured culled stream
(same policy as the trainer CLI). Prints one JSON line per variant; run on
the real chip to pick bench.py's best configuration.

Usage: PYTHONPATH=/root/repo python benchmarks/sweep.py [--iters N]
"""

from __future__ import annotations

import argparse
import itertools
import json
import time

import jax
import jax.numpy as jnp

from stopthepop_tpu.config import (
    ExtendedSettings,
    GaussianRasterizationSettings,
)
from stopthepop_tpu.models.gaussians import init_random
from stopthepop_tpu.render.preprocess import preprocess
from stopthepop_tpu.train.loss import rgb_loss
from stopthepop_tpu.train.trainer import CameraArrays, render_model
from stopthepop_tpu.utils.testing import make_camera


def measure_capacity(model, cam, width, height, *, tile_x, tile_y, culling):
    from stopthepop_tpu.render.duplicate import rect_histogram
    from stopthepop_tpu.render.pipeline import tile_grid

    prep = preprocess(
        model.means3d, model.opacities(), scales=model.scales(),
        rotations=model.rotations_normalized(), shs=model.shs(),
        viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
        campos=cam.campos, tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        image_width=width, image_height=height, sh_degree=0,
        rect_bounding=culling, tight_opacity_bounding=culling,
        tile_x=tile_x, tile_y=tile_y,
    )
    measured = int(jnp.sum(prep.tiles_touched))
    # Exact per-tile alignment-padding need for this (static) scene, so the
    # shared pad pool carries no worst-case slack (the overflow flag still
    # guards the bound at runtime).
    gx, gy = tile_grid(width, height, tile_x, tile_y)
    counts = rect_histogram(prep, gx, gy)
    pad_pool = int(jnp.sum((-counts) % 128))
    capacity = (int(measured * 1.1) + 127) // 128 * 128
    return capacity, measured, (pad_pool + 128 * 16 + 127) // 128 * 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--gaussians", type=int, default=500_000)
    args = ap.parse_args()
    width, height = args.width, args.height
    interpret = jax.default_backend() != "tpu"

    cam = make_camera(width, height, campos=(0.0, 0.0, -4.0))
    model = init_random(jax.random.PRNGKey(0), args.gaussians, extent=1.5)
    model = model._replace(scales_log=model.scales_log - 2.3)
    cams = CameraArrays(
        cam.viewmatrix, cam.projmatrix, cam.inv_viewprojmatrix, cam.campos
    )
    target = jax.random.uniform(jax.random.PRNGKey(1), (3, height, width))

    for culling, tile_shape, carry_bf16 in itertools.product(
        (False, True), (None, (32, 16), (32, 32)), (False, True)
    ):
        tx, ty = tile_shape if tile_shape else (16, 16)
        capacity, measured, pad_pool = measure_capacity(
            model, cam, width, height, tile_x=tx, tile_y=ty, culling=culling,
        )
        settings = ExtendedSettings()
        settings.culling_settings.rect_bounding = culling
        settings.culling_settings.tight_opacity_bounding = culling
        static = GaussianRasterizationSettings(
            image_height=height, image_width=width,
            tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
            bg=jnp.zeros(3), scale_modifier=1.0,
            viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
            inv_viewprojmatrix=cam.inv_viewprojmatrix,
            sh_degree=3, campos=cam.campos, prefiltered=False,
            settings=settings,
        )

        def loss_fn(m):
            color, _ = render_model(
                m, cams, static=static, pair_capacity=capacity,
                pad_capacity=pad_pool, tile_shape=tile_shape,
                carry_bf16=carry_bf16, interpret=interpret,
            )
            return rgb_loss(color, target)

        grad = jax.grad(loss_fn)

        @jax.jit
        def run(m):
            def it(i, acc):
                g = grad(m._replace(means3d=m.means3d + acc * 1e-12))
                return acc + jnp.mean(g.means3d)
            return jax.lax.fori_loop(0, args.iters, it, jnp.float32(0.0))

        jax.block_until_ready(run(model))
        t0 = time.time()
        jax.block_until_ready(run(model))
        dt = (time.time() - t0) / args.iters
        print(json.dumps({
            "culling": culling,
            "tile": f"{tx}x{ty}",
            "carry_bf16": carry_bf16,
            "pairs": measured,
            "capacity": capacity,
            "pad_pool": pad_pool,
            "mpix_s": round(width * height / dt / 1e6, 2),
            "ms": round(dt * 1000, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
