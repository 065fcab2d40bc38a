"""Generate a NeRF-synthetic-format dataset from the procedural scene.

Renders the structured ground-truth scene (utils/synthetic.py) from orbit
cameras with this framework's own rasterizer and writes

    <out>/transforms_train.json + train/r_*.png
    <out>/transforms_test.json  + test/r_*.png

so the full training CLI (stopthepop_tpu.train.cli) can run end-to-end —
dataset loading, densification, eval, PLY export — without external data:

    PYTHONPATH=/root/repo python benchmarks/make_synthetic_scene.py \
        --out /tmp/stp_scene --views 24 --size 400
    PYTHONPATH=/root/repo python -m stopthepop_tpu.train.cli \
        --data /tmp/stp_scene --iters 3000 --capacity 131072 \
        --init-points 4000 --sort-mode GLOBAL
"""

from __future__ import annotations

import argparse
import json
import math
import os

import jax
import numpy as np

from stopthepop_tpu.config import (
    ExtendedSettings,
    GaussianRasterizationSettings,
)
from stopthepop_tpu.io.cameras import orbit_camera, to_camera_arrays
from stopthepop_tpu.io.images import write_png
from stopthepop_tpu.train.trainer import render_model
from stopthepop_tpu.utils.synthetic import structured_scene


def _orbit_c2w(theta, radius, cam_height, target):
    """The OpenGL camera-to-world orbit_camera() builds, for the JSON."""
    target = np.asarray(target, np.float64)
    pos = target + np.array(
        [radius * math.sin(theta), cam_height, radius * math.cos(theta)]
    )
    forward = target - pos
    forward = forward / np.linalg.norm(forward)
    z = -forward
    up = np.array([0.0, 1.0, 0.0])
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, pos
    return c2w


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--views", type=int, default=24)
    ap.add_argument("--test-views", type=int, default=6)
    ap.add_argument("--size", type=int, default=400)
    ap.add_argument("--gaussians", type=int, default=40_000)
    ap.add_argument("--radius", type=float, default=4.0)
    ap.add_argument("--fovx-deg", type=float, default=40.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    model, _ = structured_scene(args.gaussians, args.seed)
    fovx = math.radians(args.fovx_deg)
    interpret = jax.default_backend() != "tpu"
    size = args.size

    settings = ExtendedSettings()
    settings.culling_settings.rect_bounding = True
    settings.culling_settings.tight_opacity_bounding = True

    def render(theta, cam_height):
        cam = orbit_camera(theta, fovx, size, size, radius=args.radius,
                           cam_height=cam_height)
        static = GaussianRasterizationSettings(
            image_height=size, image_width=size,
            tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
            bg=np.zeros(3, np.float32), scale_modifier=1.0,
            viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
            inv_viewprojmatrix=cam.inv_viewprojmatrix,
            sh_degree=0, campos=cam.campos, prefiltered=False,
            settings=settings,
        )
        color, _ = render_model(
            model, to_camera_arrays(cam), static=static,
            pair_capacity=1_500_000, interpret=interpret,
        )
        img = np.clip(np.asarray(color), 0.0, 1.0)  # [3, H, W]
        return (img.transpose(1, 2, 0) * 255.0 + 0.5).astype(np.uint8)

    for split, count, phase in (
        ("train", args.views, 0.0),
        ("test", args.test_views, 0.5),  # offset half a step from train
    ):
        os.makedirs(os.path.join(args.out, split), exist_ok=True)
        frames = []
        for i in range(count):
            theta = 2.0 * math.pi * (i + phase) / count
            cam_height = 0.8 + 1.2 * ((i * 7919) % count) / max(count - 1, 1)
            img = render(theta, cam_height)
            rel = f"{split}/r_{i}"
            write_png(os.path.join(args.out, rel + ".png"), img)
            frames.append({
                "file_path": rel,
                "transform_matrix":
                    _orbit_c2w(theta, args.radius, cam_height,
                               (0.0, 0.0, 0.0)).tolist(),
            })
            print(f"rendered {rel}.png", flush=True)
        meta = {
            "camera_angle_x": fovx,
            "w": size,
            "h": size,
            "frames": frames,
        }
        with open(os.path.join(args.out, f"transforms_{split}.json"),
                  "w") as f:
            json.dump(meta, f, indent=1)
    print(f"dataset written to {args.out}")


if __name__ == "__main__":
    main()
