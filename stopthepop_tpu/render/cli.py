"""Offline rendering CLI: PLY model -> image sequence (+ FPS report).

The inference half of the reference ecosystem's viewer: load a trained
3DGS model, render an orbit (or dataset cameras) with any sort mode, and
write PNG frames. The render loop jits once (all cameras ride as arrays),
so the reported FPS is the device rendering rate.

Usage:
    python -m stopthepop_tpu.render.cli --ply model.ply --out frames/ \\
        --frames 120 --size 800 --sort-mode HIER
    # from a dataset's cameras instead of an orbit:
    python -m stopthepop_tpu.render.cli --ply model.ply --out frames/ \\
        --data /data/nerf_synthetic/lego --frames 8
"""

from __future__ import annotations

import argparse
import math
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..config import ExtendedSettings, GaussianRasterizationSettings, SortMode
from ..io.cameras import load_nerf_synthetic, orbit_camera, to_camera_arrays
from ..io.images import write_png
from ..io.ply import load_gaussian_model
from ..train.trainer import CameraArrays, render_model


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ply", required=True)
    ap.add_argument("--out", required=True, help="output directory for PNGs")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--fovx-deg", type=float, default=60.0)
    ap.add_argument("--radius", type=float, default=4.0)
    ap.add_argument("--cam-height", type=float, default=0.5)
    ap.add_argument("--data", default=None,
                    help="render this dataset's test/train cameras instead "
                         "of an orbit (NeRF-synthetic or COLMAP dir)")
    ap.add_argument("--sort-mode", default="GLOBAL",
                    choices=[m.name for m in SortMode])
    ap.add_argument("--sh-degree", type=int, default=None,
                    help="override (default: from the PLY)")
    ap.add_argument("--white-bg", action="store_true")
    ap.add_argument("--pair-capacity", type=int, default=None)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args(argv)

    model = load_gaussian_model(args.ply)
    n = model.means3d.shape[0]
    sh_degree = args.sh_degree
    if sh_degree is None:
        m_total = 1 + model.sh_rest.shape[1]
        sh_degree = int(round(math.sqrt(m_total))) - 1
    width = args.width or args.size
    height = args.height or args.size
    bg = np.ones(3, np.float32) if args.white_bg else np.zeros(3, np.float32)

    if args.data:
        if os.path.isdir(os.path.join(args.data, "sparse")):
            from ..io.colmap import load_colmap

            cams, _ = load_colmap(args.data)
        else:
            path = os.path.join(args.data, "transforms_test.json")
            if not os.path.exists(path):
                path = os.path.join(args.data, "transforms_train.json")
            cams = load_nerf_synthetic(path)
        cams = cams[: args.frames]
        width, height = cams[0].width, cams[0].height
    else:
        fovx = math.radians(args.fovx_deg)
        cams = [
            orbit_camera(2 * math.pi * i / args.frames, fovx, width, height,
                         radius=args.radius, cam_height=args.cam_height)
            for i in range(args.frames)
        ]

    settings = ExtendedSettings()
    settings.sort_settings.sort_mode = SortMode[args.sort_mode]
    settings.culling_settings.rect_bounding = True
    settings.culling_settings.tight_opacity_bounding = True
    cam0 = cams[0]
    static = GaussianRasterizationSettings(
        image_height=height, image_width=width,
        tanfovx=cam0.tanfovx, tanfovy=cam0.tanfovy,
        bg=jnp.asarray(bg), scale_modifier=1.0,
        viewmatrix=jnp.asarray(cam0.viewmatrix),
        projmatrix=jnp.asarray(cam0.projmatrix),
        inv_viewprojmatrix=jnp.asarray(cam0.inv_viewprojmatrix),
        sh_degree=sh_degree, campos=jnp.asarray(cam0.campos),
        prefiltered=False, settings=settings,
    )
    pair_capacity = args.pair_capacity or max(16 * n, 1 << 18)

    @jax.jit
    def render(cam_arrays):
        img, _ = render_model(
            model, cam_arrays, static=static,
            pair_capacity=pair_capacity, interpret=args.interpret,
        )
        return jnp.clip(img, 0.0, 1.0)

    os.makedirs(args.out, exist_ok=True)
    cam_list = [to_camera_arrays(c) for c in cams]
    print(f"{n} gaussians, {len(cams)} frames @ {width}x{height}, "
          f"{args.sort_mode}", flush=True)
    jax.block_until_ready(render(cam_list[0]))  # compile
    t0 = time.time()
    frames = [np.asarray(render(c)) for c in cam_list]
    jax.block_until_ready(frames[-1])
    dt = time.time() - t0
    for i, img in enumerate(frames):
        u8 = (img.transpose(1, 2, 0) * 255.0 + 0.5).astype(np.uint8)
        write_png(os.path.join(args.out, f"frame_{i:04d}.png"), u8)
    fps = len(cams) / dt
    print(f"rendered {len(cams)} frames in {dt:.2f}s = {fps:.1f} FPS "
          f"({fps * width * height / 1e6:.1f} Mpix/s)", flush=True)


if __name__ == "__main__":
    main()
