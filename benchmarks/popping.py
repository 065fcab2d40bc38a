"""Popping (temporal flicker) ladder: the paper's actual claim, measured.

StopThePop's goal is not single-frame accuracy but VIEW CONSISTENCY: with
a global view-dependent sort, rotating the camera reorders whole tiles at
once and the image "pops". The reference evaluates this with view-sweep
flicker comparisons (paper Sec. 5.3) on top of its sort-error counters
(/root/reference/cuda_rasterizer/stopthepop/stopthepop_common.cuh:264-282).

This harness renders a small camera orbit with every sort mode and reports
the popping energy of each mode as the frame-to-frame change EXCESS over
the exact per-ray FULL oracle:

    pop(m) = mean_t mean_px | (I^m_{t+1} - I^m_t) - (I^F_{t+1} - I^F_t) |

The oracle's own frame difference is the true scene motion; anything a
mode adds on top of it is ordering flicker. Also reported: the worst
single-step excess (max over t of the mean-abs excess — a single large pop
matters more to a viewer than the average), and the mean per-frame PSNR
vs FULL for cross-reference with benchmarks/quality.py.

Usage:
    python benchmarks/popping.py                  # overlap scene (TPU)
    python benchmarks/popping.py --scene lego
    python benchmarks/popping.py --small          # 48x48 smoke (CPU ok)

Prints one JSON line per mode.
"""

from __future__ import annotations

import argparse
import json
import math

import jax

from stopthepop_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
import jax.numpy as jnp

from stopthepop_tpu.config import GlobalSortOrder, SortMode
from stopthepop_tpu.io.cameras import orbit_camera, to_camera_arrays
from stopthepop_tpu.train.trainer import render_model

from run import _scene, _static  # noqa: E402  (benchmarks/ sibling)


def psnr(a, b):
    mse = jnp.mean((a - b) ** 2)
    return float(10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="48x48/300 Gaussians smoke scale (CPU interpret ok)")
    ap.add_argument("--scene", choices=("lego", "overlap"), default="overlap")
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--arc-deg", type=float, default=12.0,
                    help="total orbit arc: small steps, so the oracle's own "
                         "frame difference stays small vs ordering flicker")
    ap.add_argument("--seg-full", type=int, default=4096)
    args = ap.parse_args()

    if args.small:
        width = height = 48
        num_gaussians, scale_shift, capacity = 300, -1.0, 4096
    elif args.scene == "overlap":
        width = height = 512
        num_gaussians, scale_shift, capacity = 20_000, -0.7, 1_800_000
    else:
        width = height = 512
        num_gaussians, scale_shift, capacity = 100_000, -2.0, 900_000

    cam, model, _ = _scene(width, height, num_gaussians, scale_shift)
    if args.scene == "overlap" and not args.small:
        # Soft opacities keep deep stacks unsaturated (same knob as
        # quality.py): more of each ray's order matters.
        model = model._replace(
            opacity_logit=jnp.clip(model.opacity_logit, None, 0.0)
        )
    interpret = jax.default_backend() != "tpu"

    # Orbit around the scene at the same radius as the fixed scene camera
    # (make_camera sits at z=-4 looking +z, i.e. theta=pi in orbit terms).
    fovx = 2.0 * math.atan(cam.tanfovx)
    arc = math.radians(args.arc_deg)
    thetas = [
        math.pi + arc * (i / (args.views - 1) - 0.5)
        for i in range(args.views)
    ]
    views = [
        to_camera_arrays(
            orbit_camera(t, fovx, width, height, radius=4.0, cam_height=0.0)
        )
        for t in thetas
    ]

    def static_for(mode, order=GlobalSortOrder.Z_DEPTH, k=None, hq=None):
        s = _static(cam, width, height, mode)
        s.settings.sort_settings.sort_order = order
        if k is not None:
            s.settings.sort_settings.queue_sizes.per_pixel = k
        if hq is not None:
            qs = s.settings.sort_settings.queue_sizes
            qs.tile_4x4, qs.tile_2x2, qs.per_pixel = hq
        return s

    def sweep(case_static, **kw):
        @jax.jit
        def one(cams):
            color, _ = render_model(
                model, cams, static=case_static, pair_capacity=capacity,
                interpret=interpret, **kw,
            )
            return jnp.clip(color, 0.0, 1.0)

        return jnp.stack([one(v) for v in views])  # [T, 3, H, W]

    full = sweep(
        static_for(SortMode.PPX_FULL), full_mode="tiled",
        seg_full=args.seg_full,
    )
    full.block_until_ready()
    d_full = full[1:] - full[:-1]
    motion = float(jnp.mean(jnp.abs(d_full)))
    print(json.dumps({
        "case": "FULL oracle", "views": args.views,
        "arc_deg": args.arc_deg,
        "true_motion_mean_abs": round(motion, 6),
    }), flush=True)

    cases = [
        ("GLOBAL Z_DEPTH", SortMode.GLOBAL, GlobalSortOrder.Z_DEPTH, {}),
        ("GLOBAL PTD_MAX", SortMode.GLOBAL, GlobalSortOrder.PTD_MAX, {}),
        ("KBUFFER k=4", SortMode.PPX_KBUFFER, GlobalSortOrder.Z_DEPTH,
         {"k": 4}),
        ("KBUFFER k=16", SortMode.PPX_KBUFFER, GlobalSortOrder.Z_DEPTH,
         {"k": 16}),
        ("PTD_MAX + KBUFFER k=4", SortMode.PPX_KBUFFER,
         GlobalSortOrder.PTD_MAX, {"k": 4}),
        ("HIER 64/8/4", SortMode.HIER, GlobalSortOrder.PTD_MAX,
         {"hq": (64, 8, 4)}),
    ]
    for name, mode, order, opts in cases:
        try:
            imgs = sweep(static_for(mode, order, **opts))
            excess = jnp.abs((imgs[1:] - imgs[:-1]) - d_full)
            per_step = jnp.mean(excess, axis=(1, 2, 3))  # [T-1]
            print(json.dumps({
                "case": name,
                "pop_mean": round(float(jnp.mean(per_step)), 6),
                "pop_worst_step": round(float(jnp.max(per_step)), 6),
                "pop_vs_motion": round(
                    float(jnp.mean(per_step)) / max(motion, 1e-12), 3),
                "psnr_vs_full_mean": round(
                    sum(psnr(imgs[i], full[i]) for i in range(args.views))
                    / args.views, 2),
            }), flush=True)
        except Exception as exc:  # noqa: BLE001 - per-case isolation
            print(json.dumps({
                "case": name,
                "error": f"{type(exc).__name__}: {exc}"[:300],
            }), flush=True)


if __name__ == "__main__":
    main()
