"""Quality ladder: every sort mode vs the exact per-ray full sort.

The reference authors validated KBUFFER/HIER against the PER_PIXEL_FULL
oracle (resorted_render.cuh:474-675) and quantified out-of-order blending
with the SortError debug visualizations (stopthepop_common.cuh:264-282).
This harness publishes the same ladder for the TPU framework at lego scale
(BASELINE config 2): each mode's image is compared against the tiled FULL
render (exact per-ray sort) of the *same* scene.

Usage:
    python benchmarks/quality.py                 # config-2 scale (TPU)
    python benchmarks/quality.py --small         # 48x48 smoke (CPU ok)

Prints one JSON line per case:
  {"case": "...", "psnr_vs_full": dB, "mean_abs": x, "max_abs": x}
(and a trailing line with the sort-error stats of the GLOBAL order when
--small, where the O(P*pixels) analytic map is affordable).
"""

from __future__ import annotations

import argparse
import json

import jax

from stopthepop_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
import jax.numpy as jnp

from stopthepop_tpu.config import GlobalSortOrder, SortMode
from stopthepop_tpu.train.trainer import render_model

from run import _scene, _static  # noqa: E402  (benchmarks/ sibling)


def psnr(a, b):
    mse = jnp.mean((a - b) ** 2)
    return float(10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12)))


def _render(case_static, model, cams, capacity, interpret, **kw):
    color, _ = render_model(
        model, cams, static=case_static, pair_capacity=capacity,
        interpret=interpret, **kw,
    )
    return jnp.clip(color, 0.0, 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="48x48/300 Gaussians smoke scale (CPU interpret ok)")
    ap.add_argument("--seg-full", type=int, default=4096,
                    help="full-sort per-tile segment bound")
    ap.add_argument("--scene", choices=("lego", "overlap", "overlap-mild"),
                    default="lego",
                    help="lego: config-2 scale (small splats, near-exact "
                         "orders); overlap: fewer but LARGE interpenetrating "
                         "semi-transparent splats — the paper's popping "
                         "scenario, where GLOBAL visibly misorders and the "
                         "resort ladder separates; overlap-mild: shallower "
                         "stacks whose inversions fit the resort windows, "
                         "separating HIER from its bare PTD order")
    args = ap.parse_args()

    if args.small:
        width = height = 48
        num_gaussians, scale_shift, capacity = 300, -1.0, 4096
        if args.scene == "overlap":
            # Few LARGE interpenetrating splats at smoke scale.
            num_gaussians, scale_shift = 40, 0.2
    elif args.scene == "overlap":
        width = height = 800
        num_gaussians, scale_shift, capacity = 20_000, -0.7, 3_000_000
    elif args.scene == "overlap-mild":
        width = height = 800
        num_gaussians, scale_shift, capacity = 2_000, -0.3, 1_500_000
    else:
        width = height = 800
        num_gaussians, scale_shift, capacity = 100_000, -2.0, 1_200_000

    cam, model, cams = _scene(width, height, num_gaussians, scale_shift)
    if args.scene.startswith("overlap"):
        # Soften opacities so deep stacks stay unsaturated: more of each
        # ray's order matters, which is exactly what stresses the ladder.
        model = model._replace(
            opacity_logit=jnp.clip(model.opacity_logit, None, 0.0)
        )
    interpret = jax.default_backend() != "tpu"

    def static_for(mode, order=GlobalSortOrder.Z_DEPTH, k=None, hq=None):
        s = _static(cam, width, height, mode)
        s.settings.sort_settings.sort_order = order
        if k is not None:
            s.settings.sort_settings.queue_sizes.per_pixel = k
        if hq is not None:
            qs = s.settings.sort_settings.queue_sizes
            qs.tile_4x4, qs.tile_2x2, qs.per_pixel = hq
        return s

    full = _render(
        static_for(SortMode.PPX_FULL), model, cams, capacity, interpret,
        full_mode="tiled", seg_full=args.seg_full,
    )
    full.block_until_ready()

    cases = [
        ("GLOBAL Z_DEPTH", SortMode.GLOBAL, GlobalSortOrder.Z_DEPTH, {}),
        ("GLOBAL PTD_CENTER", SortMode.GLOBAL, GlobalSortOrder.PTD_CENTER, {}),
        ("GLOBAL PTD_MAX", SortMode.GLOBAL, GlobalSortOrder.PTD_MAX, {}),
        ("KBUFFER k=4", SortMode.PPX_KBUFFER, GlobalSortOrder.Z_DEPTH,
         {"k": 4}),
        ("KBUFFER k=16", SortMode.PPX_KBUFFER, GlobalSortOrder.Z_DEPTH,
         {"k": 16}),
        ("PTD_MAX + KBUFFER k=4", SortMode.PPX_KBUFFER,
         GlobalSortOrder.PTD_MAX, {"k": 4}),
        ("HIER 64/8/4", SortMode.HIER, GlobalSortOrder.PTD_MAX,
         {"hq": (64, 8, 4)}),
        ("HIER 16/8/4", SortMode.HIER, GlobalSortOrder.PTD_MAX,
         {"hq": (16, 8, 4)}),
    ]
    for name, mode, order, opts in cases:
        try:
            img = _render(
                static_for(mode, order, **opts), model, cams, capacity,
                interpret,
            )
            diff = jnp.abs(img - full)
            print(json.dumps({
                "case": name,
                "psnr_vs_full": round(psnr(img, full), 2),
                "mean_abs": round(float(jnp.mean(diff)), 6),
                "max_abs": round(float(jnp.max(diff)), 4),
            }), flush=True)
        except Exception as exc:  # noqa: BLE001 - per-case isolation
            print(json.dumps({
                "case": name,
                "error": f"{type(exc).__name__}: {exc}"[:300],
            }), flush=True)

    if args.small:
        # Per-mode out-of-order blending mass (the reference's SortError
        # debug metric, stopthepop_common.cuh:264-282): analytic replay for
        # the GLOBAL orders, actual pop-order accumulation in the oracles
        # for the resort modes. O(P*pixels) — small scenes only.
        from stopthepop_tpu.render.debug_viz import sort_error_maps
        from stopthepop_tpu.render.naive import (
            render_hierarchical_naive, render_kbuffer_naive,
        )
        from stopthepop_tpu.render.preprocess import preprocess

        prep = preprocess(
            model.means3d, model.opacities(), scales=model.scales(),
            rotations=model.rotations_normalized(), shs=model.shs(),
            viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
            campos=cam.campos, tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
            image_width=width, image_height=height, sh_degree=0,
        )
        bg = jnp.zeros(3)

        def emit_sort_error(name, err_op, err_dist):
            print(json.dumps({
                "case": f"sort-error {name}",
                "mean_err_opacity": round(float(jnp.mean(err_op)), 5),
                "max_err_opacity": round(float(jnp.max(err_op)), 4),
                "mean_err_distance": round(float(jnp.mean(err_dist)), 5),
            }), flush=True)

        for oname in ("Z_DEPTH", "PTD_CENTER", "PTD_MAX"):
            err_op, err_dist = sort_error_maps(
                prep, width, height, cam.campos, cam.inv_viewprojmatrix,
                sort_order=GlobalSortOrder[oname],
            )
            emit_sort_error(f"GLOBAL {oname}", err_op, err_dist)
        for kname, k, order in (
            ("KBUFFER k=4", 4, GlobalSortOrder.Z_DEPTH),
            ("KBUFFER k=16", 16, GlobalSortOrder.Z_DEPTH),
            ("PTD_MAX + KBUFFER k=4", 4, GlobalSortOrder.PTD_MAX),
        ):
            _, _, _, err_op, err_dist = render_kbuffer_naive(
                prep, bg, width, height, cam.campos,
                cam.inv_viewprojmatrix, k=k, sort_order=order,
                sort_error=True,
            )
            emit_sort_error(kname, err_op, err_dist)
        for hname, hq in (("HIER 64/8/4", (64, 8, 4)),
                          ("HIER 16/8/4", (16, 8, 4))):
            _, _, _, err_op, err_dist = render_hierarchical_naive(
                prep, bg, width, height, cam.campos,
                cam.inv_viewprojmatrix, queue_sizes=hq,
                sort_order=GlobalSortOrder.PTD_MAX, sort_error=True,
            )
            emit_sort_error(hname, err_op, err_dist)


if __name__ == "__main__":
    main()
