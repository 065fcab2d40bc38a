"""End-to-end 3DGS training CLI on NeRF-synthetic datasets.

Usage:
    python -m stopthepop_tpu.train.cli --data /path/to/nerf_synthetic/lego \\
        --iters 7000 --capacity 262144 --out lego.ply

This is the trainer half the reference delegates to the upstream 3DGS
codebase (the reference repo itself is rasterizer-only): dataset loading,
the densify/prune/opacity-reset schedule, per-group learning rates, periodic
PSNR evaluation, checkpointing, and PLY export — all running through this
framework's TPU rasterization pipeline.
"""

from __future__ import annotations

import argparse
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExtendedSettings, GaussianRasterizationSettings, SortMode
from ..io.cameras import load_nerf_synthetic
from ..io.images import read_png_batch, to_float_rgb
from ..io.ply import save_gaussian_model
from ..models.gaussians import from_points
from ..train.checkpoint import save_checkpoint
from ..train.density import (
    DensifyConfig,
    densify_and_prune,
    grow_capacity,
    reset_opacity,
    reset_opt_slots,
)
from ..train.loss import psnr
from ..train.trainer import (
    CameraArrays,
    init_densify_stats,
    init_train_state,
    make_3dgs_optimizer,
    make_train_step,
    render_model,
)


def _downscale(img: np.ndarray, factor: int) -> np.ndarray:
    """Integer-factor area-average downscale of a [H, W, C] float image."""
    if factor <= 1:
        return img
    h, w, c = img.shape
    h2, w2 = h // factor, w // factor
    return img[: h2 * factor, : w2 * factor].reshape(
        h2, factor, w2, factor, c
    ).mean(axis=(1, 3))


def _load_targets(cams, downscale: int, bg: np.ndarray):
    imgs = read_png_batch([c.image_path for c in cams])
    targets, out_cams = [], []
    for cam, raw in zip(cams, imgs):
        img = _downscale(to_float_rgb(raw, bg), downscale)
        h, w = img.shape[:2]
        if (h, w) != (cam.height, cam.width):
            # Rebuild intrinsics at the loaded resolution.
            cam = cam._replace(width=w, height=h)
        targets.append(img.transpose(2, 0, 1))  # [3, H, W]
        out_cams.append(cam)
    return out_cams, np.stack(targets)


def load_dataset(data_dir: str, split: str, downscale: int, bg: np.ndarray,
                 limit: int = 0):
    """Load (cameras, target images [N,3,H,W]) for a NeRF-synthetic split."""
    path = os.path.join(data_dir, f"transforms_{split}.json")
    cams = load_nerf_synthetic(path)
    if limit:
        cams = cams[:limit]
    return _load_targets(cams, downscale, bg)


def is_colmap_scene(data_dir: str) -> bool:
    return os.path.isdir(os.path.join(data_dir, "sparse"))


def load_colmap_dataset(data_dir: str, split: str, downscale: int,
                        bg: np.ndarray, limit: int = 0, llffhold: int = 8):
    """Load a COLMAP capture (MipNeRF-360 layout) with the standard 3DGS
    every-``llffhold``-th test split. Returns (cams, targets, points,
    scene_extent) — extent per getNerfppNorm: 1.1x the max camera distance
    from the camera centroid."""
    from ..io.colmap import load_colmap

    cams, points = load_colmap(data_dir, downscale=downscale)
    centers = np.stack([c.campos for c in cams])
    extent = 1.1 * float(
        np.max(np.linalg.norm(centers - centers.mean(0), axis=1))
    )
    test = [c for i, c in enumerate(cams) if llffhold and i % llffhold == 0]
    train = [c for i, c in enumerate(cams)
             if not llffhold or i % llffhold != 0]
    sel = test if split == "test" else train
    if limit:
        sel = sel[:limit]
    # MipNeRF-360 ships pre-scaled images_N dirs (load_colmap picked one);
    # otherwise area-downscale the full-res frames here.
    prescaled = downscale > 1 and os.path.isdir(
        os.path.join(data_dir, f"images_{downscale}")
    )
    out_cams, targets = _load_targets(sel, 1 if prescaled else downscale, bg)
    return out_cams, targets, points, extent


def make_static_settings(cam, bg, sh_degree: int,
                         sort_mode: SortMode) -> GaussianRasterizationSettings:
    settings = ExtendedSettings()
    settings.sort_settings.sort_mode = sort_mode
    settings.culling_settings.rect_bounding = True
    settings.culling_settings.tight_opacity_bounding = True
    settings.culling_settings.tile_based_culling = True
    return GaussianRasterizationSettings(
        image_height=cam.height, image_width=cam.width,
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        bg=jnp.asarray(bg), scale_modifier=1.0,
        viewmatrix=jnp.asarray(cam.viewmatrix),
        projmatrix=jnp.asarray(cam.projmatrix),
        inv_viewprojmatrix=jnp.asarray(cam.inv_viewprojmatrix),
        sh_degree=sh_degree, campos=jnp.asarray(cam.campos),
        prefiltered=False, settings=settings,
    )


def to_arrays(cam) -> CameraArrays:
    return CameraArrays(
        jnp.asarray(cam.viewmatrix), jnp.asarray(cam.projmatrix),
        jnp.asarray(cam.inv_viewprojmatrix), jnp.asarray(cam.campos),
    )


def estimate_pair_capacity(model, cams, static, gauss_capacity: int,
                           n_probe: int = 8, headroom: float = 1.5):
    """Size the static pair buffer from measured per-view pair counts.

    Replaces the blind 16*P default: run preprocess over a few cameras,
    take the worst observed (Gaussian, tile) pair count, scale it by the
    model-capacity growth factor (densification multiplies the primitive
    count; per-primitive footprint stays roughly constant) plus headroom,
    and round to the 128-pair DMA alignment. Overflow is still detected at
    runtime (the trainer warns), so this is a sizing aid, not a guarantee.

    Returns ``(pair_capacity, seg_cap)``: seg_cap is the worst observed
    single-tile pair count (scaled the same way, 128-aligned) — the bound
    the resort-mode backward kernels truncate per-tile gradients at, sized
    here so they don't.
    """
    from ..render.duplicate import rect_histogram
    from ..render.pipeline import tile_grid
    from ..render.preprocess import preprocess

    ext = static.settings
    worst = 0
    worst_tile = 0
    step = max(1, len(cams) // n_probe)
    for cam in cams[::step][:n_probe]:
        prep = preprocess(
            model.means3d, model.opacities(),
            scales=model.scales(), rotations=model.rotations_normalized(),
            shs=model.shs(),
            viewmatrix=jnp.asarray(cam.viewmatrix),
            projmatrix=jnp.asarray(cam.projmatrix),
            campos=jnp.asarray(cam.campos),
            tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
            image_width=cam.width, image_height=cam.height,
            sh_degree=0,
            sort_order=ext.sort_settings.sort_order,
            rect_bounding=ext.culling_settings.rect_bounding,
            tight_opacity_bounding=ext.culling_settings.tight_opacity_bounding,
            proper_ewa_scaling=ext.proper_ewa_scaling,
        )
        worst = max(worst, int(jnp.sum(prep.tiles_touched)))
        gx, gy = tile_grid(cam.width, cam.height)
        worst_tile = max(
            worst_tile, int(jnp.max(rect_histogram(prep, gx, gy)))
        )
    n_active = model.num_gaussians
    growth = max(1.0, gauss_capacity / max(n_active, 1))
    cap = int(worst * growth * headroom)
    cap = max(cap, 1 << 14)
    seg = max(int(worst_tile * growth * headroom), 1 << 11)
    return (cap + 127) // 128 * 128, (seg + 127) // 128 * 128


def init_model(rng: np.random.Generator, n_points: int, extent: float,
               sh_degree: int):
    """Random-in-box init, as the upstream trainer does for Blender scenes."""
    pts = rng.uniform(-extent, extent, (n_points, 3)).astype(np.float32)
    cols = rng.uniform(0.0, 1.0, (n_points, 3)).astype(np.float32)
    return from_points(jnp.asarray(pts), jnp.asarray(cols),
                       sh_degree=sh_degree)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", required=True,
                    help="NeRF-synthetic scene dir (has transforms_*.json)")
    ap.add_argument("--iters", type=int, default=7000)
    ap.add_argument("--capacity", type=int, default=1 << 17,
                    help="static Gaussian capacity (power of two advised)")
    ap.add_argument("--init-points", type=int, default=10_000)
    ap.add_argument("--sh-degree", type=int, default=3)
    ap.add_argument("--downscale", type=int, default=1)
    ap.add_argument("--white-bg", action="store_true")
    ap.add_argument("--sort-mode", default="HIER",
                    choices=[m.name for m in SortMode])
    ap.add_argument("--pair-capacity", type=int, default=None)
    ap.add_argument("--seg-cap", type=int, default=None,
                    help="per-tile pair bound for resort-mode backward "
                    "gradient buffers (auto-sized from a probe by default)")
    ap.add_argument("--scene-extent", type=float, default=1.3,
                    help="NeRF-synthetic cameras orbit radius ~4, object ~1.3")
    ap.add_argument("--sh-ramp-every", type=int, default=1000,
                    help="activate one more SH band every N steps (the "
                    "upstream oneupSHdegree schedule); 0 = all bands "
                    "active from step 0")
    ap.add_argument("--densify-from", type=int, default=500)
    ap.add_argument("--densify-until", type=int, default=15_000)
    ap.add_argument("--densify-every", type=int, default=100)
    ap.add_argument("--opacity-reset-every", type=int, default=3000)
    ap.add_argument("--eval-every", type=int, default=1000)
    ap.add_argument("--eval-frames", type=int, default=8)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--checkpoint-every", type=int, default=5000)
    ap.add_argument("--out", default=None, help="output PLY path")
    ap.add_argument("--train-frames", type=int, default=0,
                    help="limit training frames (0 = all)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--interpret", action="store_true",
                    help="run Pallas kernels in interpret mode (CPU debug)")
    # Measured, quality-gated performance winners (benchmarks/
    # quality_defaults.py round 4: PASS, delta -0.011 dB on a real fit).
    # They default ON for GLOBAL-mode training; 32x16 binning applies to
    # GLOBAL only (the resort kernels' sub-tile geometry is fixed 16x16).
    ap.add_argument("--tile", default="auto",
                    help="binning tile WxH (auto = 32x16 for GLOBAL, "
                         "16x16 otherwise)")
    ap.add_argument("--no-carry-bf16", action="store_true",
                    help="disable bf16-packed backward cotangent carriers")
    ap.add_argument("--no-rank-key", action="store_true",
                    help="disable the packed rank-key sort")
    args = ap.parse_args(argv)

    bg = np.ones(3, np.float32) if args.white_bg else np.zeros(3, np.float32)
    print(f"loading {args.data} ...", flush=True)
    rng = np.random.default_rng(args.seed)
    init_points = None
    if is_colmap_scene(args.data):
        cams, targets, points, extent = load_colmap_dataset(
            args.data, "train", args.downscale, bg, limit=args.train_frames)
        eval_cams, eval_targets, _, _ = load_colmap_dataset(
            args.data, "test", args.downscale, bg, limit=args.eval_frames)
        args.scene_extent = extent
        init_points = points
    else:
        cams, targets = load_dataset(args.data, "train", args.downscale, bg,
                                     limit=args.train_frames)
        try:
            eval_cams, eval_targets = load_dataset(
                args.data, "test", args.downscale, bg,
                limit=args.eval_frames)
        except FileNotFoundError:
            eval_cams, eval_targets = cams[: args.eval_frames], \
                targets[: args.eval_frames]
    h, w = cams[0].height, cams[0].width
    print(f"{len(cams)} train / {len(eval_cams)} eval frames @ {w}x{h}",
          flush=True)

    if init_points is not None:
        model = from_points(jnp.asarray(init_points.xyz),
                            jnp.asarray(init_points.rgb),
                            sh_degree=args.sh_degree)
        print(f"init from {init_points.xyz.shape[0]} COLMAP points, "
              f"scene extent {args.scene_extent:.2f}", flush=True)
    else:
        model = init_model(rng, args.init_points, args.scene_extent,
                           args.sh_degree)

    static = make_static_settings(cams[0], bg, args.sh_degree,
                                  SortMode[args.sort_mode])
    if args.pair_capacity is None or args.seg_cap is None:
        # Estimate on the raw init model (pre-capacity-padding) so the
        # growth factor reflects real active primitives.
        pair_cap, seg_cap = estimate_pair_capacity(
            model, cams, static, args.capacity)
        if args.pair_capacity is None:
            args.pair_capacity = pair_cap
        if args.seg_cap is None:
            args.seg_cap = seg_cap
        print(f"pair capacity auto-sized to {args.pair_capacity}, "
              f"seg_cap to {args.seg_cap}", flush=True)

    model, active = grow_capacity(model, args.capacity)
    optimizer = make_3dgs_optimizer(spatial_lr_scale=args.scene_extent,
                                    position_lr_max_steps=args.iters)
    state = init_train_state(model, optimizer)
    stats = init_densify_stats(args.capacity)
    is_global = SortMode[args.sort_mode] == SortMode.GLOBAL
    if args.tile == "auto":
        tile_shape = (32, 16) if is_global else None
    else:
        tw, th = (int(v) for v in args.tile.split("x"))
        tile_shape = None if (tw, th) == (16, 16) else (tw, th)
    render_kwargs = dict(
        tile_shape=tile_shape,
        carry_bf16=is_global and not args.no_carry_bf16,
        rank_key=is_global and not args.no_rank_key,
    )
    if any(render_kwargs.values()):
        print(f"perf defaults: {render_kwargs}", flush=True)
    step_fn = jax.jit(make_train_step(
        optimizer, static=static, pair_capacity=args.pair_capacity,
        seg_cap=args.seg_cap, sh_ramp_every=args.sh_ramp_every,
        interpret=args.interpret, render_kwargs=render_kwargs,
    ))
    cam_arrays = [to_arrays(c) for c in cams]
    targets = jnp.asarray(targets)
    eval_arrays = [to_arrays(c) for c in eval_cams]
    eval_targets = jnp.asarray(eval_targets)
    cfg = DensifyConfig()

    def evaluate():
        vals = []
        for ca, tgt in zip(eval_arrays, eval_targets):
            img, *_ = render_model(
                state.model, ca, static=static,
                pair_capacity=args.pair_capacity, interpret=args.interpret,
                tile_shape=tile_shape)
            vals.append(float(psnr(img, tgt)))
        return sum(vals) / len(vals)

    order = rng.permutation(len(cams))
    pos = 0
    t0 = time.time()
    for it in range(1, args.iters + 1):
        if pos == len(order):
            order = rng.permutation(len(cams))
            pos = 0
        idx = int(order[pos])
        pos += 1
        state, stats, aux = step_fn(state, cam_arrays[idx], targets[idx],
                                    stats)

        if (args.densify_from <= it <= args.densify_until
                and it % args.densify_every == 0):
            model2, active, stats, info = densify_and_prune(
                state.model, active, stats,
                jax.random.PRNGKey(args.seed * 100_003 + it),
                scene_extent=args.scene_extent, cfg=cfg,
            )
            changed = jnp.any(
                model2.means3d != state.model.means3d, axis=-1)
            state = state._replace(
                model=model2,
                opt_state=reset_opt_slots(state.opt_state, changed))

        if it % args.opacity_reset_every == 0 and it < args.densify_until:
            model2 = reset_opacity(state.model, active)
            changed = model2.opacity_logit != state.model.opacity_logit
            state = state._replace(
                model=model2,
                opt_state=reset_opt_slots(state.opt_state, changed))

        if it % 100 == 0 or it == 1:
            loss = float(aux["loss"])
            n = int(active.sum())
            print(f"iter {it:6d}  loss {loss:.4f}  gaussians {n:7d}  "
                  f"({(time.time() - t0):.1f}s)", flush=True)
            if bool(aux.get("overflow", False)):
                print(f"iter {it:6d}  WARNING: pair buffer overflow — "
                      "raise --pair-capacity (image under-rendered)",
                      flush=True)
            if bool(aux.get("grad_overflow", False)):
                print(f"iter {it:6d}  WARNING: a tile exceeds seg_cap — "
                      "raise --seg-cap (pair gradients truncated)",
                      flush=True)
        if it % args.eval_every == 0:
            print(f"iter {it:6d}  eval PSNR {evaluate():.2f} dB", flush=True)
        if args.checkpoint_dir and it % args.checkpoint_every == 0:
            save_checkpoint(args.checkpoint_dir, state, step=it)

    print(f"final eval PSNR {evaluate():.2f} dB "
          f"({args.iters} iters, {(time.time() - t0):.1f}s)", flush=True)
    if args.out:
        save_gaussian_model(args.out, state.model)
        print(f"saved {args.out}", flush=True)
    if args.checkpoint_dir:
        save_checkpoint(args.checkpoint_dir, state, step=args.iters)
    return state


if __name__ == "__main__":
    main()
