"""Benchmark suite over the BASELINE.md configs.

Usage:
    python benchmarks/run.py --config 1            # oracle scale, CPU ok
    python benchmarks/run.py --config 2            # lego scale, all modes
    python benchmarks/run.py --config 3            # garden scale, GLOBAL
    python benchmarks/run.py --config 4            # training step, 1080p
    python benchmarks/run.py --all

Each config prints one JSON line per measurement:
  {"config": N, "case": "...", "value": X, "unit": "Mpix/s"}.
Timing is device-only (iteration loop inside one jit fori_loop).
The headline driver metric stays in bench.py (config 4 equivalent).
"""

from __future__ import annotations

import argparse
import json
import time

import jax

from stopthepop_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
import jax.numpy as jnp

from stopthepop_tpu.config import (
    ExtendedSettings,
    GaussianRasterizationSettings,
    SortMode,
)
from stopthepop_tpu.models.gaussians import init_random
from stopthepop_tpu.train.loss import rgb_loss
from stopthepop_tpu.train.trainer import CameraArrays, render_model
from stopthepop_tpu.utils.testing import make_camera


def _scene(width, height, num_gaussians, scale_shift, seed=0):
    cam = make_camera(width, height, campos=(0.0, 0.0, -4.0))
    model = init_random(jax.random.PRNGKey(seed), num_gaussians, extent=1.5)
    model = model._replace(scales_log=model.scales_log + scale_shift)
    cams = CameraArrays(
        cam.viewmatrix, cam.projmatrix, cam.inv_viewprojmatrix, cam.campos
    )
    return cam, model, cams


def _static(cam, width, height, sort_mode, **flags):
    s = ExtendedSettings()
    s.sort_settings.sort_mode = sort_mode
    for key, val in flags.items():
        s.culling_settings.set_value(key, val)
    return GaussianRasterizationSettings(
        image_height=height, image_width=width,
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        bg=jnp.zeros(3), scale_modifier=1.0,
        viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
        inv_viewprojmatrix=cam.inv_viewprojmatrix,
        sh_degree=3, campos=cam.campos, prefiltered=False, settings=s,
    )


def _timed(fn, arg, iters):
    @jax.jit
    def run(a):
        def it(i, acc):
            out = fn(a, acc)
            return acc + out
        return jax.lax.fori_loop(0, iters, it, jnp.float32(0.0))

    jax.block_until_ready(run(arg))
    t0 = time.time()
    jax.block_until_ready(run(arg))
    return (time.time() - t0) / iters


def emit(config, case, px, dt):
    print(json.dumps({
        "config": config,
        "case": case,
        "value": round(px / dt / 1e6, 3),
        "unit": "Mpix/s",
        "ms_per_iter": round(dt * 1000, 2),
    }), flush=True)


def bench_mode(config, case, *args, **kwargs):
    """Per-cell isolation: one broken (config, mode) must not abort the
    table (round-2 run_all died at config-1 HIER and produced nothing for
    configs 2-4). Errors become rows."""
    try:
        _bench_mode(config, case, *args, **kwargs)
    except Exception as exc:  # noqa: BLE001 - the row IS the report
        print(json.dumps({
            "config": config,
            "case": case,
            "error": f"{type(exc).__name__}: {exc}"[:300],
        }), flush=True)


def _bench_mode(config, case, width, height, num_gaussians, scale_shift,
                capacity, sort_mode, backward, iters, **flags):
    cam, model, cams = _scene(width, height, num_gaussians, scale_shift)
    static = _static(cam, width, height, sort_mode, **flags)
    interpret = jax.default_backend() != "tpu"
    target = jax.random.uniform(jax.random.PRNGKey(1), (3, height, width))
    # Size the static pair buffer to the measured stream (the trainer CLI
    # does the same; a blind capacity inflates every sort/gather domain).
    from stopthepop_tpu.render.preprocess import preprocess as _pp

    prep = _pp(
        model.means3d, model.opacities(), scales=model.scales(),
        rotations=model.rotations_normalized(), shs=model.shs(),
        viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
        campos=cam.campos, tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        image_width=width, image_height=height, sh_degree=0,
    )
    measured = int(jnp.sum(prep.tiles_touched))
    capacity = min(capacity, (int(measured * 1.1) + 127) // 128 * 128)

    def loss_fn(model):
        color, _ = render_model(
            model, cams, static=static, pair_capacity=capacity,
            interpret=interpret,
        )
        return rgb_loss(color, target)

    if backward:
        g = jax.grad(loss_fn)

        def step(model, acc):
            grads = g(model._replace(means3d=model.means3d + acc * 1e-12))
            return jnp.mean(grads.means3d)
    else:
        def step(model, acc):
            return loss_fn(model._replace(means3d=model.means3d + acc * 1e-12))

    dt = _timed(step, model, iters)
    emit(config, case, width * height, dt)


def config1():
    """Oracle scale: 10K Gaussians at 256x256, all sort modes, fwd+bwd."""
    for mode in (SortMode.GLOBAL, SortMode.PPX_KBUFFER, SortMode.HIER):
        bench_mode(1, f"{mode.name} fwd+bwd", 256, 256, 10_000, -1.0,
                   80_000, mode, True, 10)


def config2():
    """Lego scale: 100K Gaussians at 800x800, all modes, fwd and fwd+bwd."""
    for mode in (SortMode.GLOBAL, SortMode.PPX_KBUFFER, SortMode.HIER):
        bench_mode(2, f"{mode.name} fwd", 800, 800, 100_000, -2.0,
                   800_000, mode, False, 5)
        bench_mode(2, f"{mode.name} fwd+bwd", 800, 800, 100_000, -2.0,
                   800_000, mode, True, 5)


def config3():
    """Garden scale at 1080p, GLOBAL: 2M (default settings) and the full
    ~5M-Gaussian point count (BASELINE config 3). Capacity is auto-sized
    from the measured pair stream inside bench_mode; the 5M scene uses
    smaller splats (as a real 5M-point capture does) so the pair stream
    stays in the same regime as the reference scene."""
    bench_mode(3, "GLOBAL fwd", 1920, 1080, 2_000_000, -2.8,
               6_000_000, SortMode.GLOBAL, False, 3)
    bench_mode(3, "GLOBAL fwd+bwd", 1920, 1080, 2_000_000, -2.8,
               6_000_000, SortMode.GLOBAL, True, 3)
    bench_mode(3, "GLOBAL 5M fwd", 1920, 1080, 5_000_000, -3.3,
               16_000_000, SortMode.GLOBAL, False, 3)
    bench_mode(3, "GLOBAL 5M fwd+bwd", 1920, 1080, 5_000_000, -3.3,
               16_000_000, SortMode.GLOBAL, True, 3)


def config4():
    """Training step (same as bench.py): 500K at 1080p, L1+D-SSIM."""
    bench_mode(4, "train step", 1920, 1080, 500_000, -2.3,
               2_200_000, SortMode.GLOBAL, True, 10)


CONFIGS = {1: config1, 2: config2, 3: config3, 4: config4}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, choices=sorted(CONFIGS))
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()
    if args.all:
        for fn in CONFIGS.values():
            fn()
    elif args.config:
        CONFIGS[args.config]()
    else:
        ap.error("pass --config N or --all")


if __name__ == "__main__":
    main()
