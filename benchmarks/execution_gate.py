"""Hardware EXECUTION gate: on-chip renders must match the CPU pipeline.

The compile gate (compile_gate.py) proves Mosaic lowering; it cannot catch
wrong RESULTS. Round 3 found every on-chip render since round 2 collapsing
to background — int32 columns bitcast to f32 were denormal bit patterns
that the TPU gather flushed to zero, so every pair came out invalid — while
the full CPU test suite stayed green (CPU preserves the bits) and all
benchmarks "ran" (blending empty streams). This gate closes that hole: for
every sort mode and payload-path knob it renders one small scene on the
TPU and compares image + gradients against the SAME code on CPU
(interpret), plus a content assertion (the image must differ from pure
background — the check that catches a silent all-invalid collapse even if
both backends agreed on it).

Run FIRST (with the compile gate) in any on-chip sweep; red = do not ship:

    PYTHONPATH=$PYTHONPATH:/root/repo python benchmarks/execution_gate.py

Prints one JSON row per cell; exits 1 if any cell fails.

Tolerances: cross-backend f32 transcendental/accumulation differences are
~1e-6 relative per op; blends compound them to ~1e-4 worst case at this
scene scale. mean_abs < 1e-3 and max_abs < 3e-2 are an order above the
observed honest gap and many orders below any structural breakage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax

from stopthepop_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stopthepop_tpu.config import (
    ExtendedSettings,
    GaussianRasterizationSettings,
    GlobalSortOrder,
    SortMode,
)
from stopthepop_tpu.render.rasterize import rasterize_gaussians
from stopthepop_tpu.utils.testing import make_camera, random_scene

W = H = 48
N_GAUSS = 150
MEAN_TOL = 1e-3
MAX_TOL = 3e-2
GRAD_REL_TOL = 2e-2


def _settings(cam, mode, order=GlobalSortOrder.Z_DEPTH, k=None, hq=None,
              culling=False):
    s = ExtendedSettings()
    s.sort_settings.sort_mode = mode
    s.sort_settings.sort_order = order
    if k is not None:
        s.sort_settings.queue_sizes.per_pixel = k
    if hq is not None:
        qs = s.sort_settings.queue_sizes
        qs.tile_4x4, qs.tile_2x2, qs.per_pixel = hq
    if culling:
        s.culling_settings.rect_bounding = True
        s.culling_settings.tight_opacity_bounding = True
        s.culling_settings.tile_based_culling = True
    return GaussianRasterizationSettings(
        image_height=H, image_width=W, tanfovx=cam.tanfovx,
        tanfovy=cam.tanfovy, bg=jnp.array([0.15, 0.05, 0.3]),
        scale_modifier=1.0, viewmatrix=cam.viewmatrix,
        projmatrix=cam.projmatrix,
        inv_viewprojmatrix=cam.inv_viewprojmatrix, sh_degree=3,
        campos=cam.campos, prefiltered=False, settings=s,
    )


def cells():
    G, K, HI, F = (SortMode.GLOBAL, SortMode.PPX_KBUFFER, SortMode.HIER,
                   SortMode.PPX_FULL)
    PTD = GlobalSortOrder.PTD_MAX
    return [
        # (name, settings kwargs, render kwargs, env, check gradients)
        ("GLOBAL", dict(mode=G), {}, {}, True),
        ("GLOBAL rank_key", dict(mode=G), dict(rank_key=True), {}, True),
        ("GLOBAL 32x16", dict(mode=G), dict(tile_shape=(32, 16)), {}, True),
        ("GLOBAL bf16", dict(mode=G), dict(carry_bf16=True), {}, True),
        ("GLOBAL culling", dict(mode=G, culling=True), {}, {}, False),
        ("GLOBAL PTD_MAX", dict(mode=G, order=PTD), {}, {}, False),
        ("KBUFFER k=4 PTD", dict(mode=K, order=PTD, k=4), {}, {}, True),
        ("KBUFFER k=4 G=4", dict(mode=K, order=PTD, k=4), {},
         {"STP_KB_GROUP": "4", "STP_KB_GROUP_BWD": "4"}, True),
        ("HIER 16/8/4", dict(mode=HI, order=PTD, hq=(16, 8, 4)), {}, {},
         True),
        # On chip the forward group clamps to 2 (tuning.resolve_hier_groups:
        # G>=4 at 64/8/4 overflows the Mosaic scoped-vmem stack), so this
        # cell truly exercises forward G=2 with backward G=3 — the label
        # says so (round-4 advice: the old "G=3" name overstated coverage).
        ("HIER 16/8/4 G=2fwd/3bwd", dict(mode=HI, order=PTD, hq=(16, 8, 4)),
         {}, {"STP_HIER_GROUP": "3", "STP_HIER_GROUP_BWD": "3"}, True),
        # bcasc's reference is the (gated) TPU per-entry kernel: its CPU
        # interpret graph is too large to compile (the reason
        # verify_batched_cascade.py exists).
        # Tolerance note: bcasc legitimately reorders emissions within a
        # sub-batch (sorted locally — closer to the true resort), so
        # isolated pixels may differ visibly from per-entry while the mean
        # stays ~1e-5; its max tolerance reflects the design, not noise.
        ("HIER bcasc", dict(mode=HI, order=PTD, hq=(16, 8, 4)),
         dict(batched_cascade=True, _ref="tpu_per_entry",
              _max_tol=0.1), {}, False),
        ("FULL tiled", dict(mode=F), dict(full_mode="tiled", seg_full=512),
         {}, False),
    ]


def run_cell(scene, cam, skw, rkw, grads, device, interpret):
    rs = _settings(cam, **skw)
    dev_args = jax.tree.map(
        lambda x: jax.device_put(np.asarray(x), device),
        (scene.means3d, scene.shs, scene.opacities, scene.scales,
         scene.rotations),
    )
    means, shs, ops, scales, rots = dev_args
    with jax.default_device(device):
        def render(m):
            img, _ = rasterize_gaussians(
                m, None, shs, None, ops, scales, rots, None, rs,
                interpret=interpret, pair_capacity=2048, **rkw,
            )
            return img

        img = np.asarray(render(means))
        g = None
        if grads:
            g = np.asarray(jax.grad(
                lambda m: jnp.sum(render(m) ** 2)
            )(means))
    return img, g


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    if jax.default_backend() == "cpu":
        print(json.dumps({"gate": "SKIP", "reason": "no TPU backend"}))
        return 0
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    cam = make_camera(W, H)
    with jax.default_device(cpu):
        scene = random_scene(jax.random.PRNGKey(8), N_GAUSS)
        scene = jax.tree.map(np.asarray, scene)
    bg = np.array([0.15, 0.05, 0.3])

    failures = 0
    for name, skw, rkw, env, grads in cells():
        if args.only and args.only not in name:
            continue
        saved = {kk: os.environ.get(kk) for kk in env}
        os.environ.update(env)
        t0 = time.time()
        try:
            ref = rkw.pop("_ref", None)
            max_tol = rkw.pop("_max_tol", MAX_TOL)
            if ref == "tpu_per_entry":
                rkw_ref = {k: v for k, v in rkw.items()
                           if k != "batched_cascade"}
                img_c, g_c = run_cell(scene, cam, skw, rkw_ref, grads, tpu,
                                      False)
            else:
                img_c, g_c = run_cell(scene, cam, skw, rkw, grads, cpu, True)
            img_t, g_t = run_cell(scene, cam, skw, rkw, grads, tpu, False)
            diff = np.abs(img_c - img_t)
            content = float(np.abs(img_t - bg[:, None, None]).mean())
            row = {
                "cell": name,
                "mean_abs": round(float(diff.mean()), 6),
                "max_abs": round(float(diff.max()), 5),
                "content": round(content, 5),
                "s": round(time.time() - t0, 1),
            }
            ok = (diff.mean() < MEAN_TOL and diff.max() < max_tol
                  and content > 1e-3)
            if grads:
                gd = float(np.abs(g_c - g_t).max())
                gs = float(np.abs(g_c).max())
                row["grad_rel"] = round(gd / max(gs, 1e-12), 6)
                ok = ok and row["grad_rel"] < GRAD_REL_TOL and np.isfinite(
                    g_t).all()
            row["ok"] = bool(ok)
            failures += 0 if ok else 1
            print(json.dumps(row), flush=True)
        except Exception as exc:  # noqa: BLE001 - the row IS the report
            failures += 1
            print(json.dumps({
                "cell": name, "ok": False,
                "error": f"{type(exc).__name__}: {exc}"[:300],
            }), flush=True)
        finally:
            for kk, vv in saved.items():
                if vv is None:
                    os.environ.pop(kk, None)
                else:
                    os.environ[kk] = vv
    print(json.dumps(
        {"gate": "GREEN" if failures == 0 else f"RED ({failures} cells)"}
    ), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
