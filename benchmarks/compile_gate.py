"""Hardware compile gate: AOT-compile the kernel dispatch matrix on TPU.

Round-2 shipped a hier kernel that passed every CPU interpret test but
failed Mosaic lowering on the real chip ("Unsupported target bitwidth for
truncation") — nothing in CI exercised the TPU compiler. This gate is the
fix: it ``jax.jit(...).lower(...).compile()``s every (sort mode, queue set,
knob, direction) cell of the dispatch matrix against the TPU backend — no
execution, so a red cell is pure compiler evidence. The reference's analog
is its always-instantiated template matrix (forward.cu:388-494,
backward.cu:691-772): a CUDA build fails at compile time if any variant is
broken; this script makes our Pallas variants fail the same way.

Usage (run FIRST in any on-chip sweep; red gate = do not ship):

    PYTHONPATH=/root/repo python benchmarks/compile_gate.py --quick
    PYTHONPATH=/root/repo python benchmarks/compile_gate.py          # full

Prints one JSON row per cell; exits 1 if any cell fails.

The gate compiles at 256x256 (compile time, not runtime, is the budget;
the Mosaic kernel body is identical at production sizes — only the grid
and capacities differ).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax

from stopthepop_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
import jax.numpy as jnp

from stopthepop_tpu.config import (
    ExtendedSettings,
    GaussianRasterizationSettings,
    GlobalSortOrder,
    SortMode,
)
from stopthepop_tpu.models.gaussians import init_random
from stopthepop_tpu.train.loss import rgb_loss
from stopthepop_tpu.train.trainer import CameraArrays, render_model
from stopthepop_tpu.utils.testing import make_camera

W = H = 256
CAPACITY = 16_384


def _static(mode, cam, order=GlobalSortOrder.Z_DEPTH, k=None, hq=None):
    s = ExtendedSettings()
    s.sort_settings.sort_mode = mode
    s.sort_settings.sort_order = order
    if k is not None:
        s.sort_settings.queue_sizes.per_pixel = k
    if hq is not None:
        qs = s.sort_settings.queue_sizes
        qs.tile_4x4, qs.tile_2x2, qs.per_pixel = hq
    return GaussianRasterizationSettings(
        image_height=H, image_width=W,
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        bg=jnp.zeros(3), scale_modifier=1.0,
        viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
        inv_viewprojmatrix=cam.inv_viewprojmatrix,
        sh_degree=3, campos=cam.campos, prefiltered=False, settings=s,
    )


def cells(quick: bool):
    """Yield (name, static_kwargs, render_kwargs, backward)."""
    G, K, HI, F = (SortMode.GLOBAL, SortMode.PPX_KBUFFER, SortMode.HIER,
                   SortMode.PPX_FULL)
    PTD = GlobalSortOrder.PTD_MAX
    out = [
        # one cell per kernel family first: a quick gate still covers every
        # Pallas kernel's fwd AND bwd lowering
        ("GLOBAL fwd+bwd", dict(mode=G), {}, True),
        ("KBUFFER k=16 fwd+bwd", dict(mode=K, order=PTD, k=16), {}, True),
        ("HIER 64/8/4 fwd+bwd", dict(mode=HI, order=PTD, hq=(64, 8, 4)),
         {}, True),
        ("FULL tiled fwd", dict(mode=F),
         dict(full_mode="tiled", seg_full=1024), False),
    ]
    if quick:
        return out
    out += [
        ("GLOBAL fwd", dict(mode=G), {}, False),
        ("GLOBAL rank_key fwd+bwd", dict(mode=G), dict(rank_key=True), True),
        ("GLOBAL bf16 fwd+bwd", dict(mode=G), dict(carry_bf16=True), True),
        ("GLOBAL 32x16 fwd+bwd", dict(mode=G),
         dict(tile_shape=(32, 16)), True),
        ("GLOBAL combo fwd+bwd", dict(mode=G),
         dict(rank_key=True, carry_bf16=True, tile_shape=(32, 16)), True),
        ("GLOBAL PTD_MAX fwd+bwd", dict(mode=G, order=PTD), {}, True),
        ("KBUFFER k=4 fwd+bwd", dict(mode=K, order=PTD, k=4), {}, True),
        ("KBUFFER k=16 fwd", dict(mode=K, order=PTD, k=16), {}, False),
        ("KBUFFER k=16 bf16 fwd+bwd", dict(mode=K, order=PTD, k=16),
         dict(carry_bf16=True), True),
        ("HIER 64/8/4 fwd", dict(mode=HI, order=PTD, hq=(64, 8, 4)),
         {}, False),
        ("HIER 16/8/4 fwd+bwd", dict(mode=HI, order=PTD, hq=(16, 8, 4)),
         {}, True),
        # bcasc is PARKED forward-only (2x slower than per-entry and its
        # backward exceeds the Mosaic scoped-memory stack at compile —
        # see verify_batched_cascade.py); gate what is shippable.
        ("HIER bcasc fwd", dict(mode=HI, order=PTD, hq=(64, 8, 4)),
         dict(batched_cascade=True), False),
        ("HIER 64/12/8 fwd+bwd", dict(mode=HI, order=PTD, hq=(64, 12, 8)),
         {}, True),
        ("FULL tiled seg4096 fwd", dict(mode=F),
         dict(full_mode="tiled", seg_full=4096), False),
        # Grouped-tile kbuffer (lane axis = G x 256, STP_KB_GROUP analog):
        # the group is a direct kwarg on the blend factory via env in prod;
        # here the env var is set around the cell (see main).
        ("KBUFFER k=16 G=4 fwd+bwd", dict(mode=K, order=PTD, k=16),
         dict(_env={"STP_KB_GROUP": "4", "STP_KB_GROUP_BWD": "4"}), True),
        ("KBUFFER k=16 G=8 fwd", dict(mode=K, order=PTD, k=16),
         dict(_env={"STP_KB_GROUP": "8"}), False),
        # Grouped-tile hierarchical (round 4: the kbuffer lane widening
        # ported to the cascade, hier_blend._fwd_kernel group param).
        # G=4 at 64/8/4 overflows the 16 MB Mosaic scoped-vmem stack on
        # v5e (r4 gate run) — the knob is clamped to 2 in the pipeline, so
        # gate the shippable G=2 cell.
        ("HIER 64/8/4 G=2 fwd+bwd", dict(mode=HI, order=PTD, hq=(64, 8, 4)),
         dict(_env={"STP_HIER_GROUP": "2", "STP_HIER_GROUP_BWD": "1"}), True),
        ("HIER 16/8/4 G=2 fwd", dict(mode=HI, order=PTD, hq=(16, 8, 4)),
         dict(_env={"STP_HIER_GROUP": "2"}), False),
    ]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="one cell per kernel family (4 compiles)")
    ap.add_argument("--only", default=None,
                    help="substring filter on cell names")
    args = ap.parse_args()

    if jax.default_backend() != "tpu":
        print(json.dumps({"gate": "SKIP", "reason":
                          f"backend={jax.default_backend()} (need tpu)"}))
        return 0

    cam = make_camera(W, H, campos=(0.0, 0.0, -4.0))
    model = init_random(jax.random.PRNGKey(0), 4096, extent=1.5)
    model = model._replace(scales_log=model.scales_log - 1.0)
    cams = CameraArrays(
        cam.viewmatrix, cam.projmatrix, cam.inv_viewprojmatrix, cam.campos
    )
    target = jnp.zeros((3, H, W))

    import os

    failures = 0
    for name, skw, rkw, backward in cells(args.quick):
        if args.only and args.only not in name:
            continue
        env = rkw.pop("_env", {})
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        static = _static(cam=cam, **skw)

        def loss_fn(m):
            color, _ = render_model(
                m, cams, static=static, pair_capacity=CAPACITY, **rkw,
            )
            return rgb_loss(color, target)

        fn = jax.grad(loss_fn) if backward else loss_fn
        t0 = time.time()
        try:
            jax.jit(fn).lower(model).compile()
            print(json.dumps({
                "cell": name, "ok": True,
                "compile_s": round(time.time() - t0, 1),
            }), flush=True)
        except Exception as exc:  # noqa: BLE001 - the row IS the report
            failures += 1
            print(json.dumps({
                "cell": name, "ok": False,
                "compile_s": round(time.time() - t0, 1),
                "error": f"{type(exc).__name__}: {exc}"[:400],
            }), flush=True)
        finally:
            for kk, vv in saved.items():
                if vv is None:
                    os.environ.pop(kk, None)
                else:
                    os.environ[kk] = vv
    verdict = "GREEN" if failures == 0 else f"RED ({failures} cells)"
    print(json.dumps({"gate": verdict}), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
