"""Per-kernel device-time breakdown of the headline train step.

Runs bench.py's train step under ``jax.profiler`` and aggregates the
device-side op durations from the emitted perfetto trace — the automated
version of the "where the time goes" table in PERFORMANCE.md (the analog of
the reference's stage Timer, rasterizer_impl.h:77-147, with per-fusion
resolution instead of 4 coarse stages).

Wall-clock microbenchmarks through the axon tunnel lie (cached repeats
return instantly); profiler device durations are one of the two trusted
timing sources. Usage:

    PYTHONPATH=/root/repo python benchmarks/profile_step.py \
        [--tile 32x16] [--carry-bf16] [--no-culling] [--top 30]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import tempfile

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


def build_step(args):
    width, height = args.width, args.height
    interpret = jax.default_backend() != "tpu"
    cam = make_camera(width, height, campos=(0.0, 0.0, -4.0))
    model = init_random(jax.random.PRNGKey(0), args.gaussians, extent=1.5)
    model = model._replace(scales_log=model.scales_log + args.scale_shift)
    cams = CameraArrays(
        cam.viewmatrix, cam.projmatrix, cam.inv_viewprojmatrix, cam.campos
    )
    target = jax.random.uniform(jax.random.PRNGKey(1), (3, height, width))
    tile_shape = None
    if args.tile and args.tile != "16x16":
        tx, ty = (int(v) for v in args.tile.split("x"))
        tile_shape = (tx, ty)

    from stopthepop_tpu.render.preprocess import preprocess

    tx, ty = tile_shape if tile_shape else (16, 16)
    prep = preprocess(
        model.means3d, model.opacities(), scales=model.scales(),
        rotations=model.rotations_normalized(), shs=model.shs(),
        viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
        campos=cam.campos, tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        image_width=width, image_height=height, sh_degree=0,
        rect_bounding=not args.no_culling,
        tight_opacity_bounding=not args.no_culling,
        tile_x=tx, tile_y=ty,
    )
    capacity = (int(int(jnp.sum(prep.tiles_touched)) * 1.1) + 127) // 128 * 128

    settings = ExtendedSettings()
    settings.sort_settings.sort_mode = SortMode[args.mode]
    if args.queues:
        kt, km, kh = (int(v) for v in args.queues.split(","))
        settings.sort_settings.queue_sizes.tile_4x4 = kt
        settings.sort_settings.queue_sizes.tile_2x2 = km
        settings.sort_settings.queue_sizes.per_pixel = kh
    settings.culling_settings.rect_bounding = not args.no_culling
    settings.culling_settings.tight_opacity_bounding = not args.no_culling
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
            tile_shape=tile_shape, carry_bf16=args.carry_bf16,
            rank_key=args.rank_key, pack_fwd=args.pack_fwd,
            batched_cascade=args.batched_cascade,
            interpret=interpret,
        )
        return rgb_loss(color, target)

    grad = jax.grad(loss_fn)

    @jax.jit
    def run(m):
        def it(i, acc):
            m2 = m._replace(means3d=m.means3d + acc * 1e-12)
            if args.fwd_only:
                return acc + loss_fn(m2)
            return acc + jnp.mean(grad(m2).means3d)
        return jax.lax.fori_loop(0, args.iters, it, jnp.float32(0.0))

    return run, model, capacity


def device_exclusive_totals(trace_dir):
    """Per-op EXCLUSIVE device durations from the latest perfetto trace.

    Trace spans on a device track nest (jit_run > while > fusion ...); a
    naive sum counts every parent on top of its children, overstating the
    step several-fold (round-2 verdict weak #4). Here each track's spans
    are walked with a nesting stack and a child's duration is subtracted
    from its parent, so the per-op numbers are exclusive self-time and the
    returned ``top_us`` (sum of top-level spans) is the true device-busy
    time.

    Returns (totals: {op: exclusive_us}, top_us).
    """
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        raise SystemExit(f"no perfetto trace under {trace_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Device tracks: on TPU the process name looks like "/device:TPU:0";
    # on CPU ops land under "/host:CPU" on "tf_XLA*" executor threads.
    # A device pid carries SEVERAL sibling threads ("Steps" with the "0"
    # span, "XLA Modules" with jit_run(...), "XLA Ops" with the real op
    # spans) whose top-level spans all cover the same wall interval —
    # summing every track's top level triple-counts the step. Only the
    # "XLA Ops" thread feeds per-op totals; the module thread (or, absent
    # one, the ops sum) provides the step total.
    device_pids, xla_tids = set(), set()
    ops_tids, module_tids = set(), set()
    for e in events:
        if e.get("ph") != "M":
            continue
        name = e.get("args", {}).get("name", "")
        if e.get("name") == "process_name":
            if re.search(r"TPU|device", name, re.I) and "host" not in name.lower():
                device_pids.add(e.get("pid"))
        elif e.get("name") == "thread_name":
            key = (e.get("pid"), e.get("tid"))
            if name.startswith("tf_XLA"):
                xla_tids.add(key)
            if "XLA Ops" in name:
                ops_tids.add(key)
            elif "XLA Modules" in name:
                module_tids.add(key)
    tracks = {}
    module_us = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        key = (e.get("pid"), e.get("tid"))
        on_device = e.get("pid") in device_pids
        if on_device and key in module_tids:
            module_us += float(e.get("dur", 0.0))
            continue
        if device_pids:
            # Restrict to the op thread when thread names identify one;
            # otherwise fall back to every device-track span (old traces).
            if ops_tids:
                if key not in ops_tids:
                    continue
            elif not on_device:
                continue
        elif key not in xla_tids:
            continue
        tracks.setdefault(key, []).append(
            (float(e.get("ts", 0.0)), float(e.get("dur", 0.0)),
             e.get("name", "?"))
        )
    totals = {}
    top_us = 0.0
    for spans in tracks.values():
        spans.sort(key=lambda s: (s[0], -s[1]))  # parents before children
        stack = []  # [end_ts, name, exclusive_us]
        for ts, dur, name in spans:
            while stack and ts >= stack[-1][0]:
                _, n, excl = stack.pop()
                totals[n] = totals.get(n, 0.0) + max(excl, 0.0)
            if stack:
                stack[-1][2] -= dur  # child time is not parent self-time
            else:
                top_us += dur
            stack.append([ts + dur, name, dur])
        while stack:
            _, n, excl = stack.pop()
            totals[n] = totals.get(n, 0.0) + max(excl, 0.0)
    return totals, (module_us or top_us)


def collect(trace_dir, iters, top):
    """Print the exclusive-time breakdown of a traced run."""
    totals, top_us = device_exclusive_totals(trace_dir)
    rows = sorted(totals.items(), key=lambda kv: -kv[1])
    total_us = sum(totals.values())
    print(f"# device total: {top_us / 1e3 / iters:.2f} ms/iter "
          f"(exclusive-sum {total_us / 1e3 / iters:.2f}) over {iters} iters")
    for name, us in rows[:top]:
        print(json.dumps({
            "op": name[:100],
            "ms_per_iter": round(us / 1e3 / iters, 3),
            "pct": round(100.0 * us / max(total_us, 1e-9), 1),
        }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--gaussians", type=int, default=500_000)
    ap.add_argument("--scale-shift", type=float, default=-2.3,
                    help="log-scale shift for the random scene (run.py's "
                         "config 3 at 5M uses -3.3 to keep the pair stream "
                         "in a real capture's regime)")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--tile", default="16x16")
    ap.add_argument("--mode", default="GLOBAL",
                    choices=[m.name for m in SortMode])
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--carry-bf16", action="store_true")
    ap.add_argument("--rank-key", action="store_true")
    ap.add_argument("--pack-fwd", action="store_true")
    ap.add_argument("--batched-cascade", action="store_true")
    ap.add_argument("--queues", default=None,
                    help="hier queue sizes 'kt,km,kh' (default 64,8,4)")
    ap.add_argument("--no-culling", action="store_true")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--dump-hlo", default=None, metavar="PATH",
                    help="write the compiled (post-optimization) HLO text "
                         "here — its fusion.N names match the profiler's "
                         "op names, so the 'where do the ms go' table can "
                         "be resolved to actual ops")
    args = ap.parse_args()

    run, model, capacity = build_step(args)
    if args.dump_hlo:
        txt = run.lower(model).compile().as_text()  # run is already jitted
        with open(args.dump_hlo, "w") as f:
            f.write(txt)
        print(f"# hlo -> {args.dump_hlo} ({len(txt)} bytes)")
    jax.block_until_ready(run(model))  # compile + warm outside the trace
    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="stp_trace_")
    with jax.profiler.trace(trace_dir, create_perfetto_trace=True):
        jax.block_until_ready(run(model))
    print(f"# capacity={capacity} trace={trace_dir}")
    collect(trace_dir, args.iters, args.top)


if __name__ == "__main__":
    main()
