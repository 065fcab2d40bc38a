"""Single home for kernel tuning knobs resolved from the environment.

Round-4 advice: group defaults were read from env inside lru_cached kernel
factories AND re-clamped in pipeline.py with slightly different reach — two
drifting copies. Every env default and on-chip clamp now lives here; both
the factories (kernels/blend_vjp.py) and the pipeline wrappers call these
helpers and pass explicit values down.
"""

from __future__ import annotations

import os

import jax


def resolve_kb_groups(interpret: bool) -> tuple[int, int]:
    """(forward, backward) lane-width groups for the k-buffer blend.

    Forward G=2 is the measured on-chip winner (33.6 -> 21.4 ms at config
    2, results_r4/prof_kbuf_g2_fwd); the backward's per-pop moment routing
    scales with the lane width and defaults to per-tile.
    """
    g = int(os.environ.get("STP_KB_GROUP", "2"))
    gb = int(os.environ.get("STP_KB_GROUP_BWD", "1"))
    return g, gb


def resolve_hier_groups(interpret: bool) -> tuple[int, int]:
    """(forward, backward) lane-width groups for the hierarchical blend.

    Forward G=2 is the measured winner (182 -> 122 ms at config 2); G>=4 at
    64/8/4 queues exceeds the 16 MB Mosaic scoped-vmem stack on v5e
    (results_r4/gate_full), so the forward clamps to 2 on the chip
    (interpret mode has no vmem stack — tests cover G=3).
    """
    g = int(os.environ.get("STP_HIER_GROUP", "2"))
    if not interpret:
        g = min(2, g)
    # Backward default G=2 (round 5): with the cheap split-routing dots the
    # grouped replay WINS (327.4 vs 368.9 ms per-tile at config 2,
    # results_r5/prof_hier_b_def_g2 vs prof_hier_b_split) — the r4
    # regression was the routing cost scaling with lane width, now gone.
    # Not clamped: G=4 compiled and ran on chip (results_r4/prof_hier_g4).
    gb = int(os.environ.get("STP_HIER_GROUP_BWD", "2"))
    return g, gb


def resolve_route_precision() -> jax.lax.Precision:
    """MXU precision of the backward one-hot routing dots.

    The replay's per-pop cost is dominated by these dots; with f32 inputs
    the TPU MXU emulates f32 in bf16 passes — HIGHEST is 6 passes, HIGH 3,
    DEFAULT 1. The one-hot operand is exactly representable at any
    precision, so lowering only rounds the routed moment addends (the
    gradient contributions) to bf16 products — the same information loss as
    the reference's non-deterministic fp32 atomicAdd ordering is in
    practice (resorted_render.cuh:351-381), and it is quality-gated by the
    400-iteration fit in benchmarks/quality_defaults.py.

    The default is "split": exact bf16-split routing (see
    kbuffer_blend.route_moment_dots) — 1-pass MXU cost with ~2^-17
    relative error. Plain DEFAULT (lossy 1-pass bf16) FAILED the on-chip
    5e-3 gradient verify at rel 3.4e-2 (results_r5/verify_hier_def);
    HIGHEST (6-pass) measured 164.5 vs DEFAULT's 74.7 ms on the config-2
    k-buffer step. Override with
    STP_ROUTE_PRECISION={split,default,highest}; the full measured ladder
    lives in PERFORMANCE.md. (Precision.HIGH is NOT offered: Mosaic
    rejects it — 'Unsupported dot precision: HIGH',
    results_r5/prof_kbuf_b_high.log — and split dominates it anyway.)
    """
    name = os.environ.get("STP_ROUTE_PRECISION", "split").lower()
    return {
        "split": "split",
        "default": jax.lax.Precision.DEFAULT,
        "highest": jax.lax.Precision.HIGHEST,
    }[name]


def resolve_use_recon() -> bool:
    """Slot-reconstruction vs carried-slot for the payload gather VJP.

    Recon drops the sort's carried slot operand at the cost of 4 extra
    gathered recon columns; it was the measured winner in the 2-key-sort
    era. With the packed rank-key default (ONE sort key) the tradeoff
    flipped — measured round 5, same session: carried-slot is better at
    every scale (5M step 539.2 -> 528.4 ms, headline 25.74 -> 25.81
    Mpix/s, config-4 combo flat; results_r5/prof_global_5m_ns,
    bench_ns) — so carried-slot is the DEFAULT and STP_RECON=1 A/Bs the
    reconstruction path back.
    """
    return os.environ.get("STP_RECON", "0") == "1"
