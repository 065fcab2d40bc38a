"""Pallas TPU kernels: HIERARCHICAL sort-mode tile blend.

TPU-native re-architecture of the paper's hierarchical resorting renderer
(hierarchical_render.cuh:207-1175). Semantics are defined by
render/naive.py::render_hierarchical_naive (see the design discussion there):
three sorted windows per pixel group — tail per 4x4 sub-tile (keyed at the
sub-tile-center ray), mid per 2x2 quad (quad-center ray), head per pixel
(exact ray) — cascading front-pops down the hierarchy; the head pop is the
blend.

Layout: every window lives in VMEM as [K, 256] arrays (window slots on
sublanes, the tile's 256 pixels on lanes). Tail/mid state is replicated
across its pixel group — group-uniform by construction, since entry/pop
decisions are group-level — which turns the reference's warp-shuffle
plumbing into plain full-width vector selects with zero cross-lane traffic.
All three per-level depths are evaluated vectorized at chunk intake (one
fused pass over [256, CH]), so window entries carry plain floats and no
inverse-covariance payload.

Payload: shared with the k-buffer kernel ([32, C_pad] feature-major,
kbuffer_blend.py) plus row 18 = log(opacity/alpha_threshold), the
tile/sub-tile culling power threshold (forward.cu:152-161).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import (
    ALPHA_MAX,
    ALPHA_THRESHOLD,
    RAY_DEPTH_DEN_FLOOR,
    T_THRESHOLD,
    TAIL_BATCH,
    TILE_PIXELS,
    TILE_X,
    TILE_Y,
)
from .full_blend import _bitonic_planes
from .kbuffer_blend import route_moment_dots
from .kbuffer_blend import (
    KB_PAYLOAD_F,
    _tile_pixels_lanes,
    _tile_pixels_sublanes,
    _view_rays,
    group_tiles,
    moments_to_grads,
)

# ad_scr staging rows (all [CH, 256] pixels-on-lanes):
#   0 a_eff | 1 d_tail | 2 d_mid | 3 d_head | 4 v_tail | 5 r | 6 g | 7 b
FWD_STAGE = 8

# Unroll factor of the per-entry cascade fori_loop (a measured speed knob:
# Mosaic serializes loop trips; unrolling trades icache/compile time for
# pipeline overlap). Env-tunable for on-chip sweeps (benchmarks/TPU_QUEUE.md).
import os as _os

CASC_UNROLL = int(_os.environ.get("STP_HIER_UNROLL", "2"))


def _fori_unrolled(n, body, carry, unroll):
    """fori_loop over a static trip count with a Mosaic-compatible unroll.

    Mosaic's loop lowering accepts only unroll=1 or a full unroll, so
    unroll-by-U is expressed as an outer sequential loop over n // U groups
    whose body inlines U consecutive steps (U snapped down to a divisor).
    """
    u = max(1, min(int(unroll), n))
    while n % u:
        u -= 1
    if u != unroll and unroll > 1:
        import warnings

        warnings.warn(
            f"STP_HIER_UNROLL={unroll} is not a divisor of the trip count "
            f"{n}; using effective unroll {u} (label sweeps accordingly)",
            stacklevel=2,
        )
    if u == n:
        for e in range(n):
            carry = body(e, carry)
        return carry

    def group(g, c):
        for j in range(u):
            c = body(g * u + j, c)
        return c

    return jax.lax.fori_loop(0, n // u, group, carry)

# Window field layouts (leading row = sort key):
TAIL_F = 7  # key(d_tail), d_mid, d_head, a, r, g, b
MID_F = 6   # key(d_mid), d_head, a, r, g, b
HEAD_F = 5  # key(d_head), a, r, g, b


def _ray_depth(data, vd):
    """Exact max-contribution depth along per-pixel rays.

    data [32, CH]; vd = (vdx, vdy, vdz) [256, 1]. Returns [256, CH].
    Mirrors ops.stopthepop.depth_along_ray.
    """
    vdx, vdy, vdz = vd
    ixx, ixy, ixz, iyy, iyz, izz = (data[i:i + 1, :] for i in range(9, 15))
    u0, u1, u2 = (data[i:i + 1, :] for i in range(15, 18))
    num = u0 * vdx + u1 * vdy + u2 * vdz
    den = (
        ixx * vdx * vdx
        + iyy * vdy * vdy
        + izz * vdz * vdz
        + 2.0 * (ixy * vdx * vdy + ixz * vdx * vdz + iyz * vdy * vdz)
    )
    return num / jnp.maximum(RAY_DEPTH_DEN_FLOOR, den)


def _subtile_power(data, st_min_x, st_min_y):
    """Max-contribution power over each pixel's 4x4 sub-tile rect.

    Mirrors ops.stopthepop.max_contrib_power_rect with patch 3x3
    (stopthepop_common.cuh:130-174). data [32, CH]; st_min [256, 1].
    Returns power [256, CH].
    """
    mx = data[0:1, :]
    my = data[1:2, :]
    co_x, co_y, co_z = data[2:3, :], data[3:4, :], data[4:5, :]
    rmin_x, rmin_y = st_min_x, st_min_y
    rmax_x, rmax_y = st_min_x + 3.0, st_min_y + 3.0

    x_left = (rmin_x - mx) > 0.0
    y_above = (rmin_y - my) > 0.0
    not_in_x = x_left | (mx > rmax_x)
    not_in_y = y_above | (my > rmax_y)
    outside = not_in_x | not_in_y

    px = jnp.where(x_left, rmin_x, rmax_x)
    py = jnp.where(y_above, rmin_y, rmax_y)
    dx = jnp.where(x_left, 3.0, -3.0)
    dy = jnp.where(y_above, 3.0, -3.0)
    diffx = mx - px
    diffy = my - py
    tx = jnp.where(
        not_in_y,
        jnp.clip(
            (dx * co_x * diffx + dx * co_y * diffy) / (dx * dx * co_x),
            0.0, 1.0,
        ),
        0.0,
    )
    ty = jnp.where(
        not_in_x,
        jnp.clip(
            (dy * co_y * diffx + dy * co_z * diffy) / (dy * dy * co_z),
            0.0, 1.0,
        ),
        0.0,
    )
    max_x = jnp.where(outside, px + tx * dx, mx)
    max_y = jnp.where(outside, py + ty * dy, my)
    ddx = mx - max_x
    ddy = my - max_y
    power = 0.5 * (co_x * ddx * ddx + co_z * ddy * ddy) + co_y * ddx * ddy
    return jnp.where(outside, power, 0.0)


def _intake(data, pixf_x, pixf_y, cam_ref, count_rem, width, height,
            hier_4x4_culling):
    """Per-chunk vectorized intake. Returns the FWD_STAGE rows, [256, CH]
    each (to be transposed into ad_scr)."""
    ch = data.shape[1]
    dxp = data[0:1, :] - pixf_x
    dyp = data[1:2, :] - pixf_y
    ca, cb, cc, opw = (data[i:i + 1, :] for i in range(2, 6))
    factor = 0.5 * (ca * dxp * dxp + cc * dyp * dyp) + cb * dxp * dyp
    alpha = jnp.minimum(ALPHA_MAX, opw * jnp.exp(-factor))

    st_x = jnp.floor(pixf_x / 4.0) * 4.0
    st_y = jnp.floor(pixf_y / 4.0) * 4.0
    qd_x = jnp.floor(pixf_x / 2.0) * 2.0 + 0.5
    qd_y = jnp.floor(pixf_y / 2.0) * 2.0 + 0.5
    vd_h = _view_rays(cam_ref, pixf_x, pixf_y, width, height)
    vd_m = _view_rays(cam_ref, qd_x, qd_y, width, height)
    vd_t = _view_rays(cam_ref, st_x + 1.5, st_y + 1.5, width, height)
    d_head = _ray_depth(data, vd_h)
    d_mid = _ray_depth(data, vd_m)
    d_tail = _ray_depth(data, vd_t)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, ch), 1)
    in_count = col < count_rem
    ok = (
        (factor >= 0.0)
        & (alpha >= ALPHA_THRESHOLD)
        & (d_head >= 0.0)
        & in_count
    )
    a_eff = jnp.where(ok, alpha, 0.0)

    v_tail = in_count & (d_tail >= 0.0)
    if hier_4x4_culling:
        power4 = _subtile_power(data, st_x, st_y)
        v_tail = v_tail & (power4 <= data[18:19, :])
    return (
        a_eff, d_tail, d_mid, d_head, v_tail.astype(jnp.float32),
        jnp.broadcast_to(data[6:7, :], (TILE_PIXELS, ch)),
        jnp.broadcast_to(data[7:8, :], (TILE_PIXELS, ch)),
        jnp.broadcast_to(data[8:9, :], (TILE_PIXELS, ch)),
    )


def _win_update(scr, num_f, popm, v, new):
    """Fused front-pop + sorted-insert on a windowed scratch ref.

    scr: VMEM ref [num_f, K, L], row 0 of each field = nearest. popm/v:
    [1, L] masks; new: list of num_f [1, L] rows (new[0] = key). L is the
    lane width (TILE_PIXELS, or group * TILE_PIXELS when lane-widened).
    Returns the popped front entry (read before modification).
    """
    K = scr.shape[1]
    L = scr.shape[2]
    front = [scr[f, 0:1, :] for f in range(num_f)]

    # Key field first: pop-shift, then compute the insert position.
    key = scr[0]
    key1 = jnp.where(
        popm,
        jnp.concatenate([key[1:], jnp.full_like(key[:1], jnp.inf)], axis=0),
        key,
    )
    pos = jnp.sum((key1 <= new[0]).astype(jnp.int32), axis=0, keepdims=True)
    ik = jax.lax.broadcasted_iota(jnp.int32, (K, L), 0)

    def upd(x, nv, pad):
        x1 = jnp.where(
            popm,
            jnp.concatenate([x[1:], jnp.full_like(x[:1], pad)], axis=0),
            x,
        )
        shifted = jnp.concatenate([x1[:1], x1[:-1]], axis=0)
        x2 = jnp.where(ik < pos, x1, jnp.where(ik == pos, nv, shifted))
        return jnp.where(v, x2, x1)

    scr[0] = upd(key, new[0], jnp.inf)
    for f in range(1, num_f):
        scr[f] = upd(scr[f], new[f], 0.0)
    return front


def _blend_one(state, popm, a0, r0, g0, b0, d0):
    """(T, Cr, Cg, Cb, nc, done, D) [1, 256]; same math as the k-buffer pop
    (D accumulates w * ray_depth for the Depth debug visualization)."""
    T, Cr, Cg, Cb, nc, done, D = state
    U = T * (1.0 - a0)
    commit = popm & (done < 0.5) & (U >= T_THRESHOLD)
    done = jnp.maximum(done, (popm & (U < T_THRESHOLD)).astype(jnp.float32))
    w = jnp.where(commit, a0 * T, 0.0)
    Cr = Cr + w * r0
    Cg = Cg + w * g0
    Cb = Cb + w * b0
    D = D + w * d0
    T = jnp.where(commit, U, T)
    nc = nc + (commit & (a0 > 0.0)).astype(jnp.float32)
    return (T, Cr, Cg, Cb, nc, done, D), commit, w


# ---------------------------------------------------------------------------
# Forward: packed-plane tail
# ---------------------------------------------------------------------------
#
# The tail window is per-4x4-SUB-TILE, and every per-pixel quantity an entry
# needs downstream (alpha, quad-ray and pixel-ray depths) is a pure function
# of 18 per-Gaussian scalars and fixed per-pixel constants. So instead of
# seven [kt, 256] per-pixel field arrays (each insert touching 7*kt*256
# elements), the forward tail stores FOUR [kt, 128] planes with lane
# l = subtile(l // 8) * 8 + field(l % 8):
#
#   plane 0  key: d_tail replicated over the 8 field lanes (so insert
#            positions computed on the key plane are valid lane-wise for
#            the value planes);
#   plane 1  x, y, conic a/b/c, opacity, r, g      (payload rows 0-7)
#   plane 2  b, inv-cov xx,xy,xz,yy,yz,zz, u0      (payload rows 8-15)
#   plane 3  u1, u2, pad...                        (payload rows 16-17)
#
# Insertion touches 4*kt*128 elements — 3.5x less than the unpacked form.
# At pop time the front entry is unpacked to group-replicated [1, 256] rows
# with single-vreg constant-index lane gathers, and alpha / d_mid / d_head
# are recomputed with exactly the intake formulas (bit-identical: same f32
# inputs, same operation order), so the mid/head cascade and the oracle
# semantics are unchanged.

TAIL_PLANES = 4
PK_STAGE = 5  # packed staging rows: key, V1, V2, V3, v_tail
# Batched-cascade sub-batch: small enough that km + CASC_BATCH and
# kh + CASC_BATCH stay near a power of two (the bitonic merge pads to one).
# Env-tunable for on-chip sweeps (16 halves the rounds per tail batch at
# wider merges); must divide TAIL_BATCH.
CASC_BATCH = int(_os.environ.get("STP_CASC_BATCH", "8"))
assert TAIL_BATCH % CASC_BATCH == 0


def _intake_packed(data, cam_ref, tx, ty, count_rem, width, height,
                   hier_4x4_culling):
    """Per-chunk packed tail staging: returns PK_STAGE rows of [CH, 128].

    Everything is computed at sub-tile granularity (16 rows) — the per-pixel
    quantities of the old intake are deferred to pop-time recompute.
    """
    ch = data.shape[1]
    j16 = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
    st_min_x = (tx * 16 + (j16 % 4) * 4).astype(jnp.float32)
    st_min_y = (ty * 16 + (j16 // 4) * 4).astype(jnp.float32)
    vd_t = _view_rays(cam_ref, st_min_x + 1.5, st_min_y + 1.5, width, height)
    d_tail16 = _ray_depth(data, vd_t)                        # [16, CH]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, ch), 1)
    v16 = (col < count_rem) & (d_tail16 >= 0.0)
    if hier_4x4_culling:
        power16 = _subtile_power(data, st_min_x, st_min_y)
        v16 = v16 & (power16 <= data[18:19, :])

    # Per-gaussian scalars: transpose the payload once, then one
    # constant-index lane gather per value plane (idx < 32: single vreg).
    dataT = jnp.pad(data[:18].T, ((0, 0), (0, 128 - 18)))    # [CH, 128]
    q = jax.lax.broadcasted_iota(jnp.int32, (ch, 128), 1)
    f = q % 8
    v1 = jnp.take_along_axis(dataT, f, axis=1)               # rows 0-7
    v2 = jnp.take_along_axis(dataT, 8 + f, axis=1)           # rows 8-15
    v3 = jnp.take_along_axis(dataT, jnp.minimum(16 + f, 17), axis=1)

    # Sub-tile rows -> packed lanes (replicate x8): idx = q // 8 < 16.
    # Invalid entries carry a -inf key: they sort to the front of the tail's
    # batched merge and are masked out at mid entry ("ghosts").
    sub = q // 8
    key16 = jnp.where(v16, d_tail16, -jnp.inf)
    keyT = jnp.pad(key16.T, ((0, 0), (0, 128 - 16)))         # [CH, 128]
    key = jnp.take_along_axis(keyT, sub, axis=1)
    vtT = jnp.pad(v16.astype(jnp.float32).T, ((0, 0), (0, 128 - 16)))
    vt = jnp.take_along_axis(vtT, sub, axis=1)
    return key, v1, v2, v3, vt


def _next_pow2(n: int) -> int:
    m = 1
    while m < n:
        m *= 2
    return m


def _bitonic_merge(planes, M):
    """Ascending merge of a bitonic sequence (the final bitonic-sort phase):
    log2(M) compare-exchange stages, per-lane independent."""
    L = planes[0].shape[1]
    s = M // 2
    while s >= 1:
        m = M // (2 * s)

        def rs(x):
            return x.reshape(m, 2, s, L)

        key = rs(planes[0])
        lo, hi = key[:, 0], key[:, 1]
        swap = lo > hi
        out = []
        for p in planes:
            pr = rs(p)
            plo, phi = pr[:, 0], pr[:, 1]
            nlo = jnp.where(swap, phi, plo)
            nhi = jnp.where(swap, plo, phi)
            out.append(jnp.stack([nlo, nhi], axis=1).reshape(M, L))
        planes = out
        s //= 2
    return planes


def _tail_round(tail, incoming, kt):
    """One batched tail round: sort TAIL_BATCH incoming packed entries by
    key (plane 0; -inf = ghost/invalid), bitonic-merge with the sorted hold
    in the tail scratch, emit the nearest TAIL_BATCH rows and keep the
    farthest kt as the new hold.

    The -inf ghosts (and the hold's initial -inf "bubbles") sort to the
    emission's front and are masked at mid entry, which makes the emit/hold
    split a STATIC slice while preserving exact window-of-kt semantics: the
    number of real entries emitted is max(reals - kt, 0). This replaces the
    per-entry sliding insert (O(kt) plane-touches per pair) with
    O((kt + B) log B / B) per pair — and is the reference's own batch
    cadence (batcherSort + mergeSortRegToSmem,
    hierarchical_render.cuh:158-192, 24-70).

    incoming: [TAIL_PLANES, B, LP] (planes 1..3 = packed values; LP = the
    packed lane width, 128 per tile). Returns the emitted planes
    [TAIL_PLANES, B, LP], sorted ascending.
    """
    B = TAIL_BATCH
    LP = incoming[0].shape[1]
    # Sorted DESCENDING directly (lax.rev has no TPU lowering, so we cannot
    # flip an ascending batch): hold (asc) ++ pads (+inf) ++ incoming (desc)
    # is bitonic.
    planes_in = _bitonic_planes(
        [incoming[p] for p in range(TAIL_PLANES)], B, descending=True
    )
    M = _next_pow2(kt + B)
    pad_rows = M - kt - B
    merged = []
    for p in range(TAIL_PLANES):
        fill = jnp.inf if p == 0 else 0.0
        parts = [tail[p]]
        if pad_rows:
            parts.append(jnp.full((pad_rows, LP), fill, jnp.float32))
        parts.append(planes_in[p])
        merged.append(jnp.concatenate(parts, axis=0))
    merged = _bitonic_merge(merged, M)
    for p in range(TAIL_PLANES):
        tail[p] = merged[p][B:B + kt]
    return [m[:B] for m in merged]


def _win_round(scr, num_f, incoming, k):
    """Batched sort+merge window round on per-pixel field planes.

    The mid/head analog of _tail_round (the tail's own batch cadence —
    the reference moves entries through its mid queue in groups too,
    hierarchical_render.cuh:421-536 front4OneFromMid / pushPullThroughMid):
    ``scr`` is a VMEM ref [num_f, k, 256] held ascending by the key plane 0,
    with -inf "bubbles" in front standing for empty slots (ghosts) and +inf
    for drained slots. ``incoming`` is a list of num_f [B, 256] rows
    (unsorted). Sorts the incoming descending, bitonic-merges with the hold,
    emits the B nearest rows (ascending: ghosts first, then reals), keeps
    the k farthest. Emission multiset matches B sequential pop-then-insert
    _win_update steps (max(reals - k, 0) reals emitted); only the local
    emission order differs (sorted, i.e. closer to the true resort).
    """
    B = incoming[0].shape[0]
    L = incoming[0].shape[1]
    planes_in = _bitonic_planes(incoming, B, descending=True)
    M = _next_pow2(k + B)
    pad_rows = M - k - B
    merged = []
    for f in range(num_f):
        fill = jnp.inf if f == 0 else 0.0
        parts = [scr[f]]
        if pad_rows:
            parts.append(
                jnp.full((pad_rows, L), fill, jnp.float32)
            )
        parts.append(planes_in[f])
        merged.append(jnp.concatenate(parts, axis=0))
    merged = _bitonic_merge(merged, M)
    for f in range(num_f):
        scr[f] = merged[f][B:B + k]
    return [m[:B] for m in merged]


def _unpack_batch(emit, vmask):
    """Packed emitted batch (list of [B, 128] planes) -> 18 scalar rows of
    [B, 256] (group-replicated per sub-tile), plus the source row and the
    valid mask widened to [B, 256].

    Single-vreg lane gathers batched over the B entries: output lane p
    (sub-tile p // 16, field f) reads source lane (p // 16) * 8 + f within
    each 128-lane half.
    """
    B = emit[0].shape[0]
    op_a = jnp.concatenate(
        [
            jnp.broadcast_to(emit[1][:, None, :], (B, 8, 128)),
            jnp.broadcast_to(emit[2][:, None, :], (B, 8, 128)),
        ],
        axis=1,
    )  # [B, 16, 128] rows r: field r of plane 1/2
    r16 = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)
    q16 = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)
    op_b = jnp.concatenate(
        [
            jnp.broadcast_to(emit[3][:, None, :], (B, 4, 128)),
            jnp.broadcast_to(
                vmask.astype(jnp.float32)[:, None, :], (B, 4, 128)
            ),
        ],
        axis=1,
    )  # [B, 8, 128] rows 0-3: plane-3 fields, rows 4-7: valid mask
    r8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    q8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    halves_a, halves_b = [], []
    for h in (0, 1):
        # Output pixel p = h*128 + q (row-major in the 16x16 tile) lives in
        # sub-tile (p // 64) * 4 + (p % 16) // 4; its packed source lane is
        # subtile * 8 + field, which stays inside this half's 64-lane span.
        sub_a = (q16 // 64) * 4 + (q16 % 16) // 4
        idx_a = h * 64 + sub_a * 8 + (r16 % 8)
        # Mosaic lowers only 2D gathers: collapse the (batch, row) sublane
        # dims and gather along lanes, then split back.
        ga = jnp.take_along_axis(
            op_a.reshape(B * 16, 128),
            jnp.broadcast_to(idx_a[None], (B, 16, 128)).reshape(B * 16, 128),
            axis=1,
        )
        halves_a.append(ga.reshape(B, 16, 128))
        sub_b = (q8 // 64) * 4 + (q8 % 16) // 4
        idx_b = h * 64 + sub_b * 8 + jnp.minimum(r8, 2)
        gb = jnp.take_along_axis(
            op_b.reshape(B * 8, 128),
            jnp.broadcast_to(idx_b[None], (B, 8, 128)).reshape(B * 8, 128),
            axis=1,
        )
        halves_b.append(gb.reshape(B, 8, 128))
    wide_a = jnp.concatenate(halves_a, axis=2)               # [B, 16, 256]
    wide_b = jnp.concatenate(halves_b, axis=2)               # [B, 8, 256]
    rows = [wide_a[:, i, :] for i in range(16)]
    rows += [wide_b[:, 0, :], wide_b[:, 1, :]]               # u1, u2
    src_row = wide_b[:, 2, :]                                # plane-3 f2
    v_wide = wide_b[:, 4, :] > 0.5
    return rows, src_row, v_wide


def _fwd_kernel(
    starts_ref, counts_ref, order_ref, bg_ref, cam_ref,  # scalar prefetch
    payload_ref,                              # HBM [32, C_pad]
    out_ref,                                  # VMEM [G, 8, 256]
    buf, ad_scr, tail, mid, head, casc_scr, sems,  # scratch
    *, kt: int, km: int, kh: int, chunk: int, grid_x: int,
    width: int, height: int, hier_4x4_culling: bool,
    batched_cascade: bool = False, group: int = 1,
):
    """One grid step blends ``group`` tiles: every window/state array puts
    the G x 256 pixels (G x 128 packed tail lanes) on the lane axis, so the
    sequential cascade's instruction stream serves G count-matched tiles at
    once — the same lane widening as the grouped k-buffer kernel
    (kbuffer_blend._fwd_kernel), applied to the hierarchy. ``starts`` /
    ``counts`` arrive permuted by descending pair count; ``order_ref`` holds
    the original tile id for pixel coordinates."""
    t = pl.program_id(0)
    L = group * TILE_PIXELS
    LP = group * 128
    starts = [starts_ref[t * group + j] for j in range(group)]
    counts = [counts_ref[t * group + j] for j in range(group)]
    rounds_j = [pl.cdiv(c, chunk) for c in counts]
    rounds = rounds_j[0]
    for r in rounds_j[1:]:
        rounds = jnp.maximum(rounds, r)
    txy = []
    plx_j, ply_j = [], []
    for j in range(group):
        tid = order_ref[t * group + j]
        tx = tid % grid_x
        ty = tid // grid_x
        txy.append((tx, ty))
        plxj, plyj = _tile_pixels_lanes(tx, ty)
        plx_j.append(plxj)
        ply_j.append(plyj)
    plx = jnp.concatenate(plx_j, axis=1)  # [1, L]
    ply = jnp.concatenate(ply_j, axis=1)

    # Reset the persistent window scratch for this step's tiles. The tail
    # hold starts as -inf "bubbles" (see _tail_round); in batched-cascade
    # mode the mid/head holds use the same bubble convention (ghosts flow
    # through the cascade with alpha 0 instead of being fill-counted).
    tail[...] = jnp.zeros((TAIL_PLANES, kt, LP))
    tail[0] = jnp.full((kt, LP), -jnp.inf)
    mhinit = -jnp.inf if batched_cascade else jnp.inf
    mid[...] = jnp.zeros((MID_F, km, L))
    mid[0] = jnp.full((km, L), mhinit)
    head[...] = jnp.zeros((HEAD_F, kh, L))
    head[0] = jnp.full((kh, L), mhinit)

    # Per-pixel constants for the pop-time recompute (pixels on lanes).
    vdh = _view_rays(cam_ref, plx, ply, width, height)
    qd_x = jnp.floor(plx / 2.0) * 2.0 + 0.5
    qd_y = jnp.floor(ply / 2.0) * 2.0 + 0.5
    vdm = _view_rays(cam_ref, qd_x, qd_y, width, height)

    def get_dma(slot, j, kk):
        offset = pl.multiple_of(starts[j] + kk * chunk, chunk)
        return pltpu.make_async_copy(
            payload_ref.at[:, pl.ds(offset, chunk)], buf.at[slot, j],
            sems.at[slot, j],
        )

    def start_round(slot, kk):
        for j in range(group):
            @pl.when(kk < rounds_j[j])
            def _(j=j):
                get_dma(slot, j, kk).start()

    def wait_round(slot, kk):
        for j in range(group):
            @pl.when(kk < rounds_j[j])
            def _(j=j):
                get_dma(slot, j, kk).wait()

    @pl.when(rounds > 0)
    def _():
        start_round(0, 0)

    def push_head(state, fh, pop_m, e_m):
        # e_m rows: key(d_mid), d_head, a, r, g, b
        pop_h = pop_m & (fh == kh)
        new = [e_m[1], e_m[2], e_m[3], e_m[4], e_m[5]]
        e_h = _win_update(head, HEAD_F, pop_h, pop_m, new)
        state, _, _ = _blend_one(
            state, pop_h, e_h[1], e_h[2], e_h[3], e_h[4], e_h[0]
        )
        fh = fh + pop_m.astype(jnp.int32) - pop_h.astype(jnp.int32)
        return state, fh

    def push_mid(state, fm, fh, pop_t, e_t):
        # e_t rows: key(d_tail unused), d_mid, d_head, a, r, g, b
        pop_m = pop_t & (fm == km)
        new = [e_t[1], e_t[2], e_t[3], e_t[4], e_t[5], e_t[6]]
        e_m = _win_update(mid, MID_F, pop_m, pop_t, new)
        state, fh = push_head(state, fh, pop_m, e_m)
        fm = fm + pop_t.astype(jnp.int32) - pop_m.astype(jnp.int32)
        return state, fm, fh

    def _cascade_rounds(state, mid_in):
        """One batched mid round + head round + ordered blends.

        mid_in: [key_m(d_mid; ±inf for ghosts/drains), d_head, a, r, g, b]
        rows of [CASC_BATCH, 256]. Ghosts (-inf) flow nearest-first with
        alpha 0; drain pads (+inf) displace the holds.
        """
        emit_m = _win_round(mid, MID_F, mid_in, km)
        # Re-key at head granularity; ghosts/pads keep their ±inf key.
        key_h = jnp.where(jnp.isfinite(emit_m[0]), emit_m[1], emit_m[0])
        emit_h = _win_round(
            head, HEAD_F, [key_h, emit_m[2], emit_m[3], emit_m[4],
                           emit_m[5]], kh,
        )
        true_m = jnp.ones((1, L), bool)
        for j in range(CASC_BATCH):
            d0 = emit_h[0][j:j + 1]
            state, _, _ = _blend_one(
                state, true_m, emit_h[1][j:j + 1], emit_h[2][j:j + 1],
                emit_h[3][j:j + 1], emit_h[4][j:j + 1],
                jnp.where(jnp.isfinite(d0), d0, 0.0),
            )
        return state

    def _ray_depth_rows(sc, vd):
        """Same formula (and operation order) as _ray_depth, on [1, 256]
        group-replicated scalar rows — bit-identical results."""
        vdx, vdy, vdz = vd
        ixx, ixy, ixz, iyy, iyz, izz = (sc[9 + i] for i in range(6))
        u0, u1, u2 = sc[15], sc[16], sc[17]
        num = u0 * vdx + u1 * vdy + u2 * vdz
        den = (
            ixx * vdx * vdx
            + iyy * vdy * vdy
            + izz * vdz * vdz
            + 2.0 * (ixy * vdx * vdy + ixz * vdx * vdz + iyz * vdy * vdz)
        )
        return num / jnp.maximum(RAY_DEPTH_DEN_FLOOR, den)

    def tail_and_cascade(incoming, carry):
        """One tail round (sort + merge + static emit) followed by batched
        unpack/recompute and the per-entry mid/head cascade."""
        emit = _tail_round(tail, incoming, kt)
        vmask = jnp.isfinite(emit[0])  # ghosts (-inf) and drain pads (+inf)
        if group == 1:
            sc, _, v_wide = _unpack_batch(emit, vmask)
        else:
            # Per-tile unpack (the lane gathers address within a tile's
            # 128-lane packed block), concatenated back to full width.
            parts = []
            for j in range(group):
                sl = slice(j * 128, (j + 1) * 128)
                parts.append(
                    _unpack_batch([e[:, sl] for e in emit], vmask[:, sl])
                )
            sc = [
                jnp.concatenate([p[0][i] for p in parts], axis=1)
                for i in range(18)
            ]
            v_wide = jnp.concatenate([p[2] for p in parts], axis=1)
        # sc: 0 x | 1 y | 2 ca | 3 cb | 4 cc | 5 opw | 6 r | 7 g | 8 b |
        #     9..14 inv-cov | 15 u0 | 16 u1 | 17 u2 — all [B, 256], so the
        # recompute runs at full sublane occupancy for the whole batch.
        d_head = _ray_depth_rows(sc, vdh)
        d_mid = _ray_depth_rows(sc, vdm)
        dxp = sc[0] - plx
        dyp = sc[1] - ply
        factor = 0.5 * (sc[2] * dxp * dxp + sc[4] * dyp * dyp) + sc[3] * dxp * dyp
        alpha = jnp.minimum(ALPHA_MAX, sc[5] * jnp.exp(-factor))
        # v_wide folds in so ghost entries carry alpha 0 — per-entry mode
        # never blends them anyway; batched mode lets them FLOW through the
        # cascade, where alpha 0 makes every blend a no-op.
        ok = (factor >= 0.0) & (alpha >= ALPHA_THRESHOLD) & (d_head >= 0.0)
        a_eff = jnp.where(ok & v_wide, alpha, 0.0)

        if batched_cascade:
            state, fm, fh = carry
            key_m = jnp.where(v_wide, d_mid, -jnp.inf)
            for sb in range(TAIL_BATCH // CASC_BATCH):
                sl = slice(sb * CASC_BATCH, (sb + 1) * CASC_BATCH)
                state = _cascade_rounds(
                    state,
                    [key_m[sl], d_head[sl], a_eff[sl],
                     sc[6][sl], sc[7][sl], sc[8][sl]],
                )
            return state, fm, fh

        casc_scr[0] = v_wide.astype(jnp.float32)
        casc_scr[1] = d_mid
        casc_scr[2] = d_head
        casc_scr[3] = a_eff
        casc_scr[4] = sc[6]
        casc_scr[5] = sc[7]
        casc_scr[6] = sc[8]

        def one(e, c):
            state, fm, fh = c
            row = casc_scr[:, pl.ds(e, 1), :][:, 0, :]  # [7, 256] one load
            v = row[0:1] > 0.5
            e_t = [None, row[1:2], row[2:3], row[3:4], row[4:5], row[5:6],
                   row[6:7]]
            return push_mid(state, fm, fh, v, e_t)

        return _fori_unrolled(TAIL_BATCH, one, carry, CASC_UNROLL)

    def body(kk, carry):
        slot = kk % 2

        @pl.when(kk + 1 < rounds)
        def _():
            start_round((kk + 1) % 2, kk + 1)

        wait_round(slot, kk)
        for j in range(group):
            # Finished sub-tiles keep stale buffers; count_rem <= 0 makes
            # every packed entry a -inf ghost, so they idle through.
            txj, tyj = txy[j]
            rows = _intake_packed(
                buf[slot, j], cam_ref, txj, tyj, counts[j] - kk * chunk,
                width, height, hier_4x4_culling,
            )
            for i, r in enumerate(rows):
                ad_scr[i, :, j * 128:(j + 1) * 128] = r

        for half in range(chunk // TAIL_BATCH):
            incoming = [
                ad_scr[p, half * TAIL_BATCH:(half + 1) * TAIL_BATCH, :]
                for p in range(TAIL_PLANES)
            ]
            carry = tail_and_cascade(incoming, carry)
        return carry

    ones = jnp.ones((1, L), jnp.float32)
    zeros = jnp.zeros((1, L), jnp.float32)
    zi = jnp.zeros((1, L), jnp.int32)
    state0 = (ones, zeros, zeros, zeros, zeros, zeros, zeros)

    # Round-level early termination (exact: commits are gated on the done
    # latch, so once every pixel saturates the rest of the stream is dead
    # work; the scalar while-condition amortizes over a whole chunk).
    def rcond(carry):
        kk, (state, fm, fh) = carry
        return (kk < rounds) & (jnp.min(state[5]) < 0.5)

    def rbody(carry):
        kk, c = carry
        return kk + 1, body(kk, c)

    k_end, (state, fm, fh) = jax.lax.while_loop(
        rcond, rbody, (jnp.int32(0), (state0, zi, zi))
    )

    @pl.when(k_end < rounds)
    def _():
        wait_round(k_end % 2, k_end)

    inf_new_m = [jnp.full((1, L), jnp.inf)] + [zeros] * (MID_F - 1)

    # Tail drain: +inf incoming pads push every held real entry out.
    drain_in = [
        jnp.full((TAIL_BATCH, LP), jnp.inf if p == 0 else 0.0, jnp.float32)
        for p in range(TAIL_PLANES)
    ]
    for _ in range(-(-kt // TAIL_BATCH)):
        state, fm, fh = tail_and_cascade(drain_in, (state, fm, fh))

    if batched_cascade:
        # Mid drain: +inf keyed sub-batches displace the whole mid hold
        # through the head; then blend the head hold in place (ascending:
        # -inf bubbles and +inf pads carry alpha 0).
        drain_m = (
            [jnp.full((CASC_BATCH, L), jnp.inf, jnp.float32)]
            + [jnp.zeros((CASC_BATCH, L), jnp.float32)]
            * (MID_F - 1)
        )
        for _ in range(-(-km // CASC_BATCH)):
            state = _cascade_rounds(state, drain_m)
        true_m = jnp.ones((1, L), bool)
        for j in range(kh):
            e_h = [head[f, j:j + 1, :] for f in range(HEAD_F)]
            state, _, _ = _blend_one(
                state, true_m, e_h[1], e_h[2], e_h[3], e_h[4],
                jnp.where(jnp.isfinite(e_h[0]), e_h[0], 0.0),
            )
    else:
        def drain_mid(_, carry):
            state, fm, fh = carry
            pop_m = fm > 0
            e_m = _win_update(
                mid, MID_F, pop_m, jnp.zeros((1, L), bool),
                inf_new_m
            )
            state, fh = push_head(state, fh, pop_m, e_m)
            fm = fm - pop_m.astype(jnp.int32)
            return state, fm, fh

        state, fm, fh = jax.lax.fori_loop(0, km, drain_mid, (state, fm, fh))

        def drain_head(_, carry):
            state, fh = carry
            pop_h = fh > 0
            e_h = [head[f, 0:1, :] for f in range(HEAD_F)]
            state, _, _ = _blend_one(
                state, pop_h, e_h[1], e_h[2], e_h[3], e_h[4], e_h[0]
            )
            for f in range(HEAD_F):
                x = head[f]
                pad = jnp.inf if f == 0 else 0.0
                head[f] = jnp.where(
                    pop_h,
                    jnp.concatenate(
                        [x[1:], jnp.full_like(x[:1], pad)], axis=0
                    ),
                    x,
                )
            fh = fh - pop_h.astype(jnp.int32)
            return state, fh

        state, fh = jax.lax.fori_loop(0, kh, drain_head, (state, fh))

    T, Cr, Cg, Cb, nc, done, D = state
    res = jnp.concatenate(
        [
            Cr + T * bg_ref[0],
            Cg + T * bg_ref[1],
            Cb + T * bg_ref[2],
            T,
            nc,
            D,
            jnp.zeros((2, L), jnp.float32),
        ],
        axis=0,
    )  # [8, L]
    for j in range(group):
        out_ref[j] = res[:, j * TILE_PIXELS:(j + 1) * TILE_PIXELS]


def blend_hier_forward(
    payload: jnp.ndarray,   # [32, C_pad] f32 feature-major
    starts: jnp.ndarray,
    counts: jnp.ndarray,
    bg: jnp.ndarray,
    cam: jnp.ndarray,       # [19] inverse_vp flat + campos
    *,
    grid_x: int,
    grid_y: int,
    queue_sizes=(64, 8, 4),
    width: int,
    height: int,
    hier_4x4_culling: bool = False,
    chunk: int = 128,
    batched_cascade: bool = False,
    group: int = 1,
    interpret: bool = False,
):
    """Run the hierarchical forward blend. Returns packed [T, 8, 256].

    ``group`` > 1 blends that many count-matched tiles per grid step (lane
    axis G x 256 / G x 128 packed) — same math, ~G x fewer instruction
    issues for the sequential cascade (see kbuffer_blend.group_tiles)."""
    kt, km, kh = queue_sizes
    num_tiles = grid_x * grid_y
    t_pad = -(-num_tiles // group) * group
    if group == 1:
        order = jnp.arange(num_tiles, dtype=jnp.int32)
        starts_p, counts_p = starts, counts
    else:
        assert not batched_cascade, "grouped hier: batched cascade is parked"
        order = group_tiles(counts, group)
        safe = jnp.minimum(order, num_tiles - 1)
        real = order < num_tiles
        starts_p = jnp.where(real, starts[safe], 0)
        counts_p = jnp.where(real, counts[safe], 0)
    kernel = functools.partial(
        _fwd_kernel, kt=kt, km=km, kh=kh, chunk=chunk, grid_x=grid_x,
        width=width, height=height, hier_4x4_culling=hier_4x4_culling,
        batched_cascade=batched_cascade, group=group,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(t_pad // group,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (group, 8, TILE_PIXELS), lambda t, *_: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, group, KB_PAYLOAD_F, chunk), jnp.float32),
            pltpu.VMEM((PK_STAGE, chunk, group * 128), jnp.float32),
            pltpu.VMEM((TAIL_PLANES, kt, group * 128), jnp.float32),
            pltpu.VMEM((MID_F, km, group * TILE_PIXELS), jnp.float32),
            pltpu.VMEM((HEAD_F, kh, group * TILE_PIXELS), jnp.float32),
            pltpu.VMEM((7, TAIL_BATCH, group * TILE_PIXELS), jnp.float32),
            pltpu.SemaphoreType.DMA((2, group)),
        ],
    )
    params = {}
    if group > 1:
        # The wide cascade's scratch + value stack exceeds the default 16 MiB
        # scoped budget at G >= 4 (measured 21.2 MiB); physical VMEM (128 MiB
        # on v5e) comfortably bounds it.
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    packed_p = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t_pad, 8, TILE_PIXELS), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        **params,
    )(starts_p, counts_p, order, bg, cam, payload)
    if group == 1:
        return packed_p
    return packed_p[jnp.argsort(order)[:num_tiles]]


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------
#
# Replay of the forward cascade with gradient emission at the head pop (the
# blend event), exactly like the reference's hierarchical backward which
# reuses the forward sorting skeleton with blend lambdas that emit gradients
# front-to-back (hierarchical_render.cuh:1038-1175, suffix reconstructed as
# (final_color - C)/test_T). Gradient routing uses the k-buffer backward's
# MOMENT factoring (kbuffer_blend.py): the blend event routes only the two
# pop scalars' moments {s1 * tile-centered pixel basis, w * g_rgb} to the
# source pair column (one-hot MXU matmul into a [16, seg_cap] accumulator),
# and a per-chunk post-pass at writeback expands them into gradient rows
# from the re-fetched payload features. That shrinks the cascade windows to
# {key, d_head, alpha, c.g, src} — 5 mid / 4 head fields instead of the
# 13 / 12 a direct-gradient replay needs. Depth keys get no gradient
# (discrete resort), matching the reference.

# Backward window layouts. The tail uses the same packed planes as the
# forward (TAIL_PLANES x [kt, 128], with the stream position folded into
# plane-3 field 2); mid/head stay per-pixel with the leading row the key:
MID_B = 5   # key(d_mid), d_head, a, c.g, src
HEAD_B = 4  # key(d_head), a, c.g, src
GRAD_ROWS = 16
# The branch-free fast routing path accumulates into a sliding window of
# recent stream chunks (see kbuffer_blend._bwd_kernel). The hierarchy delays
# a blend by ~(kt + 4*km + 4*kh) pairs after intake, so the window spans
# FOUR chunks (vs the k-buffer's two); older sources take the staged
# once-per-chunk slow path.
HIER_WIN_CH = 4


def _bwd_kernel(
    starts_ref, counts_ref, order_ref, bg_ref, cam_ref,  # scalar prefetch
    payload_ref,                              # HBM [32, C_pad]
    fwd_ref,                                  # VMEM [G, 8, 256]
    grad_ref,                                 # VMEM [G, 8, 256]
    dpay_ref,                                 # HBM out [32, C_pad]
    buf, ad_scr, tail, mid, head, casc_scr, stale_scr, dseg, sems, wsem,
    *, kt: int, km: int, kh: int, chunk: int, seg_cap: int, grid_x: int,
    width: int, height: int, hier_4x4_culling: bool,
    batched_cascade: bool = False, group: int = 1,
    route_prec=jax.lax.Precision.HIGHEST,
    grad_row_split: bool = False,
):
    """Grouped like _fwd_kernel: window/state/basis arrays carry the G x 256
    pixels on the lane axis. Per-tile state (segment offsets, dseg
    accumulators, routing matmuls, writeback) stays per-tile — the one-hot
    routing contracts each tile's lane slice separately (a shared column
    space would mix tiles' segments; see kbuffer_blend._bwd_kernel)."""
    t = pl.program_id(0)
    L = group * TILE_PIXELS
    LP = group * 128
    starts = [starts_ref[t * group + j] for j in range(group)]
    counts = [counts_ref[t * group + j] for j in range(group)]
    rounds_j = [pl.cdiv(c, chunk) for c in counts]
    rounds = rounds_j[0]
    for r in rounds_j[1:]:
        rounds = jnp.maximum(rounds, r)
    max_route = seg_cap // chunk
    txy = []
    plx_j, ply_j = [], []
    cxy = []
    k1_j, KT_j, ctot_j = [], [], []
    k2_j = []
    for j in range(group):
        tid = order_ref[t * group + j]
        tx = tid % grid_x
        ty = tid // grid_x
        txy.append((tx, ty))
        plxj, plyj = _tile_pixels_lanes(tx, ty)
        plx_j.append(plxj)
        ply_j.append(plyj)

        gp = grad_ref[j]
        fw = fwd_ref[j]
        g_r, g_g, g_b = gp[0:1, :], gp[1:2, :], gp[2:3, :]
        g_T = gp[3:4, :]
        T_final = fw[3:4, :]
        KT_j.append(
            (g_r * bg_ref[0] + g_g * bg_ref[1] + g_b * bg_ref[2] + g_T)
            * T_final
        )
        ctot_j.append(
            (fw[0:1, :] - T_final * bg_ref[0]) * g_r
            + (fw[1:2, :] - T_final * bg_ref[1]) * g_g
            + (fw[2:3, :] - T_final * bg_ref[2]) * g_b
        )
        # Per-pixel moment basis about the tile center (see
        # kbuffer_blend.moments_to_grads).
        cx = (tx * TILE_X).astype(jnp.float32) + (TILE_X - 1) / 2.0
        cy = (ty * TILE_Y).astype(jnp.float32) + (TILE_Y - 1) / 2.0
        cxy.append((cx, cy))
        px = plxj - cx
        py = plyj - cy
        k1_j.append(jnp.concatenate(
            [jnp.ones((1, TILE_PIXELS), jnp.float32), px, py,
             px * px, px * py, py * py],
            axis=0,
        ))  # [6, 256] s1 basis
        k2_j.append(jnp.concatenate([g_r, g_g, g_b], axis=0))  # [3, 256]
    plx = jnp.concatenate(plx_j, axis=1)      # [1, L]
    ply = jnp.concatenate(ply_j, axis=1)
    KT = jnp.concatenate(KT_j, axis=1)
    ctot_g = jnp.concatenate(ctot_j, axis=1)
    k1 = jnp.concatenate(k1_j, axis=1)        # [6, L]
    k2 = jnp.concatenate(k2_j, axis=1)        # [3, L]
    mpad = jnp.zeros((GRAD_ROWS - 9, L), jnp.float32)

    tail[...] = jnp.zeros((TAIL_PLANES, kt, LP))
    tail[0] = jnp.full((kt, LP), -jnp.inf)  # bubbles (see _tail_round)
    mhinit = -jnp.inf if batched_cascade else jnp.inf
    mid[...] = jnp.zeros((MID_B, km, L))
    mid[0] = jnp.full((km, L), mhinit)
    head[...] = jnp.zeros((HEAD_B, kh, L))
    head[0] = jnp.full((kh, L), mhinit)
    dseg[...] = jnp.zeros((group, GRAD_ROWS, seg_cap), jnp.float32)
    # Invalidate the stale stage's source row: slots past the stream chunk
    # are only written during drains, and the per-chunk stale pass scans all
    # of them.
    stale_scr[2] = jnp.full((stale_scr.shape[1], L), -1.0)

    # Per-pixel constants for the pop-time recompute (pixels on lanes).
    vdh = _view_rays(cam_ref, plx, ply, width, height)
    qd_x = jnp.floor(plx / 2.0) * 2.0 + 0.5
    qd_y = jnp.floor(ply / 2.0) * 2.0 + 0.5
    vdm = _view_rays(cam_ref, qd_x, qd_y, width, height)

    def get_dma(slot, j, kk):
        offset = pl.multiple_of(starts[j] + kk * chunk, chunk)
        return pltpu.make_async_copy(
            payload_ref.at[:, pl.ds(offset, chunk)], buf.at[slot, j],
            sems.at[slot, j],
        )

    def start_round(slot, kk):
        for j in range(group):
            @pl.when(kk < rounds_j[j])
            def _(j=j):
                get_dma(slot, j, kk).start()

    def wait_round(slot, kk):
        for j in range(group):
            @pl.when(kk < rounds_j[j])
            def _(j=j):
                get_dma(slot, j, kk).wait()

    @pl.when(rounds > 0)
    def _():
        start_round(0, 0)

    # One-hots are built column-on-sublanes / pixel-on-lanes and consumed
    # with a lane-contracting dot_general — a per-pop [1, 256] transpose
    # costs ~500 ns on this hardware (measured in the k-buffer backward).
    # The iotas span the full G x 256 lane width: compares must run on
    # offset-0 wide vectors (Mosaic cannot broadcast a lane-offset slice);
    # the per-tile routing dots slice the wide one-hot afterwards.
    sub1 = jax.lax.broadcasted_iota(jnp.int32, (chunk, L), 0)
    lane_q = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1) // TILE_PIXELS
    block_mask = [lane_q == j for j in range(group)]  # static [1, L] each
    n_slots = stale_scr.shape[1]

    def lane(x, j):
        return x[:, j * TILE_PIXELS:(j + 1) * TILE_PIXELS]

    def blend_grads(state, pop_h, e_h, rst, slot, base):
        """Blend the popped head entry + branch-free moment routing.

        e_h rows: key, a, c.g, src. state: (T, acc_g, done) of [1, 256].
        rst = (route_acc [16, WIN*chunk], stale_flag int32); ``base`` is the
        current stream chunk's first source index. Per-pop data-dependent
        branches stall the Mosaic pipeline (measured ~an order of magnitude
        over the matmul they guard), so the fast path is one unconditional
        one-hot matmul into the window accumulator; older sources are staged
        at ``slot`` and replayed once per chunk under a single guard.
        """
        T, acc_g, done = state
        a0 = e_h[1]
        U = T * (1.0 - a0)
        commit = pop_h & (done < 0.5) & (U >= T_THRESHOLD)
        done = jnp.maximum(
            done, (pop_h & (U < T_THRESHOLD)).astype(jnp.float32)
        )
        cdotg = e_h[2]
        w = jnp.where(commit, a0 * T, 0.0)
        acc_g = acc_g + w * cdotg
        suffix = ctot_g - acc_g
        galpha = jnp.where(
            commit & (a0 < ALPHA_MAX),
            cdotg * T - (suffix + KT) / (1.0 - a0),
            0.0,
        )
        s1 = galpha * a0
        moments = jnp.concatenate([s1 * k1, w * k2, mpad], axis=0)

        src = e_h[3].astype(jnp.int32)
        route_acc, stale_flag = rst
        lo = base - (HIER_WIN_CH - 1) * chunk
        sel = commit & (src >= lo) & (src < base + chunk)
        # Two-level routing (round 4, shared with the k-buffer backward):
        # ONE [CH, L] within-chunk one-hot (the old [WIN*CH, L] compare was
        # the dominant per-pop cost and scaled with the window span) plus a
        # [1, L] per-window-chunk mask folded into the 16 moment rows.
        # Exact: identical addend multisets per output column.
        within = jnp.where(sel, src % chunk, -1)
        onehot1 = (within == sub1).astype(jnp.float32)  # [CH, L]
        wid = (src - lo) // chunk  # window-chunk index where sel
        # All HIER_WIN_CH window copies (and, under "split", both bf16
        # halves) stack into ONE dot: [4*16, L] (or [2*4*16, L] = exactly
        # one 128-row MXU block) vs four separate dot issues.
        inc = route_moment_dots(
            [moments * (sel & (wid == wi)).astype(jnp.float32)
             for wi in range(HIER_WIN_CH)],
            onehot1, lane, group, route_prec,
        )
        route_acc = tuple(
            route_acc[g] + inc[g] for g in range(group)
        )  # each [16, WIN*CH]
        # a0 > 0 skips zero-moment staging (ghost/bubble rows in batched
        # cascade mode have alpha 0 and a meaningless src).
        stale = commit & (src >= 0) & (src < lo) & (a0 > 0.0)
        stale_scr[:, pl.ds(slot, 1), :] = jnp.stack(
            [s1, w, jnp.where(stale, src, -1).astype(jnp.float32)], axis=0
        )
        stale_flag = jnp.maximum(stale_flag, stale.astype(jnp.float32))
        T = jnp.where(commit, U, T)
        return (T, acc_g, done), (route_acc, stale_flag)

    def flush_acc(route_acc, base):
        """Add the window accumulators' per-chunk parts into each tile's
        dseg. Parts for negative chunks are identically zero (clamped to
        offset 0, no-op); parts at or past seg_cap are truncation, skipped."""
        for i in range(HIER_WIN_CH):
            off = jnp.maximum(base - (HIER_WIN_CH - 1 - i) * chunk, 0)

            @pl.when(off < seg_cap)
            def _(off=off, i=i):
                for g in range(group):
                    dseg[g, :, pl.ds(pl.multiple_of(off, chunk), chunk)] += (
                        route_acc[g][:, i * chunk:(i + 1) * chunk]
                    )

    def stale_pass(stale_flag):
        """Replay staged stale pops through the dynamic routing loop — one
        guard per chunk/drain phase instead of one per pop."""

        @pl.when(jnp.max(stale_flag) > 0.0)
        def _():
            def stale_one(j, _):
                row = stale_scr[:, pl.ds(j, 1), :][:, 0, :]
                s1j, wj = row[0:1], row[1:2]
                srcj = row[2:3].astype(jnp.int32)
                wj = jnp.where(srcj >= 0, wj, 0.0)
                moments = jnp.concatenate(
                    [s1j * k1, wj * k2, mpad], axis=0
                )
                route = (srcj >= 0) & (srcj < seg_cap) & (wj > 0.0)
                chunk_id = jnp.where(route, srcj // chunk, 0)
                for g in range(group):
                    route_g = route & block_mask[g]  # wide, offset-0
                    cmin = jnp.min(jnp.where(route_g, chunk_id, max_route))
                    cmax = jnp.max(jnp.where(route_g, chunk_id, -1))

                    def route_chunk(r, _, g=g, route_g=route_g):
                        sel = route_g & (chunk_id == r)
                        colm = jnp.where(sel, srcj - r * chunk, -1)
                        onehot_t = (colm == sub1).astype(jnp.float32)
                        dchunk = route_moment_dots(
                            [moments], onehot_t,
                            lambda x, _gg, _g=g: lane(x, _g),
                            1, route_prec,
                        )[0]
                        off = pl.multiple_of(r * chunk, chunk)
                        dseg[g, :, pl.ds(off, chunk)] += dchunk
                        return 0

                    jax.lax.fori_loop(cmin, cmax + 1, route_chunk, 0)
                return 0

            jax.lax.fori_loop(0, n_slots, stale_one, 0)

    def push_head(state, fh, pop_m, e_m, rst, slot, base):
        # e_m rows: key, dh, a, c.g, src
        pop_h = pop_m & (fh == kh)
        new = list(e_m[1:])  # drop the mid key; dh becomes the head key
        e_h = _win_update(head, HEAD_B, pop_h, pop_m, new)
        state, rst = blend_grads(state, pop_h, e_h, rst, slot, base)
        fh = fh + pop_m.astype(jnp.int32) - pop_h.astype(jnp.int32)
        return state, fh, rst

    def push_mid(state, fm, fh, pop_t, e_t, rst, slot, base):
        pop_m = pop_t & (fm == km)
        new = list(e_t[1:])  # drop the tail key; dm becomes the mid key
        e_m = _win_update(mid, MID_B, pop_m, pop_t, new)
        state, fh, rst = push_head(state, fh, pop_m, e_m, rst, slot, base)
        fm = fm + pop_t.astype(jnp.int32) - pop_m.astype(jnp.int32)
        return state, fm, fh, rst

    true_m = jnp.ones((1, L), bool)

    def _cascade_rounds_b(carry, mid_in, slot0, base):
        """Batched mid round + head round + ordered gradient blends (the
        backward mirror of the forward's _cascade_rounds; see _win_round).

        mid_in: [key_m, d_head, a, c.g, src] rows of [CASC_BATCH, 256].
        """
        state, rst = carry
        emit_m = _win_round(mid, MID_B, mid_in, km)
        key_h = jnp.where(jnp.isfinite(emit_m[0]), emit_m[1], emit_m[0])
        emit_h = _win_round(
            head, HEAD_B, [key_h, emit_m[2], emit_m[3], emit_m[4]], kh,
        )
        for j in range(CASC_BATCH):
            e_h = [emit_h[f][j:j + 1] for f in range(HEAD_B)]
            state, rst = blend_grads(state, true_m, e_h, rst, slot0 + j,
                                     base)
        return state, rst

    def _ray_depth_rows(sc, vd):
        """Same formula (and operation order) as _ray_depth, on [1, 256]
        group-replicated scalar rows — bit-identical results."""
        vdx, vdy, vdz = vd
        ixx, ixy, ixz, iyy, iyz, izz = (sc[9 + i] for i in range(6))
        num = sc[15] * vdx + sc[16] * vdy + sc[17] * vdz
        den = (
            ixx * vdx * vdx
            + iyy * vdy * vdy
            + izz * vdz * vdz
            + 2.0 * (ixy * vdx * vdy + ixz * vdx * vdz + iyz * vdy * vdz)
        )
        return num / jnp.maximum(RAY_DEPTH_DEN_FLOOR, den)

    def tail_and_cascade(incoming, carry, slot_base, base):
        """One batched tail round, then the per-entry mid/head cascade with
        gradient routing (see the forward's tail_and_cascade)."""
        state, fm, fh, rst = carry
        emit = _tail_round(tail, incoming, kt)
        vmask = jnp.isfinite(emit[0])
        if group == 1:
            sc, src_row, v_wide = _unpack_batch(emit, vmask)
        else:
            parts = []
            for j in range(group):
                sl = slice(j * 128, (j + 1) * 128)
                parts.append(
                    _unpack_batch([e[:, sl] for e in emit], vmask[:, sl])
                )
            sc = [
                jnp.concatenate([p[0][i] for p in parts], axis=1)
                for i in range(18)
            ]
            src_row = jnp.concatenate([p[1] for p in parts], axis=1)
            v_wide = jnp.concatenate([p[2] for p in parts], axis=1)
        d_head = _ray_depth_rows(sc, vdh)
        d_mid = _ray_depth_rows(sc, vdm)
        dxp = sc[0] - plx
        dyp = sc[1] - ply
        factor = 0.5 * (sc[2] * dxp * dxp + sc[4] * dyp * dyp) + sc[3] * dxp * dyp
        alpha = jnp.minimum(ALPHA_MAX, sc[5] * jnp.exp(-factor))
        ok = (factor >= 0.0) & (alpha >= ALPHA_THRESHOLD) & (d_head >= 0.0)
        a_eff = jnp.where(ok & v_wide, alpha, 0.0)
        # k2 rows are the wide per-pixel (g_r, g_g, g_b).
        cg = sc[6] * k2[0:1] + sc[7] * k2[1:2] + sc[8] * k2[2:3]

        if batched_cascade:
            state, fm, fh, rst = carry
            cg = jnp.where(v_wide, cg, 0.0)
            srcz = jnp.where(v_wide, src_row, -1.0)
            key_m = jnp.where(v_wide, d_mid, -jnp.inf)
            c2 = (state, rst)
            for sb in range(TAIL_BATCH // CASC_BATCH):
                sl = slice(sb * CASC_BATCH, (sb + 1) * CASC_BATCH)
                c2 = _cascade_rounds_b(
                    c2,
                    [key_m[sl], d_head[sl], a_eff[sl], cg[sl], srcz[sl]],
                    slot_base + sb * CASC_BATCH, base,
                )
            state, rst = c2
            return state, fm, fh, rst

        casc_scr[0] = v_wide.astype(jnp.float32)
        casc_scr[1] = d_mid
        casc_scr[2] = d_head
        casc_scr[3] = a_eff
        casc_scr[4] = cg
        casc_scr[5] = src_row

        def one(e, c):
            state, fm, fh, rst = c
            row = casc_scr[:, pl.ds(e, 1), :][:, 0, :]  # [6, 256] one load
            v = row[0:1] > 0.5
            e_t = [None, row[1:2], row[2:3], row[3:4], row[4:5], row[5:6]]
            return push_mid(state, fm, fh, v, e_t, rst, slot_base + e, base)

        return _fori_unrolled(
            TAIL_BATCH, one, (state, fm, fh, rst), CASC_UNROLL
        )

    def body(kk, carry):
        slot = kk % 2

        @pl.when(kk + 1 < rounds)
        def _():
            start_round((kk + 1) % 2, kk + 1)

        wait_round(slot, kk)
        for j in range(group):
            txj, tyj = txy[j]
            rows = _intake_packed(
                buf[slot, j], cam_ref, txj, tyj, counts[j] - kk * chunk,
                width, height, hier_4x4_culling,
            )
            for i, r in enumerate(rows):
                ad_scr[i, :, j * 128:(j + 1) * 128] = r
        base = kk * chunk
        # Fold the stream position into plane-3 field 2 (exact below 2^24)
        # for the whole chunk at once. src is segment-local, so the same
        # fold serves every tile's packed block (% 8 repeats per block).
        rowpos = jax.lax.broadcasted_iota(jnp.int32, (chunk, LP), 0)
        srcval = (base + rowpos).astype(jnp.float32)
        lane_f2 = jax.lax.broadcasted_iota(jnp.int32, (chunk, LP), 1) % 8
        ad_scr[3] = jnp.where(lane_f2 == 2, srcval, ad_scr[3])

        rst0 = (
            tuple(
                jnp.zeros((GRAD_ROWS, HIER_WIN_CH * chunk), jnp.float32)
                for _ in range(group)
            ),
            jnp.zeros((1, L), jnp.float32),
        )
        state, fm, fh = carry
        c = (state, fm, fh, rst0)
        for half in range(chunk // TAIL_BATCH):
            incoming = [
                ad_scr[p, half * TAIL_BATCH:(half + 1) * TAIL_BATCH, :]
                for p in range(TAIL_PLANES)
            ]
            c = tail_and_cascade(incoming, c, half * TAIL_BATCH, base)
        state, fm, fh, (route_acc, stale_flag) = c
        flush_acc(route_acc, base)
        stale_pass(stale_flag)
        return state, fm, fh

    ones = jnp.ones((1, L), jnp.float32)
    zeros = jnp.zeros((1, L), jnp.float32)
    zi = jnp.zeros((1, L), jnp.int32)
    state0 = (ones, zeros, zeros)  # T, acc.g, done

    # Round-level early termination mirroring the forward (dseg was
    # pre-zeroed, so skipped rounds still write zero gradients back).
    def rcond(carry):
        kk, (state, fm, fh) = carry
        return (kk < rounds) & (jnp.min(state[2]) < 0.5)

    def rbody(carry):
        kk, c = carry
        return kk + 1, body(kk, c)

    k_end, (state, fm, fh) = jax.lax.while_loop(
        rcond, rbody, (jnp.int32(0), (state0, zi, zi))
    )

    @pl.when(k_end < rounds)
    def _():
        wait_round(k_end % 2, k_end)

    inf_new_m = [jnp.full((1, L), jnp.inf)] + [zeros] * (MID_B - 1)
    nomask = jnp.zeros((1, L), bool)

    # Drains reuse the fast-path machinery: dedicated stale slots per drain
    # phase, replayed once at the end. Invalidate leftover stream-slot
    # sources first so the final stale pass cannot double-route them.
    stale_scr[2] = jnp.full((n_slots, L), -1.0)
    base_d = jnp.maximum(k_end - 1, 0) * chunk
    rst_d = (
        tuple(
            jnp.zeros((GRAD_ROWS, HIER_WIN_CH * chunk), jnp.float32)
            for _ in range(group)
        ),
        jnp.zeros((1, L), jnp.float32),
    )

    # Tail drain: +inf incoming pads push every held real entry out.
    drain_in = [
        jnp.full((TAIL_BATCH, LP), jnp.inf if p == 0 else 0.0, jnp.float32)
        for p in range(TAIL_PLANES)
    ]
    n_tail_drains = -(-kt // TAIL_BATCH)
    c = (state, fm, fh, rst_d)
    for d in range(n_tail_drains):
        c = tail_and_cascade(drain_in, c, d * TAIL_BATCH, base_d)
    state, fm, fh, rst_d = c
    drain_slot0 = n_tail_drains * TAIL_BATCH

    if batched_cascade:
        drain_m_b = (
            [jnp.full((CASC_BATCH, L), jnp.inf, jnp.float32)]
            + [jnp.zeros((CASC_BATCH, L), jnp.float32)]
            * (MID_B - 1)
        )
        n_mid_drains = -(-km // CASC_BATCH)
        c2 = (state, rst_d)
        for r in range(n_mid_drains):
            c2 = _cascade_rounds_b(
                c2, drain_m_b, drain_slot0 + r * CASC_BATCH, base_d
            )
        state, rst_d = c2
        hd_slot0 = drain_slot0 + n_mid_drains * CASC_BATCH
        for j in range(kh):
            e_h = [head[f, j:j + 1, :] for f in range(HEAD_B)]
            state, rst_d = blend_grads(state, true_m, e_h, rst_d,
                                       hd_slot0 + j, base_d)
    else:
        def drain_mid(i, carry):
            state, fm, fh, rst = carry
            pop_m = fm > 0
            e_m = _win_update(mid, MID_B, pop_m, nomask, inf_new_m)
            state, fh, rst = push_head(state, fh, pop_m, e_m, rst,
                                       drain_slot0 + i, base_d)
            fm = fm - pop_m.astype(jnp.int32)
            return state, fm, fh, rst

        state, fm, fh, rst_d = jax.lax.fori_loop(
            0, km, drain_mid, (state, fm, fh, rst_d)
        )

        def drain_head(i, carry):
            state, fh, rst = carry
            pop_h = fh > 0
            e_h = [head[f, 0:1, :] for f in range(HEAD_B)]
            state, rst = blend_grads(state, pop_h, e_h, rst,
                                     drain_slot0 + km + i, base_d)
            for f in range(HEAD_B):
                x = head[f]
                pad = jnp.inf if f == 0 else 0.0
                head[f] = jnp.where(
                    pop_h,
                    jnp.concatenate(
                        [x[1:], jnp.full_like(x[:1], pad)], axis=0
                    ),
                    x,
                )
            fh = fh - pop_h.astype(jnp.int32)
            return state, fh, rst

        state, fh, rst_d = jax.lax.fori_loop(
            0, kh, drain_head, (state, fh, rst_d)
        )
    flush_acc(rst_d[0], base_d)
    stale_pass(rst_d[1])

    # Expand moments -> gradient rows chunk-by-chunk (re-fetching the payload
    # features double-buffered) and write back to HBM, per tile.
    for j in range(group):
        wb_rounds = jnp.minimum(rounds_j[j], max_route)
        cx, cy = cxy[j]
        # Split-grad-rows mode (32x16 binning): half-tiles sharing a parent
        # segment write disjoint dpay row ranges; the VJP wrapper sums them
        # (see kbuffer_blend._bwd_kernel).
        if grad_row_split:
            row0 = GRAD_ROWS * ((order_ref[t * group + j] % grid_x) % 2)
        else:
            row0 = 0

        @pl.when(wb_rounds > 0)
        def _(j=j):
            get_dma(0, j, 0).start()

        def writeback(r, _, j=j, wb_rounds=wb_rounds, cx=cx, cy=cy,
                      row0=row0):
            @pl.when(r + 1 < wb_rounds)
            def _():
                get_dma((r + 1) % 2, j, r + 1).start()

            get_dma(r % 2, j, r).wait()
            feat = buf[r % 2, j]  # rows 0..5 = x, y, ca, cb, cc, opw
            off = pl.multiple_of(r * chunk, chunk)
            dm = dseg[j, :, pl.ds(off, chunk)]
            grads = moments_to_grads(dm, feat, cx, cy)
            dseg[j, :, pl.ds(off, chunk)] = jnp.concatenate(
                [grads, jnp.zeros((GRAD_ROWS - 9, chunk), jnp.float32)],
                axis=0,
            )
            dst = pl.multiple_of(starts[j] + r * chunk, chunk)
            cp = pltpu.make_async_copy(
                dseg.at[j, :, pl.ds(off, chunk)],
                dpay_ref.at[pl.ds(row0, GRAD_ROWS), pl.ds(dst, chunk)],
                wsem,
            )
            cp.start()
            cp.wait()
            return 0

        jax.lax.fori_loop(0, wb_rounds, writeback, 0)

        # Zero the truncated gradient tail of over-seg_cap segments in-kernel
        # (grad_overflow is reported upstream) so the VJP wrapper's masking
        # is a single column compare, not a per-column searchsorted (42
        # ms/step at config 2 — measured).
        @pl.when(rounds_j[j] > max_route)
        def _(j=j, wb_rounds=wb_rounds):
            dseg[j, :, pl.ds(0, chunk)] = jnp.zeros(
                (GRAD_ROWS, chunk), jnp.float32
            )

            def zfill(r, _, row0=row0):
                dst = pl.multiple_of(starts[j] + r * chunk, chunk)
                cp = pltpu.make_async_copy(
                    dseg.at[j, :, pl.ds(0, chunk)],
                    dpay_ref.at[pl.ds(row0, GRAD_ROWS), pl.ds(dst, chunk)],
                    wsem,
                )
                cp.start()
                cp.wait()
                return 0

            jax.lax.fori_loop(wb_rounds, rounds_j[j], zfill, 0)


def blend_hier_backward(
    payload: jnp.ndarray,
    fwd_packed: jnp.ndarray,
    grad_packed: jnp.ndarray,
    starts: jnp.ndarray,
    counts: jnp.ndarray,
    bg: jnp.ndarray,
    cam: jnp.ndarray,
    *,
    grid_x: int,
    grid_y: int,
    queue_sizes=(64, 8, 4),
    width: int,
    height: int,
    hier_4x4_culling: bool = False,
    chunk: int = 128,
    seg_cap: int = 16384,
    batched_cascade: bool = False,
    group: int = 1,
    route_precision=jax.lax.Precision.HIGHEST,
    grad_row_split: bool = False,
    interpret: bool = False,
):
    """Returns d_payload [32, C_pad] (rows 0..8 of written segments).

    ``group`` > 1 replays that many count-matched tiles per grid step (the
    forward's lane widening). Gradients are written at segment offsets, so
    no inverse permutation is needed."""
    kt, km, kh = queue_sizes
    num_tiles = grid_x * grid_y
    t_pad = -(-num_tiles // group) * group
    if group == 1:
        order = jnp.arange(num_tiles, dtype=jnp.int32)
        starts_p, counts_p = starts, counts
        fwd_p, grad_p = fwd_packed, grad_packed
    else:
        assert not batched_cascade, "grouped hier: batched cascade is parked"
        order = group_tiles(counts, group)
        safe = jnp.minimum(order, num_tiles - 1)
        real = order < num_tiles
        starts_p = jnp.where(real, starts[safe], 0)
        counts_p = jnp.where(real, counts[safe], 0)
        fwd_p = fwd_packed[safe]
        grad_p = grad_packed[safe]
    kernel = functools.partial(
        _bwd_kernel, kt=kt, km=km, kh=kh, chunk=chunk, seg_cap=seg_cap,
        grid_x=grid_x, width=width, height=height,
        hier_4x4_culling=hier_4x4_culling, batched_cascade=batched_cascade,
        group=group, route_prec=route_precision,
        grad_row_split=grad_row_split,
    )
    km_drain = -(-km // CASC_BATCH) * CASC_BATCH if batched_cascade else km
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(t_pad // group,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (group, 8, TILE_PIXELS), lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (group, 8, TILE_PIXELS), lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, group, KB_PAYLOAD_F, chunk), jnp.float32),
            pltpu.VMEM((PK_STAGE, chunk, group * 128), jnp.float32),
            pltpu.VMEM((TAIL_PLANES, kt, group * 128), jnp.float32),
            pltpu.VMEM((MID_B, km, group * TILE_PIXELS), jnp.float32),
            pltpu.VMEM((HEAD_B, kh, group * TILE_PIXELS), jnp.float32),
            pltpu.VMEM((6, TAIL_BATCH, group * TILE_PIXELS), jnp.float32),
            pltpu.VMEM(
                (3,
                 max(chunk,
                     -(-kt // TAIL_BATCH) * TAIL_BATCH + km_drain + kh),
                 group * TILE_PIXELS),
                jnp.float32,
            ),  # stale stage: s1, w, src
            pltpu.VMEM((group, GRAD_ROWS, seg_cap), jnp.float32),
            pltpu.SemaphoreType.DMA((2, group)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    params = {}
    if group > 1:
        # dseg alone is group x 16 x seg_cap x 4B; lift the default scoped
        # budget accordingly (physical VMEM bounds group x seg_cap).
        params["compiler_params"] = pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    else:
        params["compiler_params"] = pltpu.CompilerParams(
            has_side_effects=True,
        )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(payload.shape, jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        **params,
    )(starts_p, counts_p, order, bg, cam, payload, fwd_p, grad_p)
