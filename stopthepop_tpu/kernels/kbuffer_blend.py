"""Pallas TPU kernels: PER_PIXEL_KBUFFER sort-mode tile blend.

TPU-native re-architecture of the reference's k-buffer renderer
(renderkBufferCUDA / renderkBufferBackwardCUDA, resorted_render.cuh:17-471).
The CUDA version gives each pixel thread a register-resident K-entry window,
insertion-sorted by exact per-ray depth; blending pops the nearest entry when
the window overflows and drains it at stream end.

Here one Pallas grid step owns a whole 16x16 tile and the window lives in
vector registers as [K, 256] arrays — K window slots on the sublane axis, the
tile's 256 pixels on the lane axis — so one pop/insert is a handful of
full-width VPU ops serving all 256 rays at once (the CUDA warp's per-thread
scalar insertion loop collapses into vectorized select/shift ops).

Stream layout: payload is feature-major [32, C_pad] like the GLOBAL kernel
(lane-axis chunk DMAs must be 128-aligned on TPU). Rows:
  0 xy.x | 1 xy.y | 2 conic.a | 3 conic.b | 4 conic.c | 5 opacity |
  6 r | 7 g | 8 b | 9..14 inv-cov3D (xx,xy,xz,yy,yz,zz) | 15..17 u | 18.. pad
where u = Sigma^-1 (mean - campos) (the reference's packed cov3D_inv payload,
forward.cu:208-220). Per-pair alphas/depths are computed vectorized with
pixels on the sublane axis, then transposed once per chunk into the
pixels-on-lanes form the sequential window loop consumes.

The blending semantics are defined by render/naive.py::render_kbuffer_naive —
this kernel mirrors its float formulas operation-for-operation.
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
    TILE_PIXELS,
    TILE_X,
    TILE_Y,
)

KB_PAYLOAD_F = 32  # payload feature rows (18 used + pad)


def _tile_pixels_sublanes(tx, ty):
    """(pixf_x, pixf_y) [256, 1] with pixels row-major on the sublane axis."""
    j = jax.lax.broadcasted_iota(jnp.int32, (TILE_PIXELS, 1), 0)
    pixf_x = (tx * TILE_X + j % TILE_X).astype(jnp.float32)
    pixf_y = (ty * TILE_Y + j // TILE_X).astype(jnp.float32)
    return pixf_x, pixf_y


def _view_rays(cam_ref, pixf_x, pixf_y, width, height):
    """Per-pixel world ray directions (mirrors ops.transforms.compute_view_ray,
    reference stopthepop_common.cuh:68-74). Shapes follow the pixf inputs."""
    ndc_x = pixf_x * (2.0 / width) - 1.0
    ndc_y = pixf_y * (2.0 / height) - 1.0
    p = [
        ndc_x * cam_ref[0 + j] + ndc_y * cam_ref[4 + j] + cam_ref[12 + j]
        for j in range(4)
    ]
    inv_w = 1.0 / p[3]
    dx = p[0] * inv_w - cam_ref[16]
    dy = p[1] * inv_w - cam_ref[17]
    dz = p[2] * inv_w - cam_ref[18]
    norm = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    return dx / norm, dy / norm, dz / norm


def _chunk_alpha_depth(data, pixf_x, pixf_y, vd, count_rem):
    """Per-chunk effective alphas + exact per-ray depths.

    data [32, CH] feature-major payload chunk; pixf/vd [256, 1].
    Returns (alpha_eff [256, CH], depth [256, CH]) — alpha 0 where skipped
    (factor < 0, alpha < 1/255, ray depth < 0, slot beyond count).
    """
    ch = data.shape[1]
    vdx, vdy, vdz = vd
    dxp = data[0:1, :] - pixf_x  # [256, CH]
    dyp = data[1:2, :] - pixf_y
    ca, cb, cc, opw = (data[i:i + 1, :] for i in range(2, 6))
    factor = 0.5 * (ca * dxp * dxp + cc * dyp * dyp) + cb * dxp * dyp
    alpha = jnp.minimum(ALPHA_MAX, opw * jnp.exp(-factor))
    ixx, ixy, ixz, iyy, iyz, izz = (data[i:i + 1, :] for i in range(9, 15))
    u0, u1, u2 = (data[i:i + 1, :] for i in range(15, 18))
    num = u0 * vdx + u1 * vdy + u2 * vdz
    den = (
        ixx * vdx * vdx
        + iyy * vdy * vdy
        + izz * vdz * vdz
        + 2.0 * (ixy * vdx * vdy + ixz * vdx * vdz + iyz * vdy * vdz)
    )
    depth = num / jnp.maximum(RAY_DEPTH_DEN_FLOOR, den)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, ch), 1)
    ok = (
        (factor >= 0.0)
        & (alpha >= ALPHA_THRESHOLD)
        & (depth >= 0.0)
        & (col < count_rem)
    )
    return jnp.where(ok, alpha, 0.0), depth


def _pop_blend(win, state, popm):
    """Pop the front window entry and blend it where ``popm``.

    win: dict of [K, 256] arrays; state: (fill, T, Cr, Cg, Cb, nc, done, D)
    of [1, 256]. Mirrors naive.py::_kbuffer_pop exactly (D additionally
    accumulates w * ray_depth for the Depth debug visualization).
    """
    fill, T, Cr, Cg, Cb, nc, done, D = state
    a0 = win["a"][0:1]
    U = T * (1.0 - a0)
    # done is a float 0/1 latch (Mosaic cannot loop-carry i1 vectors).
    commit = popm & (done < 0.5) & (U >= T_THRESHOLD)
    done = jnp.maximum(done, (popm & (U < T_THRESHOLD)).astype(jnp.float32))
    w = jnp.where(commit, a0 * T, 0.0)
    Cr = Cr + w * win["r"][0:1]
    Cg = Cg + w * win["g"][0:1]
    Cb = Cb + w * win["b"][0:1]
    D = D + w * win["d"][0:1]
    T = jnp.where(commit, U, T)
    nc = nc + commit.astype(jnp.float32)

    def shift(x, pad):
        shifted = jnp.concatenate([x[1:], jnp.full_like(x[:1], pad)], axis=0)
        return jnp.where(popm, shifted, x)

    win = {k: shift(v, jnp.inf if k == "d" else 0.0) for k, v in win.items()}
    fill = fill - popm.astype(jnp.int32)
    return win, (fill, T, Cr, Cg, Cb, nc, done, D), commit, w


def _insert(win, fill, v, new):
    """Sorted-insert ``new`` (dict of [1, L]) where ``v``. Returns win, fill."""
    K, L = win["d"].shape
    pos = jnp.sum((win["d"] <= new["d"]).astype(jnp.int32), axis=0,
                  keepdims=True)
    ik = jax.lax.broadcasted_iota(jnp.int32, (K, L), 0)

    def ins(x, nv):
        shifted = jnp.concatenate([x[:1], x[:-1]], axis=0)
        out = jnp.where(ik < pos, x, jnp.where(ik == pos, nv, shifted))
        return jnp.where(v, out, x)

    win = {k: ins(win[k], new[k]) for k in win}
    return win, fill + v.astype(jnp.int32)


_WIN_FWD = ("d", "a", "r", "g", "b")


def _fwd_kernel(
    starts_ref, counts_ref, order_ref, bg_ref, cam_ref,  # scalar prefetch
    payload_ref,                              # HBM [32, C_pad]
    out_ref,                                  # VMEM block [G, 8, 256]
    buf, ad_scr, sems,                        # scratch (see grid_spec)
    *, k: int, chunk: int, grid_x: int, width: int, height: int,
    group: int,
):
    """One grid step blends ``group`` tiles: window/state arrays put the
    G x 256 pixels on the lane axis, so every op of the sequential per-pair
    loop serves G tiles at once (the loop is instruction-issue-bound — its
    [k, 256] operands are only 4 vregs wide — and HBM traffic is ~free, so
    widening the lanes is a near-linear speedup). ``starts``/``counts``
    arrive permuted by descending pair count (the wrapper pairs similar
    tiles so the shared round loop wastes little on imbalance);
    ``order_ref`` holds the original tile id for pixel coordinates."""
    t = pl.program_id(0)
    L = group * TILE_PIXELS
    starts = [starts_ref[t * group + j] for j in range(group)]
    counts = [counts_ref[t * group + j] for j in range(group)]
    rounds_j = [pl.cdiv(c, chunk) for c in counts]
    rounds = rounds_j[0]
    for r in rounds_j[1:]:
        rounds = jnp.maximum(rounds, r)
    pix = []   # per sub-tile ([256,1] pixf_x, pixf_y, view rays)
    for j in range(group):
        tid = order_ref[t * group + j]
        tx = tid % grid_x
        ty = tid // grid_x
        pixf_x, pixf_y = _tile_pixels_sublanes(tx, ty)
        vd = _view_rays(cam_ref, pixf_x, pixf_y, width, height)
        pix.append((pixf_x, pixf_y, vd))

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

    def consume(j, carry):
        win, state = carry
        # One dynamic-offset load for the whole entry (5 rows), not five.
        row = ad_scr[:, pl.ds(j, 1), :][:, 0, :]  # [5, L]
        a_j = row[0:1]
        v = a_j > 0.0
        popm = (state[0] == k) & v
        win, state, _, _ = _pop_blend(win, state, popm)
        new = {
            "d": row[1:2],
            "a": a_j,
            "r": row[2:3],
            "g": row[3:4],
            "b": row[4:5],
        }
        win, fill = _insert(win, state[0], v, new)
        return win, (fill,) + state[1:]

    def body(kk, carry):
        slot = kk % 2

        @pl.when(kk + 1 < rounds)
        def _():
            start_round((kk + 1) % 2, kk + 1)

        wait_round(slot, kk)
        for j in range(group):
            # Finished sub-tiles keep stale buffers; count_rem <= 0 masks
            # every pair's alpha to zero, so they idle through the round.
            data = buf[slot, j]
            pixf_x, pixf_y, vd = pix[j]
            a_all, depth = _chunk_alpha_depth(
                data, pixf_x, pixf_y, vd, counts[j] - kk * chunk
            )
            lo = j * TILE_PIXELS
            hi = lo + TILE_PIXELS
            ad_scr[0, :, lo:hi] = a_all.T  # pixels-on-lanes
            ad_scr[1, :, lo:hi] = depth.T
            for c in range(3):
                ad_scr[2 + c, :, lo:hi] = jnp.broadcast_to(
                    data[6 + c:7 + c, :].T, (chunk, TILE_PIXELS)
                )

        def quad(q, c):
            return jax.lax.fori_loop(
                0, 4, lambda j, cc: consume(q * 4 + j, cc), c, unroll=4
            )

        return jax.lax.fori_loop(0, chunk // 4, quad, carry)

    ones = jnp.ones((1, L), jnp.float32)
    zeros = jnp.zeros((1, L), jnp.float32)
    win0 = {
        "d": jnp.full((k, L), jnp.inf),
        "a": jnp.zeros((k, L)),
        "r": jnp.zeros((k, L)),
        "g": jnp.zeros((k, L)),
        "b": jnp.zeros((k, L)),
    }
    state0 = (
        jnp.zeros((1, L), jnp.int32),            # fill
        ones,                                    # T
        zeros, zeros, zeros,                     # C r/g/b
        zeros,                                   # n_contrib
        zeros,                                   # done latch (float 0/1)
        zeros,                                   # depth accumulator
    )

    # Round-level early termination: once every pixel's done latch is set
    # (T < 1e-4), no later pair can commit — pops are gated on the latch, so
    # skipping the rest of the stream is exact (forward.cu:331-335). The
    # per-round body consumes a whole chunk, so the while_loop's scalar
    # condition is amortized over 128 pairs (unlike the GLOBAL kernel, where
    # it would serialize round-sized work).
    def cond(carry):
        kk, (win, state) = carry
        return (kk < rounds) & (jnp.min(state[6]) < 0.5)

    def wbody(carry):
        kk, c = carry
        return kk + 1, body(kk, c)

    k_end, (win, state) = jax.lax.while_loop(
        cond, wbody, (jnp.int32(0), (win0, state0))
    )

    @pl.when(k_end < rounds)
    def _():
        wait_round(k_end % 2, k_end)

    def drain(_, carry):
        win, state = carry
        popm = state[0] > 0
        win, state, _, _ = _pop_blend(win, state, popm)
        return win, state

    win, state = jax.lax.fori_loop(0, k, drain, (win, state))
    fill, T, Cr, Cg, Cb, nc, done, D = state
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


def group_tiles(counts: jnp.ndarray, group: int):
    """Plan a count-balanced tile grouping for grouped blend kernels.

    Returns (order_pad [T_pad], starts_sel, counts_sel) index arrays where
    T_pad = ceil(T / group) * group: tiles sorted by descending pair count
    (so tiles sharing a grid step have similar stream lengths), padded with
    zero-count dummies. ``argsort(order_pad)[:T]`` inverts the permutation.
    """
    T = counts.shape[0]
    t_pad = -(-T // group) * group
    order = jnp.argsort(-counts).astype(jnp.int32)
    # Dummy ids T..T_pad-1 keep argsort-based inversion clean.
    return jnp.concatenate(
        [order, jnp.arange(T, t_pad, dtype=jnp.int32)]
    )


def blend_kbuffer_forward(
    payload: jnp.ndarray,   # [32, C_pad] f32 feature-major
    starts: jnp.ndarray,    # [T] int32 (chunk-aligned)
    counts: jnp.ndarray,    # [T] int32
    bg: jnp.ndarray,        # [3] f32
    cam: jnp.ndarray,       # [19] f32: inverse_vp flat (16) + campos (3)
    *,
    grid_x: int,
    grid_y: int,
    k: int,
    width: int,
    height: int,
    chunk: int = 128,
    group: int = 1,
    interpret: bool = False,
):
    """Run the k-buffer forward blend. Returns packed [T, 8, 256].

    ``group`` > 1 blends that many count-matched tiles per grid step (lane
    axis G x 256) — same math, ~G x fewer instruction issues for the
    sequential window loop.
    """
    num_tiles = grid_x * grid_y
    t_pad = -(-num_tiles // group) * group
    if group == 1:
        order = jnp.arange(num_tiles, dtype=jnp.int32)  # identity: no
        # balancing needed when each step owns one tile
        starts_p, counts_p = starts, counts
    else:
        order = group_tiles(counts, group)
        starts_p = jnp.where(order < num_tiles,
                             starts[jnp.minimum(order, num_tiles - 1)], 0)
        counts_p = jnp.where(order < num_tiles,
                             counts[jnp.minimum(order, num_tiles - 1)], 0)
    kernel = functools.partial(
        _fwd_kernel, k=k, chunk=chunk, grid_x=grid_x, width=width,
        height=height, group=group,
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
            pltpu.VMEM((5, chunk, group * TILE_PIXELS), jnp.float32),
            pltpu.SemaphoreType.DMA((2, group)),
        ],
    )
    packed_p = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t_pad, 8, TILE_PIXELS), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts_p, counts_p, order, bg, cam, payload)
    if group == 1:
        return packed_p
    return packed_p[jnp.argsort(order)[:num_tiles]]


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------
#
# Re-derivation of the reference's k-buffer backward (resorted_render.cuh:
# 223-471) for TPU. The reference replays the forward front-to-back with the
# same window resort; at each blend ("pop") it reconstructs the suffix
# contribution as (final_color - acc) / test_T from the saved pixel colors and
# scatters the per-Gaussian gradients with atomicAdd.
#
# Here the replay is identical, but the scatter is TPU-native AND factored so
# the replay stays cheap. Observation: every per-pair gradient row is a
# per-pixel CONSTANT times one of two per-pop scalars,
#
#   s1 = alpha * dL/dalpha        s2 = w = alpha * T,
#
# because with tile-relative pixel coords (px, py) and source features
# (x, y, ca, cb, cc, opw):
#   d_x   = -s1 (ca (xc-px) + cb (yc-py))          d_opw = s1 / opw
#   d_ca  = -s1/2 (xc-px)^2   ... etc              d_rgb = s2 * g_rgb.
# So the replay routes only the nine MOMENTS {s1*1, s1*px, s1*py, s1*px^2,
# s1*px*py, s1*py^2, s2*g_r, s2*g_g, s2*g_b} to their source pair columns
# (one-hot MXU matmul into a VMEM [16, seg_cap] accumulator), and a single
# per-chunk post-pass at writeback expands moments into the gradient rows
# from the (re-fetched) payload features. Two consequences:
#   * the replay window carries just {depth, alpha, c.g, src} — 4 fields vs
#     the forward's 5 (the 12-field direct-gradient variant was ~6x slower);
#   * the per-pop VPU work is two broadcast multiplies, not nine rows of
#     feature algebra.
# Moments use tile-center-relative pixel coordinates to keep the moment
# expansion numerically benign (terms stay within ~2 digits of the result).
# Gradients w.r.t. the inverse-covariance rows are identically zero (per-ray
# depth only permutes the blend order — a discrete, non-differentiable
# choice, exactly like the reference which emits no depth gradients).
#
# The per-pop alpha gradient (same algebra as the GLOBAL backward, suffix
# S = C_tot . g - acc . g reconstructed from the saved forward output):
#   dL/dalpha = commit * [ (c.g) T_before - (S + (bg.g + g_T) T_final)/(1-a) ]

GRAD_ROWS = 16  # 9 moment/gradient rows + 7 pad (f32 sublane alignment x2)


def _tile_pixels_lanes(tx, ty):
    """(pixf_x, pixf_y) [1, 256] with pixels row-major on the lane axis."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_PIXELS), 1)
    pixf_x = (tx * TILE_X + lane % TILE_X).astype(jnp.float32)
    pixf_y = (ty * TILE_Y + lane // TILE_X).astype(jnp.float32)
    return pixf_x, pixf_y


# ad_scr staging rows for the backward replay (all [CH, 256], pixels on lanes)
_BWD_STAGE = 3  # a, d, c.g


def moments_to_grads(dm, feat, cx, cy):
    """Expand routed moment rows into payload-gradient rows (one chunk).

    dm [GRAD_ROWS, CH]: rows 0..5 = s1-moments {1, px, py, px^2, px*py,
    py^2}, rows 6..8 = s2-moments {g_r, g_g, g_b}; feat [>=6, CH] = payload
    rows {x, y, ca, cb, cc, opw}; (cx, cy) = tile-center pixel coords the
    moments were taken about. Returns [9, CH] gradient rows
    (d_x, d_y, d_ca, d_cb, d_cc, d_opw, d_r, d_g, d_b).
    """
    xc = feat[0:1] - cx
    yc = feat[1:2] - cy
    ca, cb, cc = feat[2:3], feat[3:4], feat[4:5]
    opw = feat[5:6]
    m0, m1, m2 = dm[0:1], dm[1:2], dm[2:3]
    m3, m4, m5 = dm[3:4], dm[4:5], dm[5:6]
    ax = xc * m0 - m1          # sum s1 * dxp
    ay = yc * m0 - m2          # sum s1 * dyp
    return jnp.concatenate(
        [
            -(ca * ax + cb * ay),
            -(cc * ay + cb * ax),
            -0.5 * (xc * xc * m0 - 2.0 * xc * m1 + m3),
            -(xc * yc * m0 - xc * m2 - yc * m1 + m4),
            -0.5 * (yc * yc * m0 - 2.0 * yc * m2 + m5),
            m0 / jnp.maximum(opw, 1e-12),
            dm[6:7], dm[7:8], dm[8:9],
        ],
        axis=0,
    )




def route_moment_dots(masked_moments, onehot, lane, group, route_prec):
    """One-hot routing contraction shared by the k-buffer and hierarchical
    backward replays.

    ``masked_moments``: W matrices [GRAD_ROWS, L] (the moment rows, masked
    per destination window chunk); ``onehot`` [CH, L]; ``lane(x, g)``
    slices tile g's lane block. Returns per-group [GRAD_ROWS, W*CH]
    routing increments. All W window copies are STACKED into one tall
    operand for a single MXU dot — row counts up to 128 ride free on the
    128x128 systolic array, so one [W*16, L] dot costs the same passes as
    a [16, L] one while saving W-1 dot issues.

    ``route_prec == "split"`` selects exact bf16-split routing: each
    moment row is split hi/lo bf16 (m = hi + lo to ~2^-17 relative) and
    both halves join the stack for ONE 1-pass bf16 dot. The one-hot is
    exactly representable in bf16, so every product is exact in the f32
    accumulator and the only error is the hi+lo representation of the
    moment itself — f32-near-exact at 1-pass cost. (Measured round 5,
    config 2 k-buffer fwd+bwd: HIGHEST 164.5 ms, plain-DEFAULT 74.7 ms but
    FAILED the 5e-3 gradient verify at rel 3.4e-2 — split keeps the 1-pass
    cost with none of the loss; see results_r5/.)"""
    W = len(masked_moments)
    rows = masked_moments[0].shape[0]
    stack = masked_moments[0] if W == 1 else jnp.concatenate(
        masked_moments, axis=0
    )  # [W*rows, L]
    split = route_prec == "split"
    if split:
        hi = stack.astype(jnp.bfloat16)
        loo = (stack - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        stack = jnp.concatenate([hi, loo], axis=0)   # [2*W*rows, L] bf16
        oh = onehot.astype(jnp.bfloat16)
        prec = jax.lax.Precision.DEFAULT
    else:
        oh = onehot
        prec = route_prec
    out = []
    for g in range(group):
        res = jax.lax.dot_general(
            lane(stack, g), lane(oh, g),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        if split:
            res = res[:W * rows] + res[W * rows:]
        out.append(res if W == 1 else jnp.concatenate(
            [res[i * rows:(i + 1) * rows] for i in range(W)], axis=1,
        ))  # [rows, W*CH]
    return out


def _bwd_kernel(
    starts_ref, counts_ref, order_ref, bg_ref, cam_ref,  # scalar prefetch
    payload_ref,                              # HBM [32, C_pad]
    fwd_ref,                                  # VMEM [G, 8, 256] forward packed
    grad_ref,                                 # VMEM [G, 8, 256] cotangent
    dpay_ref,                                 # HBM out [32, C_pad]
    buf, ad_scr, stale_scr, dseg, sems, wsem,  # scratch
    *, k: int, chunk: int, seg_cap: int, grid_x: int,
    width: int, height: int, group: int,
    route_prec=jax.lax.Precision.HIGHEST,
    grad_row_split: bool = False,
):
    """Grouped like _fwd_kernel: window/state/basis arrays carry the G x 256
    pixels on the lane axis so the sequential replay's VPU work serves G
    count-matched tiles per instruction. Per-tile state (segment offsets,
    dseg accumulators, routing matmuls, writeback) stays per-tile: the
    one-hot routing contracts each tile's 256-pixel lane slice separately
    (a shared column space would mix tiles' segments)."""
    t = pl.program_id(0)
    L = group * TILE_PIXELS
    starts = [starts_ref[t * group + j] for j in range(group)]
    counts = [counts_ref[t * group + j] for j in range(group)]
    rounds_j = [pl.cdiv(c, chunk) for c in counts]
    rounds = rounds_j[0]
    for r in rounds_j[1:]:
        rounds = jnp.maximum(rounds, r)
    max_route = seg_cap // chunk
    pix = []
    cxy = []
    k1_j, k2_j, KT_j, ctot_j = [], [], [], []
    for j in range(group):
        tid = order_ref[t * group + j]
        tx = tid % grid_x
        ty = tid // grid_x
        pixf_x, pixf_y = _tile_pixels_sublanes(tx, ty)
        vd = _view_rays(cam_ref, pixf_x, pixf_y, width, height)
        pix.append((pixf_x, pixf_y, vd))
        plx, ply = _tile_pixels_lanes(tx, ty)

        gp = grad_ref[j]                  # [8, 256]
        fw = fwd_ref[j]
        g_r, g_g, g_b = gp[0:1, :], gp[1:2, :], gp[2:3, :]
        g_T = gp[3:4, :]
        T_final = fw[3:4, :]
        KT_j.append(
            (g_r * bg_ref[0] + g_g * bg_ref[1] + g_b * bg_ref[2] + g_T)
            * T_final
        )
        # Total committed color-dot-grad (fwd output minus background term).
        ctot_j.append(
            (fw[0:1, :] - T_final * bg_ref[0]) * g_r
            + (fw[1:2, :] - T_final * bg_ref[1]) * g_g
            + (fw[2:3, :] - T_final * bg_ref[2]) * g_b
        )
        # Per-pixel moment basis about the tile center (moments_to_grads).
        cx = (tx * TILE_X).astype(jnp.float32) + (TILE_X - 1) / 2.0
        cy = (ty * TILE_Y).astype(jnp.float32) + (TILE_Y - 1) / 2.0
        cxy.append((cx, cy))
        px = plx - cx
        py = ply - cy
        k1_j.append(jnp.concatenate(
            [jnp.ones((1, TILE_PIXELS), jnp.float32), px, py,
             px * px, px * py, py * py],
            axis=0,
        ))  # [6, 256] s1 basis
        k2_j.append(jnp.concatenate([g_r, g_g, g_b], axis=0))  # [3, 256]
    KT = jnp.concatenate(KT_j, axis=1)        # [1, L]
    ctot_g = jnp.concatenate(ctot_j, axis=1)  # [1, L]
    k1 = jnp.concatenate(k1_j, axis=1)        # [6, L]
    k2 = jnp.concatenate(k2_j, axis=1)        # [3, L]
    mpad = jnp.zeros((GRAD_ROWS - 9, L), jnp.float32)

    dseg[...] = jnp.zeros((group, GRAD_ROWS, seg_cap), jnp.float32)

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

    # One-hot matrices are built with the COLUMN index on sublanes and the
    # pixel on lanes, and consumed by a dot_general contracting both
    # operands' lane axes — a [1, 256] -> [256, 1] transpose of the source
    # row per pop costs ~500 ns on this hardware (measured; it dominated an
    # earlier formulation), while the broadcast compare is ~free. The iotas
    # span the full G x 256 lane width: compares must run on offset-0 wide
    # vectors (Mosaic cannot broadcast a lane-offset slice).
    sub1w = jax.lax.broadcasted_iota(jnp.int32, (chunk, L), 0)
    lane_q = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1) // TILE_PIXELS
    block_mask = [lane_q == j for j in range(group)]  # static [1, L] each

    def lane(x, j):
        return x[:, j * TILE_PIXELS:(j + 1) * TILE_PIXELS]

    def emit_scalars(state, popm, a0, cdotg):
        """Shared blend-state update: returns (state', commit, w, s1)."""
        fill, T, acc_g, nc, done = state
        U = T * (1.0 - a0)
        commit = popm & (done < 0.5) & (U >= T_THRESHOLD)
        done = jnp.maximum(done, (popm & (U < T_THRESHOLD)).astype(jnp.float32))
        w = jnp.where(commit, a0 * T, 0.0)
        acc_g = acc_g + w * cdotg
        suffix = ctot_g - acc_g
        galpha = jnp.where(
            commit & (a0 < ALPHA_MAX),
            cdotg * T - (suffix + KT) / (1.0 - a0),
            0.0,
        )
        s1 = galpha * a0
        T = jnp.where(commit, U, T)
        nc = nc + commit.astype(jnp.float32)
        return (fill, T, acc_g, nc, done), commit, w, s1

    def route_slow(s1, w, src, lo, hi):
        """Route moments for srcs in [lo, hi) via per-chunk one-hot matmuls
        (dynamic loop — used only off the hot path: the rare stale pops and
        the k drain pops). Inputs are [1, L]; each tile's lane slice routes
        into its own dseg accumulator."""
        moments = jnp.concatenate([s1 * k1, w * k2, mpad], axis=0)
        route = (w > 0.0) & (src >= lo) & (src < hi) & (src < seg_cap)
        chunk_id = jnp.where(route, src // chunk, 0)
        for j in range(group):
            route_j = route & block_mask[j]  # wide, offset-0
            cmin = jnp.min(jnp.where(route_j, chunk_id, max_route))
            cmax = jnp.max(jnp.where(route_j, chunk_id, -1))

            def route_chunk(r, _, j=j, route_j=route_j):
                sel = route_j & (chunk_id == r)
                colm = jnp.where(sel, src - r * chunk, -1)  # wide [1, L]
                onehot_w = (colm == sub1w).astype(jnp.float32)  # [CH, L]
                dchunk = route_moment_dots(
                    [moments], onehot_w,
                    lambda x, g, _j=j: lane(x, _j),  # route tile j's lanes
                    1, route_prec,
                )[0]
                off = pl.multiple_of(r * chunk, chunk)
                dseg[j, :, pl.ds(off, chunk)] += dchunk
                return 0

            jax.lax.fori_loop(cmin, cmax + 1, route_chunk, 0)

    def pop_grads(win, state, popm, route_acc, j, base):
        """Pop + blend + branch-free moment routing.

        Fast path: one unconditional one-hot matmul PER TILE into the
        carried [16, 2*chunk] accumulators spanning the previous + current
        stream chunks (a per-pop data-dependent branch stalls the Mosaic
        pipeline for ~an order of magnitude more than the matmul costs —
        measured). Rarer, older sources are staged and routed once per
        chunk under a single guard.
        """
        a0 = win["a"][0:1]
        cdotg = win["cg"][0:1]
        src = win["src"][0:1]  # [1, L] int32 segment-local pair index
        state, commit, w, s1 = emit_scalars(state, popm, a0, cdotg)

        moments = jnp.concatenate([s1 * k1, w * k2, mpad], axis=0)
        lo = (base - chunk)  # window start: previous chunk
        sel = commit & (src >= lo) & (src < base + chunk)
        # Two-level routing (round 4): the [2*CH, L] window one-hot compare
        # was the dominant per-pop cost — its VPU work scales with the
        # window span. Split the column into (window chunk, within-chunk):
        # ONE [CH, L] within one-hot (src % chunk; -1 never matches) plus a
        # [1, L] per-window-chunk mask folded into the 16 moment rows.
        # Exact: the addend multisets per output column are identical (the
        # other half's lanes contribute exact 0.0 either way). The wide
        # compare runs at offset 0 (Mosaic cannot broadcast a lane-offset
        # slice); the per-tile dots slice afterwards.
        within = jnp.where(sel, src % chunk, -1)
        onehot1 = (within == sub1w).astype(jnp.float32)  # [CH, L]
        whalf = src >= base  # current chunk vs previous
        m_prev = (sel & ~whalf).astype(jnp.float32)
        m_cur = (sel & whalf).astype(jnp.float32)
        inc = route_moment_dots(
            [moments * m_prev, moments * m_cur], onehot1, lane, group,
            route_prec,
        )
        route_acc = tuple(
            route_acc[g] + inc[g] for g in range(group)
        )  # each [16, 2*CH]

        stale = commit & (src >= 0) & (src < lo)
        stale_scr[:, pl.ds(j, 1), :] = jnp.stack(
            [s1, w, jnp.where(stale, src, -1).astype(jnp.float32)],
            axis=0,
        )

        def shift(x, pad):
            shifted = jnp.concatenate(
                [x[1:], jnp.full_like(x[:1], pad)], axis=0
            )
            return jnp.where(popm, shifted, x)

        win = {
            kk: shift(v, jnp.inf if kk == "d" else (-1 if kk == "src" else 0.0))
            for kk, v in win.items()
        }
        fill = state[0] - popm.astype(jnp.int32)
        return win, (fill,) + state[1:], route_acc, stale.astype(jnp.float32)

    def consume(j, carry, base):
        win, state, route_acc, stale_any = carry
        # One dynamic-offset load for the whole entry (3 rows), not three.
        row = ad_scr[:, pl.ds(j, 1), :][:, 0, :]  # [3, L]
        a_j = row[0:1]
        v = a_j > 0.0
        popm = (state[0] == k) & v
        win, state, route_acc, st = pop_grads(
            win, state, popm, route_acc, j, base
        )
        srcv = jnp.full((1, L), 0, jnp.int32) + (base + j)
        new = {
            "d": row[1:2],
            "a": a_j,
            "cg": row[2:3],
            "src": srcv,
        }
        win, fill = _insert(win, state[0], v, new)
        return win, (fill,) + state[1:], route_acc, jnp.maximum(stale_any, st)

    def body(kk, carry):
        win, state = carry
        slot = kk % 2

        @pl.when(kk + 1 < rounds)
        def _():
            start_round((kk + 1) % 2, kk + 1)

        wait_round(slot, kk)
        for j in range(group):
            data = buf[slot, j]
            pixf_x, pixf_y, vd = pix[j]
            a_all, depth = _chunk_alpha_depth(
                data, pixf_x, pixf_y, vd, counts[j] - kk * chunk
            )
            lo_l = j * TILE_PIXELS
            hi_l = lo_l + TILE_PIXELS
            ad_scr[0, :, lo_l:hi_l] = a_all.T
            ad_scr[1, :, lo_l:hi_l] = depth.T
            # c.g for every (pair, pixel): rank-3 contraction on the MXU.
            ad_scr[2, :, lo_l:hi_l] = jax.lax.dot_general(
                data[6:9, :], k2_j[j],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [CH, 256]

        base = kk * chunk
        racc0 = tuple(
            jnp.zeros((GRAD_ROWS, 2 * chunk), jnp.float32)
            for _ in range(group)
        )

        def quad(q, c):
            return jax.lax.fori_loop(
                0, 4,
                lambda j, cc: consume(q * 4 + j, cc, base), c,
                unroll=4,
            )

        win, state, route_acc, stale_any = jax.lax.fori_loop(
            0, chunk // 4, quad,
            (win, state, racc0, jnp.zeros((1, L), jnp.float32)),
        )

        # Flush the two-chunk accumulators: the left half is chunk kk-1
        # (clamped to 0 at kk=0, where that half is identically zero) and
        # the right half is chunk kk. Offsets at or past seg_cap are
        # truncation (reported upstream via grad_overflow) — skip them.
        for j in range(group):
            def flush(off, half, j=j):
                @pl.when(off < seg_cap)
                def _():
                    dseg[j, :, pl.ds(pl.multiple_of(off, chunk), chunk)] += half

            flush(jnp.maximum(kk - 1, 0) * chunk, route_acc[j][:, 0:chunk])
            flush(kk * chunk, route_acc[j][:, chunk:2 * chunk])

        # Rare: pops whose source predates the two-chunk window — replay
        # their staged scalars through the dynamic routing loop, one guard
        # per chunk instead of one per pop.
        @pl.when(jnp.max(stale_any) > 0.0)
        def _():
            def stale_one(j, _):
                row = stale_scr[:, pl.ds(j, 1), :][:, 0, :]
                s1j, wj = row[0:1], row[1:2]
                srcj = row[2:3].astype(jnp.int32)
                wj = jnp.where(srcj >= 0, wj, 0.0)
                route_slow(s1j, wj, srcj, 0, base - chunk)
                return 0

            jax.lax.fori_loop(0, chunk, stale_one, 0)

        return win, state

    ones = jnp.ones((1, L), jnp.float32)
    zeros = jnp.zeros((1, L), jnp.float32)
    win0 = {
        "d": jnp.full((k, L), jnp.inf),
        "a": jnp.zeros((k, L)),
        "cg": jnp.zeros((k, L)),
        "src": jnp.full((k, L), -1, jnp.int32),
    }
    state0 = (
        jnp.zeros((1, L), jnp.int32),            # fill
        ones,                                    # T
        zeros,                                   # acc . g
        zeros,                                   # n_contrib (unused)
        zeros,                                   # done latch
    )

    # Round-level early termination mirroring the forward: all gradients
    # after every pixel's done latch is set are identically zero (dseg was
    # pre-zeroed, so the skipped rounds still write zeros back).
    def rcond(carry):
        kk, (win, state) = carry
        return (kk < rounds) & (jnp.min(state[4]) < 0.5)

    def rbody(carry):
        kk, c = carry
        return kk + 1, body(kk, c)

    k_end, (win, state) = jax.lax.while_loop(
        rcond, rbody, (jnp.int32(0), (win0, state0))
    )

    @pl.when(k_end < rounds)
    def _():
        wait_round(k_end % 2, k_end)

    def drain(_, carry):
        win, state = carry
        popm = state[0] > 0
        a0 = win["a"][0:1]
        cdotg = win["cg"][0:1]
        src = win["src"][0:1]
        state, commit, w, s1 = emit_scalars(state, popm, a0, cdotg)
        route_slow(s1, w, src, 0, seg_cap)

        def shift(x, pad):
            shifted = jnp.concatenate(
                [x[1:], jnp.full_like(x[:1], pad)], axis=0
            )
            return jnp.where(popm, shifted, x)

        win = {
            kk: shift(v, jnp.inf if kk == "d" else (-1 if kk == "src" else 0.0))
            for kk, v in win.items()
        }
        fill = state[0] - popm.astype(jnp.int32)
        return win, (fill,) + state[1:]

    win, state = jax.lax.fori_loop(0, k, drain, (win, state))

    # Expand moments -> gradient rows chunk-by-chunk (re-fetching the payload
    # features double-buffered) and write back to HBM, per tile.
    for j in range(group):
        wb_rounds = jnp.minimum(rounds_j[j], max_route)
        cx, cy = cxy[j]
        # Split-grad-rows mode (32x16 binning): the two 16x16 half-tiles of
        # one binning tile share a payload segment, so they write DISJOINT
        # dpay row ranges (even tx -> rows 0..15, odd tx -> 16..31) and the
        # VJP wrapper sums the halves; otherwise both would clobber the
        # same rows (last writer wins).
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

        # Segments longer than seg_cap truncate their gradient tail
        # (reported upstream as grad_overflow); write ZEROS there so the
        # wrapper needs no per-column segment masking (a searchsorted over
        # the whole pair domain cost 42 ms/step at config 2 — measured).
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


def blend_kbuffer_backward(
    payload: jnp.ndarray,      # [32, C_pad]
    fwd_packed: jnp.ndarray,   # [T, 8, 256] forward output
    grad_packed: jnp.ndarray,  # [T, 8, 256] cotangent
    starts: jnp.ndarray,
    counts: jnp.ndarray,
    bg: jnp.ndarray,
    cam: jnp.ndarray,
    *,
    grid_x: int,
    grid_y: int,
    k: int,
    width: int,
    height: int,
    chunk: int = 128,
    seg_cap: int = 16384,
    group: int = 1,
    route_precision=jax.lax.Precision.HIGHEST,
    grad_row_split: bool = False,
    interpret: bool = False,
):
    """Returns d_payload [32, C_pad] (rows 0..8; only segment prefixes of
    length <= seg_cap are written — zero the rest outside).

    ``group`` > 1 replays that many count-matched tiles per grid step (the
    forward's lane-widening; see _bwd_kernel). The gradient output is
    written at segment offsets, so no inverse permutation is needed.
    """
    num_tiles = grid_x * grid_y
    t_pad = -(-num_tiles // group) * group
    if group == 1:
        order = jnp.arange(num_tiles, dtype=jnp.int32)
        starts_p, counts_p = starts, counts
        fwd_p, grad_p = fwd_packed, grad_packed
    else:
        order = group_tiles(counts, group)
        safe = jnp.minimum(order, num_tiles - 1)
        real = order < num_tiles
        starts_p = jnp.where(real, starts[safe], 0)
        counts_p = jnp.where(real, counts[safe], 0)
        fwd_p = fwd_packed[safe]
        grad_p = grad_packed[safe]
    kernel = functools.partial(
        _bwd_kernel, k=k, chunk=chunk, seg_cap=seg_cap, grid_x=grid_x,
        width=width, height=height, group=group,
        route_prec=route_precision, grad_row_split=grad_row_split,
    )
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
            pltpu.VMEM((_BWD_STAGE, chunk, group * TILE_PIXELS), jnp.float32),
            pltpu.VMEM((3, chunk, group * TILE_PIXELS), jnp.float32),  # stale
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
