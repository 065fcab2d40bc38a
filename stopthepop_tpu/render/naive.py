"""Naive reference renderers (pure jnp, differentiable): the test oracles.

These render O(P * pixels) with no tiling; they define the exact blending
semantics every production kernel must match (BASELINE.json config 1).

The reference's sequential per-pixel loop (forward.cu:286-349) is re-derived
here as a *masked cumulative product*: with front-to-back order, per-Gaussian
effective alpha  ᾱ_i = α_i·[α_i ≥ 1/255]  and transmittance
U_k = Π_{i≤k} (1-ᾱ_i), the loop's early-exit (`test_T < 1e-4 → done`) is
exactly the mask  [U_i ≥ 1e-4]  because U is monotone non-increasing — so the
sequential loop becomes a prefix product + masked weighted sum, which is the
TPU-native formulation (vectorized, differentiable, and chunk-parallel).

Gradient note: the masks/thresholds are non-differentiable cutoffs, exactly
like the reference's CUDA backward which also treats them as constants.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import GlobalSortOrder
from ..constants import (
    ALPHA_MAX,
    ALPHA_THRESHOLD,
    T_THRESHOLD,
    TAIL_BATCH,
    TILE_X,
    TILE_Y,
)
from ..ops.stopthepop import (
    depth_along_ray,
    max_contrib_power_rect,
    per_tile_depth,
    tile_rect_bounds,
)
from ..ops.transforms import compute_view_ray
from .preprocess import PreprocessOutput


def _pixel_grid(width: int, height: int, dtype=jnp.float32):
    """[H*W, 2] pixel-center coordinates (x, y), row-major like the reference."""
    xs = jnp.arange(width, dtype=dtype)
    ys = jnp.arange(height, dtype=dtype)
    px, py = jnp.meshgrid(xs, ys)  # [H, W]
    return jnp.stack([px.reshape(-1), py.reshape(-1)], axis=-1)


def _alpha(conic_opacity, mean2d, pix):
    """α for one Gaussian batch against all pixels.

    conic_opacity [G, 4], mean2d [G, 2], pix [N, 2] -> (alpha [G, N],
    skip_mask [G, N] where the Gaussian is skipped entirely).
    Matches forward.cu:312-325 (power>0 skip, 0.99 clamp, 1/255 skip).
    """
    d = mean2d[:, None, :] - pix[None, :, :]  # [G, N, 2]
    a = conic_opacity[:, 0:1]
    b = conic_opacity[:, 1:2]
    c = conic_opacity[:, 2:3]
    opw = conic_opacity[:, 3:4]
    factor = 0.5 * (a * d[..., 0] ** 2 + c * d[..., 1] ** 2) + b * d[..., 0] * d[..., 1]
    alpha = jnp.minimum(ALPHA_MAX, opw * jnp.exp(-factor))
    skip = (factor < 0.0) | (alpha < ALPHA_THRESHOLD)
    return alpha, skip


def blend_prefix(alpha_eff, rgb, T_carry, C_carry, idx_carry, base_index):
    """Blend one front-to-back batch with the masked-cumprod formulation.

    Args:
      alpha_eff: [G, N] effective alphas (0 where skipped).
      rgb:       [G, N, 3] or [G, 3] colors.
      T_carry:   [N] incoming transmittance (already latched at done).
      C_carry:   [N, 3] accumulated color.
      idx_carry: [N] int32 last-contributor position so far.
      base_index: [G] or scalar int32 — global 1-based positions of this batch.

    Returns updated (T, C, idx).
    """
    log_one_minus = jnp.log1p(-alpha_eff)  # [G, N]; alpha <= 0.99 so finite
    logU = jnp.cumsum(log_one_minus, axis=0)
    U = T_carry[None, :] * jnp.exp(logU)  # inclusive transmittance [G, N]
    T_before = jnp.concatenate([T_carry[None, :], U[:-1]], axis=0)
    commit = U >= T_THRESHOLD  # [G, N] — latch via monotonicity
    w = alpha_eff * T_before * commit  # [G, N]
    if rgb.ndim == 2:
        C_new = C_carry + jnp.einsum("gn,gc->nc", w, rgb)
    else:
        C_new = C_carry + jnp.einsum("gn,gnc->nc", w, rgb)
    U_committed = jnp.where(commit, U, jnp.inf)
    T_new = jnp.minimum(T_carry, jnp.min(U_committed, axis=0))
    contributed = commit & (alpha_eff > 0.0)
    if jnp.ndim(base_index) == 0:
        pos = base_index + jnp.arange(alpha_eff.shape[0], dtype=jnp.int32)
    else:
        pos = base_index
    idx_new = jnp.maximum(
        idx_carry, jnp.max(jnp.where(contributed, pos[:, None], 0), axis=0)
    )
    return T_new, C_new, idx_new


def _finalize(C, T, bg, width, height):
    """out = C + T * bg, laid out [3, H, W] like the reference."""
    img = C + T[:, None] * bg[None, :]
    return jnp.transpose(img.reshape(height, width, 3), (2, 0, 1))


@partial(jax.jit, static_argnames=("width", "height", "chunk"))
def render_global_naive(
    prep: PreprocessOutput,
    bg: jnp.ndarray,
    width: int,
    height: int,
    chunk: int = 256,
):
    """GLOBAL sort-mode oracle: one global depth order for all pixels.

    Pixels only see Gaussians whose tile rect covers their tile (same
    visibility as the tiled renderer, so results match it exactly).

    Returns (color [3, H, W], final_T [H*W], n_contrib [H*W]).
    """
    P = prep.mean2d.shape[0]
    N = width * height
    pix = _pixel_grid(width, height)
    pix_tile = jnp.stack(
        [
            (pix[:, 0] // TILE_X).astype(jnp.int32),
            (pix[:, 1] // TILE_Y).astype(jnp.int32),
        ],
        axis=-1,
    )

    depth_sort = jnp.where(prep.valid, prep.depth, jnp.inf)
    order = jnp.argsort(depth_sort)
    mean2d = prep.mean2d[order]
    co = prep.conic_opacity[order]
    rgb = prep.rgb[order]
    rect_min = prep.rect_min[order]
    rect_max = prep.rect_max[order]
    valid = prep.valid[order]

    pad = (-P) % chunk
    if pad:
        mean2d = jnp.pad(mean2d, ((0, pad), (0, 0)))
        co = jnp.pad(co, ((0, pad), (0, 0)))
        rgb = jnp.pad(rgb, ((0, pad), (0, 0)))
        rect_min = jnp.pad(rect_min, ((0, pad), (0, 0)))
        rect_max = jnp.pad(rect_max, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    n_chunks = (P + pad) // chunk

    def body(carry, inputs):
        T, C, idx = carry
        (mean2d_c, co_c, rgb_c, rmin_c, rmax_c, valid_c, base) = inputs
        alpha, skip = _alpha(co_c, mean2d_c, pix)
        in_rect = (
            (pix_tile[None, :, 0] >= rmin_c[:, None, 0])
            & (pix_tile[None, :, 0] < rmax_c[:, None, 0])
            & (pix_tile[None, :, 1] >= rmin_c[:, None, 1])
            & (pix_tile[None, :, 1] < rmax_c[:, None, 1])
        )
        alpha_eff = jnp.where(
            skip | ~in_rect | ~valid_c[:, None], 0.0, alpha
        )
        T, C, idx = blend_prefix(alpha_eff, rgb_c, T, C, idx, base)
        return (T, C, idx), None

    init = (
        jnp.ones((N,), jnp.float32),
        jnp.zeros((N, 3), jnp.float32),
        jnp.zeros((N,), jnp.int32),
    )
    bases = (
        jnp.arange(n_chunks, dtype=jnp.int32)[:, None] * chunk
        + jnp.arange(1, chunk + 1, dtype=jnp.int32)[None, :]
    )
    inputs = (
        mean2d.reshape(n_chunks, chunk, 2),
        co.reshape(n_chunks, chunk, 4),
        rgb.reshape(n_chunks, chunk, 3),
        rect_min.reshape(n_chunks, chunk, 2),
        rect_max.reshape(n_chunks, chunk, 2),
        valid.reshape(n_chunks, chunk),
        bases,
    )
    (T, C, idx), _ = jax.lax.scan(body, init, inputs)
    return _finalize(C, T, bg, width, height), T, idx


@partial(jax.jit, static_argnames=("width", "height"))
def render_full_sort_naive(
    prep: PreprocessOutput,
    bg: jnp.ndarray,
    width: int,
    height: int,
    campos: jnp.ndarray,
    inverse_vp: jnp.ndarray,
):
    """PER_PIXEL_FULL oracle: exact per-pixel depth sort of *all* Gaussians.

    O(P * pixels * log P) memory-heavy ground truth (mirror of the reference's
    fwd-only renderSortedFullCUDA, resorted_render.cuh:474-675). Use small
    scenes only. Returns (color [3, H, W], final_T, n_contrib,
    depth_acc [H, W]).
    """
    N = width * height
    pix = _pixel_grid(width, height)
    pix_tile = jnp.stack(
        [
            (pix[:, 0] // TILE_X).astype(jnp.int32),
            (pix[:, 1] // TILE_Y).astype(jnp.int32),
        ],
        axis=-1,
    )

    viewdir = compute_view_ray(pix, width, height, inverse_vp, campos)  # [N, 3]
    depth = depth_along_ray(prep.cov3d_inv9[:, None, :], viewdir[None, :, :])  # [P, N]

    alpha, skip = _alpha(prep.conic_opacity, prep.mean2d, pix)
    in_rect = (
        (pix_tile[None, :, 0] >= prep.rect_min[:, None, 0])
        & (pix_tile[None, :, 0] < prep.rect_max[:, None, 0])
        & (pix_tile[None, :, 1] >= prep.rect_min[:, None, 1])
        & (pix_tile[None, :, 1] < prep.rect_max[:, None, 1])
    )
    # Negative per-ray depth culls (resorted_render.cuh:182-184).
    alpha_eff = jnp.where(
        skip | ~in_rect | ~prep.valid[:, None] | (depth < 0.0), 0.0, alpha
    )

    # Per-pixel sort by exact ray depth (inactive entries last).
    depth_key = jnp.where(alpha_eff > 0.0, depth, jnp.inf)
    order = jnp.argsort(depth_key, axis=0)  # [P, N]
    alpha_sorted = jnp.take_along_axis(alpha_eff, order, axis=0)
    depth_sorted = jnp.take_along_axis(depth, order, axis=0)
    rgb_sorted = prep.rgb[order]  # [P, N, 3]

    # 4th channel accumulates w * ray_depth (the Depth debug viz).
    rgbd = jnp.concatenate(
        [rgb_sorted, jax.lax.stop_gradient(depth_sorted)[..., None]], axis=-1
    )
    T0 = jnp.ones((N,), jnp.float32)
    C0 = jnp.zeros((N, 4), jnp.float32)
    idx0 = jnp.zeros((N,), jnp.int32)
    T, C, idx = blend_prefix(
        alpha_sorted, rgbd, T0, C0, idx0, jnp.int32(1)
    )
    return (
        _finalize(C[:, :3], T, bg, width, height), T, idx,
        C[:, 3].reshape(height, width),
    )


# ---------------------------------------------------------------------------
# PER_PIXEL_KBUFFER oracle
# ---------------------------------------------------------------------------
#
# Sequential semantics of the k-buffer resort (mirror of the reference's
# renderkBufferCUDA, resorted_render.cuh:17-221), defined here as THE spec the
# Pallas kernel must reproduce bit-for-bit (same formulas, same order):
#
#   per pixel, a K-entry window sorted ascending by *exact per-ray depth*;
#   the stream (the pixel's tile range, in global pair-key order) is consumed
#   one element at a time:
#     - skip if alpha-culled (factor < 0, alpha < 1/255) or ray depth < 0;
#     - if the window is full, pop the *front* (nearest) entry and blend it
#       front-to-back (commit only while transmittance stays above 1e-4; a
#       failed commit latches `done` like the reference's early break);
#     - insert the incoming entry at its sorted position;
#   at stream end the window is drained front-to-back with the same blending.


def _accum_sort_error(serr, commit, alpha, depth):
    """Reference sort-error accumulation (stopthepop_common.cuh:264-282):
    for each committed contribution whose per-ray depth is below the
    running max of prior committed depths, add its opacity (resp. the
    depth gap) to the per-pixel error. ``serr = (dmax, eop, edist)``,
    all [N]; pass None to skip."""
    if serr is None:
        return None
    dmax, eop, edist = serr
    real = commit & (alpha > 0.0)
    # Tied depths count as out-of-order, like the reference's
    # depth <= currentMaxDepth compare (stopthepop_common.cuh:266).
    ooo = real & (depth <= dmax)
    eop = eop + jnp.where(ooo, alpha, 0.0)
    edist = edist + jnp.where(ooo, dmax - depth, 0.0)
    dmax = jnp.where(real, jnp.maximum(dmax, depth), dmax)
    return dmax, eop, edist


def _init_sort_error(N):
    return (
        jnp.full((N,), -jnp.inf), jnp.zeros((N,)), jnp.zeros((N,)),
    )


def _kbuffer_pop(win, fill, T, C, nc, done, popm, serr=None):
    """Pop the front window entry and blend it where ``popm``.

    win = (d, a, r, g, b) arrays [K, N]; scalars [N]. Returns updated state
    (plus the updated sort-error accumulator when ``serr`` is given).
    """
    d, a, r, g, b = win
    a0, r0, g0, b0 = a[0], r[0], g[0], b[0]
    U = T * (1.0 - a0)
    commit = popm & ~done & (U >= T_THRESHOLD)
    serr = _accum_sort_error(serr, commit, a0, d[0])
    done = done | (popm & (U < T_THRESHOLD))
    w = jnp.where(commit, a0 * T, 0.0)
    C = C + w[:, None] * jnp.stack([r0, g0, b0], axis=-1)
    T = jnp.where(commit, U, T)
    nc = nc + commit.astype(nc.dtype)

    def shift(x, pad):
        shifted = jnp.concatenate([x[1:], jnp.full_like(x[:1], pad)], axis=0)
        return jnp.where(popm[None, :], shifted, x)

    win = (shift(d, jnp.inf), shift(a, 0.0), shift(r, 0.0), shift(g, 0.0),
           shift(b, 0.0))
    fill = fill - popm.astype(fill.dtype)
    if serr is None:
        return win, fill, T, C, nc, done
    return win, fill, T, C, nc, done, serr


def _kbuffer_insert(win, fill, v, d_new, a_new, rgb_new):
    """Insert (d_new, a_new, rgb_new) at the sorted position where ``v``."""
    d, a, r, g, b = win
    K = d.shape[0]
    pos = jnp.sum(d <= d_new[None, :], axis=0)  # empty slots are +inf
    ik = jnp.arange(K, dtype=pos.dtype)[:, None]

    def ins(x, new):
        shifted = jnp.concatenate([x[:1], x[:-1]], axis=0)
        out = jnp.where(
            ik < pos[None, :],
            x,
            jnp.where(ik == pos[None, :], new[None, :], shifted),
        )
        return jnp.where(v[None, :], out, x)

    win = (
        ins(d, d_new), ins(a, a_new),
        ins(r, rgb_new[:, 0]), ins(g, rgb_new[:, 1]), ins(b, rgb_new[:, 2]),
    )
    fill = fill + v.astype(fill.dtype)
    return win, fill


def pair_stream_keys(prep, pix_tile, sort_order, campos, inverse_vp, w, h):
    """Per-(Gaussian, pixel) stream sort key [P, N] for the pixel's tile."""
    if sort_order in (GlobalSortOrder.Z_DEPTH, GlobalSortOrder.DISTANCE):
        return jnp.broadcast_to(
            prep.depth[:, None], (prep.depth.shape[0], pix_tile.shape[0])
        )
    tx = pix_tile[None, :, 0]
    ty = pix_tile[None, :, 1]
    if sort_order == GlobalSortOrder.PTD_CENTER:
        target = jnp.stack(
            [
                tx.astype(jnp.float32) * TILE_X + (TILE_X - 1) / 2.0,
                ty.astype(jnp.float32) * TILE_Y + (TILE_Y - 1) / 2.0,
            ],
            axis=-1,
        )  # [1, N, 2]
        target = jnp.broadcast_to(
            target, (prep.depth.shape[0],) + target.shape[1:]
        )
    else:  # PTD_MAX
        tile_min, tile_max = tile_rect_bounds(tx, ty)
        _, target = max_contrib_power_rect(
            prep.conic_opacity[:, None, :], prep.mean2d[:, None, :],
            tile_min, tile_max,
        )  # [P, N, 2]
    return per_tile_depth(
        target, prep.cov3d_inv9[:, None, :], campos, w, h, inverse_vp
    )


@partial(
    jax.jit,
    static_argnames=("width", "height", "sort_order", "tile_based_culling"),
)
def render_global_order_naive(
    prep: PreprocessOutput,
    bg: jnp.ndarray,
    width: int,
    height: int,
    campos: jnp.ndarray,
    inverse_vp: jnp.ndarray,
    sort_order: GlobalSortOrder = GlobalSortOrder.PTD_CENTER,
    tile_based_culling: bool = False,
):
    """GLOBAL sort-mode oracle under any stream order, per-tile keys
    included (PTD_CENTER / PTD_MAX): every pixel blends its tile's pairs in
    ascending per-tile stream key with no resort window — the semantics of
    the tiled GLOBAL pipeline with those orders. Dense [P, N]; small scenes.

    Returns (color [3, H, W], final_T [N], n_contrib [N]).
    """
    N = width * height
    pix = _pixel_grid(width, height)
    pix_tile = jnp.stack(
        [
            (pix[:, 0] // TILE_X).astype(jnp.int32),
            (pix[:, 1] // TILE_Y).astype(jnp.int32),
        ],
        axis=-1,
    )
    alpha, skip = _alpha(prep.conic_opacity, prep.mean2d, pix)
    in_rect = (
        (pix_tile[None, :, 0] >= prep.rect_min[:, None, 0])
        & (pix_tile[None, :, 0] < prep.rect_max[:, None, 0])
        & (pix_tile[None, :, 1] >= prep.rect_min[:, None, 1])
        & (pix_tile[None, :, 1] < prep.rect_max[:, None, 1])
    )
    stream_valid = in_rect & prep.valid[:, None]
    if tile_based_culling:
        tile_min, tile_max = tile_rect_bounds(
            pix_tile[None, :, 0], pix_tile[None, :, 1]
        )
        power, _ = max_contrib_power_rect(
            prep.conic_opacity[:, None, :], prep.mean2d[:, None, :],
            tile_min, tile_max,
        )
        stream_valid = stream_valid & (
            power <= prep.opacity_power_threshold[:, None]
        )
    alpha_eff = jnp.where(skip | ~stream_valid, 0.0, alpha)

    stream_key = pair_stream_keys(
        prep, pix_tile, sort_order, campos, inverse_vp, width, height
    )
    stream_key = jnp.where(stream_valid, stream_key, jnp.inf)
    order = jnp.argsort(stream_key, axis=0, stable=True)
    alpha_sorted = jnp.take_along_axis(alpha_eff, order, axis=0)
    rgb_sorted = prep.rgb[order]  # [P, N, 3]

    T0 = jnp.ones((N,), jnp.float32)
    C0 = jnp.zeros((N, 3), jnp.float32)
    idx0 = jnp.zeros((N,), jnp.int32)
    T, C, idx = blend_prefix(alpha_sorted, rgb_sorted, T0, C0, idx0,
                             jnp.int32(1))
    return _finalize(C, T, bg, width, height), T, idx


@partial(
    jax.jit,
    static_argnames=("width", "height", "k", "sort_order",
                     "tile_based_culling", "sort_error"),
)
def render_kbuffer_naive(
    prep: PreprocessOutput,
    bg: jnp.ndarray,
    width: int,
    height: int,
    campos: jnp.ndarray,
    inverse_vp: jnp.ndarray,
    k: int = 4,
    sort_order: GlobalSortOrder = GlobalSortOrder.Z_DEPTH,
    tile_based_culling: bool = False,
    sort_error: bool = False,
):
    """PER_PIXEL_KBUFFER oracle. Returns (color [3,H,W], final_T, n_contrib);
    with ``sort_error=True`` additionally (err_opacity [H,W],
    err_distance [H,W]) — the reference's out-of-order blending measure
    accumulated in this mode's actual pop order."""
    P = prep.mean2d.shape[0]
    N = width * height
    pix = _pixel_grid(width, height)
    pix_tile = jnp.stack(
        [
            (pix[:, 0] // TILE_X).astype(jnp.int32),
            (pix[:, 1] // TILE_Y).astype(jnp.int32),
        ],
        axis=-1,
    )

    viewdir = compute_view_ray(pix, width, height, inverse_vp, campos)  # [N,3]
    ray_depth = depth_along_ray(
        prep.cov3d_inv9[:, None, :], viewdir[None, :, :]
    )  # [P, N]

    alpha, skip = _alpha(prep.conic_opacity, prep.mean2d, pix)
    in_rect = (
        (pix_tile[None, :, 0] >= prep.rect_min[:, None, 0])
        & (pix_tile[None, :, 0] < prep.rect_max[:, None, 0])
        & (pix_tile[None, :, 1] >= prep.rect_min[:, None, 1])
        & (pix_tile[None, :, 1] < prep.rect_max[:, None, 1])
    )
    alpha_eff = jnp.where(
        skip | ~in_rect | ~prep.valid[:, None] | (ray_depth < 0.0), 0.0, alpha
    )
    if tile_based_culling:
        tile_min, tile_max = tile_rect_bounds(
            pix_tile[None, :, 0], pix_tile[None, :, 1]
        )
        power, _ = max_contrib_power_rect(
            prep.conic_opacity[:, None, :], prep.mean2d[:, None, :],
            tile_min, tile_max,
        )
        alpha_eff = jnp.where(
            power > prep.opacity_power_threshold[:, None], 0.0, alpha_eff
        )

    stream_key = pair_stream_keys(
        prep, pix_tile, sort_order, campos, inverse_vp, width, height
    )
    stream_key = jnp.where(alpha_eff > 0.0, stream_key, jnp.inf)
    order = jnp.argsort(stream_key, axis=0, stable=True)  # [P, N]
    alpha_s = jnp.take_along_axis(alpha_eff, order, axis=0)
    depth_s = jnp.take_along_axis(ray_depth, order, axis=0)
    rgb_s = prep.rgb[order]  # [P, N, 3]

    win0 = (
        jnp.full((k, N), jnp.inf), jnp.zeros((k, N)),
        jnp.zeros((k, N)), jnp.zeros((k, N)), jnp.zeros((k, N)),
    )
    state0 = (
        win0,
        jnp.zeros((N,), jnp.int32),      # fill
        jnp.ones((N,), jnp.float32),     # T
        jnp.zeros((N, 3), jnp.float32),  # C
        jnp.zeros((N,), jnp.int32),      # n_contrib
        jnp.zeros((N,), bool),           # done latch
        _init_sort_error(N),             # (dmax, err_op, err_dist)
    )

    def step(state, inputs):
        a_i, d_i, rgb_i = inputs
        win, fill, T, C, nc, done, serr = state
        v = a_i > 0.0
        popm = (fill == k) & v
        win, fill, T, C, nc, done, serr = _kbuffer_pop(
            win, fill, T, C, nc, done, popm, serr
        )
        win, fill = _kbuffer_insert(win, fill, v, d_i, a_i, rgb_i)
        return (win, fill, T, C, nc, done, serr), None

    state, _ = jax.lax.scan(step, state0, (alpha_s, depth_s, rgb_s))

    def drain(state, _):
        win, fill, T, C, nc, done, serr = state
        popm = fill > 0
        win, fill, T, C, nc, done, serr = _kbuffer_pop(
            win, fill, T, C, nc, done, popm, serr
        )
        return (win, fill, T, C, nc, done, serr), None

    state, _ = jax.lax.scan(drain, state, None, length=k)
    _, _, T, C, nc, _, (_, eop, edist) = state
    out = (_finalize(C, T, bg, width, height), T, nc)
    if sort_error:
        out = out + (eop.reshape(height, width),
                     edist.reshape(height, width))
    return out


# ---------------------------------------------------------------------------
# HIERARCHICAL oracle
# ---------------------------------------------------------------------------
#
# TPU re-architecture of the paper's hierarchical resorting renderer
# (hierarchical_render.cuh:207-1035). The reference pumps Gaussians through a
# 3-level queue hierarchy — a 64-slot "tail" per 4x4-pixel sub-tile, an
# M-slot "mid" per 2x2 quad, an H-slot per-pixel "head" — re-evaluating the
# max-contribution depth at finer ray granularity at each level (sub-tile
# center -> quad center -> exact pixel ray), so most sorting work is shared
# by groups of nearby rays.
#
# Our schedule replaces the CUDA batch/merge cadence (32-entry batcher sort,
# shfl distribution) with an element-at-a-time cascade that keeps identical
# queue semantics: each level is a sorted window; when a full window receives
# an entry it pops its *front* (nearest) entry down to the next level; the
# head pop is the blend. Window content is group-uniform by construction
# (tail state is identical for all 16 pixels of a sub-tile, mid for the 4
# pixels of a quad), which is what makes the [K, pixels] vectorization of the
# Pallas kernel exact. Queue sizes map 1:1 to the reference's
# SortQueueSizes (tile_4x4, tile_2x2, per_pixel; rasterizer.h:43-48).
#
# Culling parity: tile-based culling gates the stream (as in duplication);
# hierarchical 4x4 culling (stopthepop_common.cuh CULL_ALPHA) drops entries
# whose max contribution over the sub-tile rect is below the opacity
# threshold; entries with negative sub-tile-center depth are dropped at tail
# entry; per-pixel alpha masking happens at blend time (entries ride through
# the hierarchy with alpha 0 for pixels they do not touch).


def _hwin_front(win):
    return {f: v[0] for f, v in win.items()}


def _hwin_shift(win, m):
    def shift(x, pad):
        shifted = jnp.concatenate([x[1:], jnp.full_like(x[:1], pad)], axis=0)
        return jnp.where(m[None, :], shifted, x)

    return {f: shift(v, jnp.inf if f == "key" else 0.0) for f, v in win.items()}


def _hwin_insert(win, v, new):
    K = win["key"].shape[0]
    pos = jnp.sum(win["key"] <= new["key"][None, :], axis=0)
    ik = jnp.arange(K, dtype=pos.dtype)[:, None]

    def ins(x, nv):
        shifted = jnp.concatenate([x[:1], x[:-1]], axis=0)
        out = jnp.where(
            ik < pos[None, :],
            x,
            jnp.where(ik == pos[None, :], nv[None, :], shifted),
        )
        return jnp.where(v[None, :], out, x)

    return {f: ins(win[f], new[f]) for f in win}


def _blend_one(T, C, nc, done, popm, a0, r0, g0, b0):
    """Blend one popped entry where ``popm`` (same math as _kbuffer_pop)."""
    U = T * (1.0 - a0)
    commit = popm & ~done & (U >= T_THRESHOLD)
    done = done | (popm & (U < T_THRESHOLD))
    w = jnp.where(commit, a0 * T, 0.0)
    C = C + w[:, None] * jnp.stack([r0, g0, b0], axis=-1)
    T = jnp.where(commit, U, T)
    nc = nc + (commit & (a0 > 0.0)).astype(nc.dtype)
    return T, C, nc, done


def subtile_center(pix):
    """Center pixel coordinate of the 4x4 sub-tile containing each pixel."""
    return jnp.floor(pix / 4.0) * 4.0 + 1.5


def quad_center(pix):
    """Center pixel coordinate of the 2x2 quad containing each pixel."""
    return jnp.floor(pix / 2.0) * 2.0 + 0.5


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "queue_sizes", "sort_order", "tile_based_culling",
        "hier_4x4_culling", "batched_cascade", "sort_error",
    ),
)
def render_hierarchical_naive(
    prep: PreprocessOutput,
    bg: jnp.ndarray,
    width: int,
    height: int,
    campos: jnp.ndarray,
    inverse_vp: jnp.ndarray,
    queue_sizes=(64, 8, 4),
    sort_order: GlobalSortOrder = GlobalSortOrder.Z_DEPTH,
    tile_based_culling: bool = False,
    hier_4x4_culling: bool = False,
    batched_cascade: bool = False,
    sort_error: bool = False,
):
    """HIERARCHICAL oracle. Returns (color [3,H,W], final_T, n_contrib);
    ``sort_error=True`` (per-entry cascade only) appends the reference's
    (err_opacity, err_distance) [H,W] maps accumulated in head-pop order.

    ``batched_cascade`` mirrors the kernel's batched mid/head cadence
    (hier_blend._win_round): entries move through mid and head in sorted
    sub-batches of CASC_BATCH with ghost flow-through, instead of one
    pop-then-insert step per entry. Same emission multisets per window;
    locally sorted emission order.
    """
    kt, km, kh = queue_sizes
    P = prep.mean2d.shape[0]
    N = width * height
    pix = _pixel_grid(width, height)
    pix_tile = jnp.stack(
        [
            (pix[:, 0] // TILE_X).astype(jnp.int32),
            (pix[:, 1] // TILE_Y).astype(jnp.int32),
        ],
        axis=-1,
    )

    def ray_depth(target_pix):
        vd = compute_view_ray(target_pix, width, height, inverse_vp, campos)
        return depth_along_ray(prep.cov3d_inv9[:, None, :], vd[None, :, :])

    d_head = ray_depth(pix)                   # [P, N]
    d_mid = ray_depth(quad_center(pix))
    d_tail = ray_depth(subtile_center(pix))

    alpha, skip = _alpha(prep.conic_opacity, prep.mean2d, pix)
    in_rect = (
        (pix_tile[None, :, 0] >= prep.rect_min[:, None, 0])
        & (pix_tile[None, :, 0] < prep.rect_max[:, None, 0])
        & (pix_tile[None, :, 1] >= prep.rect_min[:, None, 1])
        & (pix_tile[None, :, 1] < prep.rect_max[:, None, 1])
    )
    stream_valid = in_rect & prep.valid[:, None]
    if tile_based_culling:
        tile_min, tile_max = tile_rect_bounds(
            pix_tile[None, :, 0], pix_tile[None, :, 1]
        )
        power, _ = max_contrib_power_rect(
            prep.conic_opacity[:, None, :], prep.mean2d[:, None, :],
            tile_min, tile_max,
        )
        stream_valid = stream_valid & (
            power <= prep.opacity_power_threshold[:, None]
        )
    # Per-pixel blend alpha (0 = ride through without contributing).
    a_eff = jnp.where(skip | ~stream_valid | (d_head < 0.0), 0.0, alpha)
    # Tail-entry validity (sub-tile uniform).
    v_tail = stream_valid & (d_tail >= 0.0)
    if hier_4x4_culling:
        st_min = jnp.floor(pix / 4.0) * 4.0  # [N, 2]
        st_max = st_min + 3.0
        power4, _ = max_contrib_power_rect(
            prep.conic_opacity[:, None, :], prep.mean2d[:, None, :],
            st_min[None], st_max[None], patch_w=3, patch_h=3,
        )
        v_tail = v_tail & (power4 <= prep.opacity_power_threshold[:, None])

    stream_key = pair_stream_keys(
        prep, pix_tile, sort_order, campos, inverse_vp, width, height
    )
    stream_key = jnp.where(stream_valid, stream_key, jnp.inf)
    order = jnp.argsort(stream_key, axis=0, stable=True)

    def sort_by(x):
        return jnp.take_along_axis(x, order, axis=0)

    a_s = sort_by(a_eff)
    dt_s = sort_by(d_tail)
    dm_s = sort_by(d_mid)
    dh_s = sort_by(d_head)
    vt_s = jnp.take_along_axis(v_tail, order, axis=0)
    rgb_s = prep.rgb[order]  # [P, N, 3]

    def empty_win(k, fields):
        w = {"key": jnp.full((k, N), jnp.inf)}
        w.update({f: jnp.zeros((k, N)) for f in fields})
        return w

    mid0 = empty_win(km, ("dh", "a", "r", "g", "b"))
    head0 = empty_win(kh, ("a", "r", "g", "b"))

    def push_head(mid, head, fh, T, C, nc, done, pop_m, serr=None):
        e_m = _hwin_front(mid)
        pop_h = pop_m & (fh == kh)
        e_h = _hwin_front(head)
        commit = pop_h & ~done & (T * (1.0 - e_h["a"]) >= T_THRESHOLD)
        serr = _accum_sort_error(serr, commit, e_h["a"], e_h["key"])
        T, C, nc, done = _blend_one(
            T, C, nc, done, pop_h, e_h["a"], e_h["r"], e_h["g"], e_h["b"]
        )
        head = _hwin_shift(head, pop_h)
        fh = fh - pop_h.astype(fh.dtype)
        head = _hwin_insert(
            head, pop_m,
            {"key": e_m["dh"], "a": e_m["a"], "r": e_m["r"], "g": e_m["g"],
             "b": e_m["b"]},
        )
        fh = fh + pop_m.astype(fh.dtype)
        if serr is None:
            return head, fh, T, C, nc, done
        return head, fh, T, C, nc, done, serr

    # --- Batched tail (matches the Pallas kernel's sort+merge tail) ------
    #
    # The tail consumes the stream in sorted batches of TAIL_BATCH: per
    # batch, sort(hold ++ incoming) by the sub-tile key and EMIT the first
    # TAIL_BATCH rows (nearest) into the mid/head cascade, HOLDing the
    # farthest kt. Invalid incoming carry a -inf key ("ghosts") and the
    # initial hold is -inf "bubbles": both sort to the emission's front and
    # are masked at mid entry, which makes the emit/hold split a static
    # slice while preserving exact window-of-kt semantics (the emitted
    # real count is max(reals - kt, 0)). This is the reference's own batch
    # cadence (batcherSort + merge, hierarchical_render.cuh:158-192) rather
    # than an entry-at-a-time sliding window.
    B = TAIL_BATCH
    Pp = a_s.shape[0]
    pad = (-Pp) % B

    def padB(x, fill=0.0):
        if not pad:
            return x
        cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    key_s = jnp.where(vt_s, dt_s, -jnp.inf)
    fields = {
        "key": padB(key_s, -jnp.inf), "dm": padB(dm_s), "dh": padB(dh_s),
        "a": padB(a_s), "r": padB(rgb_s[..., 0]), "g": padB(rgb_s[..., 1]),
        "b": padB(rgb_s[..., 2]),
    }
    n_batches = (Pp + pad) // B
    batched = {f: v.reshape(n_batches, B, N) for f, v in fields.items()}

    hold0 = {"key": jnp.full((kt, N), -jnp.inf)}
    hold0.update({f: jnp.zeros((kt, N)) for f in ("dm", "dh", "a", "r", "g",
                                                  "b")})

    if batched_cascade:
        if sort_error:
            raise NotImplementedError(
                "sort_error maps: per-entry cascade only (batched cascade "
                "is parked — see verify_batched_cascade.py)"
            )
        from ..kernels.hier_blend import CASC_BATCH as Bc

        mid0b = {"key": jnp.full((km, N), -jnp.inf)}
        mid0b.update({f: jnp.zeros((km, N)) for f in ("dh", "a", "r", "g",
                                                      "b")})
        head0b = {"key": jnp.full((kh, N), -jnp.inf)}
        head0b.update({f: jnp.zeros((kh, N)) for f in ("a", "r", "g", "b")})
        ptrue = jnp.ones((N,), bool)

        def win_round_b(hold, batch):
            cat = {f: jnp.concatenate([hold[f], batch[f]], axis=0)
                   for f in hold}
            o = jnp.argsort(cat["key"], axis=0, stable=True)
            srt = {f: jnp.take_along_axis(cat[f], o, axis=0) for f in cat}
            nb = batch["key"].shape[0]
            return ({f: v[:nb] for f, v in srt.items()},
                    {f: v[nb:] for f, v in srt.items()})

        def mid_round_blend(carry, mbatch):
            mid, head, T, C, nc, done = carry
            emit_m, mid = win_round_b(mid, mbatch)
            key_h = jnp.where(
                jnp.isfinite(emit_m["key"]), emit_m["dh"], emit_m["key"]
            )
            emit_h, head = win_round_b(
                head,
                {"key": key_h, "a": emit_m["a"], "r": emit_m["r"],
                 "g": emit_m["g"], "b": emit_m["b"]},
            )

            def bl(c, row):
                T, C, nc, done = c
                return _blend_one(
                    T, C, nc, done, ptrue, row["a"], row["r"], row["g"],
                    row["b"],
                ), None

            (T, C, nc, done), _ = jax.lax.scan(
                bl, (T, C, nc, done), emit_h
            )
            return mid, head, T, C, nc, done

        def tail_batch_b(state, batch):
            hold, mid, head, T, C, nc, done = state
            cat = {f: jnp.concatenate([hold[f], batch[f]], axis=0)
                   for f in hold}
            o = jnp.argsort(cat["key"], axis=0, stable=True)
            srt = {f: jnp.take_along_axis(cat[f], o, axis=0) for f in cat}
            emit = {f: v[:B] for f, v in srt.items()}
            hold = {f: v[B:] for f, v in srt.items()}
            v = jnp.isfinite(emit["key"])
            key_m = jnp.where(v, emit["dm"], -jnp.inf)
            a_z = jnp.where(v, emit["a"], 0.0)
            carry = (mid, head, T, C, nc, done)
            for sb in range(B // Bc):
                sl = slice(sb * Bc, (sb + 1) * Bc)
                carry = mid_round_blend(
                    carry,
                    {"key": key_m[sl], "dh": emit["dh"][sl], "a": a_z[sl],
                     "r": emit["r"][sl], "g": emit["g"][sl],
                     "b": emit["b"][sl]},
                )
            mid, head, T, C, nc, done = carry
            return (hold, mid, head, T, C, nc, done), None

        state = (
            hold0, mid0b, head0b,
            jnp.ones((N,), jnp.float32), jnp.zeros((N, 3), jnp.float32),
            jnp.zeros((N,), jnp.int32), jnp.zeros((N,), bool),
        )
        state, _ = jax.lax.scan(tail_batch_b, state, batched)

        drain_in = {"key": jnp.full((B, N), jnp.inf)}
        drain_in.update({f: jnp.zeros((B, N)) for f in ("dm", "dh", "a",
                                                        "r", "g", "b")})
        for _ in range(-(-kt // B)):
            state, _ = tail_batch_b(state, drain_in)
        _, mid, head, T, C, nc, done = state

        drain_m = {"key": jnp.full((Bc, N), jnp.inf)}
        drain_m.update({f: jnp.zeros((Bc, N)) for f in ("dh", "a", "r",
                                                        "g", "b")})
        carry = (mid, head, T, C, nc, done)
        for _ in range(-(-km // Bc)):
            carry = mid_round_blend(carry, drain_m)
        mid, head, T, C, nc, done = carry

        def bl_hold(c, row):
            T, C, nc, done = c
            return _blend_one(
                T, C, nc, done, ptrue, row["a"], row["r"], row["g"],
                row["b"],
            ), None

        (T, C, nc, done), _ = jax.lax.scan(
            bl_hold, (T, C, nc, done),
            {f: head[f] for f in ("a", "r", "g", "b")},
        )
        return _finalize(C, T, bg, width, height), T, nc

    def cascade_entry(carry, e):
        mid, head, fm, fh, T, C, nc, done, serr = carry
        v = jnp.isfinite(e["key"])
        pop_m = v & (fm == km)
        head, fh, T, C, nc, done, serr = push_head(
            mid, head, fh, T, C, nc, done, pop_m, serr
        )
        mid = _hwin_shift(mid, pop_m)
        fm = fm - pop_m.astype(fm.dtype)
        mid = _hwin_insert(
            mid, v,
            {"key": e["dm"], "dh": e["dh"], "a": e["a"], "r": e["r"],
             "g": e["g"], "b": e["b"]},
        )
        fm = fm + v.astype(fm.dtype)
        return (mid, head, fm, fh, T, C, nc, done, serr), None

    def tail_batch(state, batch):
        hold, mid, head, fm, fh, T, C, nc, done, serr = state
        cat = {f: jnp.concatenate([hold[f], batch[f]], axis=0)
               for f in hold}
        order = jnp.argsort(cat["key"], axis=0, stable=True)
        srt = {f: jnp.take_along_axis(cat[f], order, axis=0) for f in cat}
        emit = {f: v[:B] for f, v in srt.items()}
        hold = {f: v[B:] for f, v in srt.items()}
        (mid, head, fm, fh, T, C, nc, done, serr), _ = jax.lax.scan(
            cascade_entry, (mid, head, fm, fh, T, C, nc, done, serr), emit
        )
        return (hold, mid, head, fm, fh, T, C, nc, done, serr), None

    zi = jnp.zeros((N,), jnp.int32)
    state = (
        hold0, mid0, head0, zi, zi,
        jnp.ones((N,), jnp.float32), jnp.zeros((N, 3), jnp.float32),
        zi, jnp.zeros((N,), bool), _init_sort_error(N),
    )
    state, _ = jax.lax.scan(tail_batch, state, batched)

    # Tail drain: +inf incoming pads push every held real entry out.
    drain_in = {"key": jnp.full((B, N), jnp.inf)}
    drain_in.update({f: jnp.zeros((B, N)) for f in ("dm", "dh", "a", "r",
                                                    "g", "b")})
    for _ in range(-(-kt // B)):
        state, _ = tail_batch(
            state, drain_in
        )
    _, mid, head, fm, fh, T, C, nc, done, serr = state

    def drain_mid(state, _):
        mid, head, fm, fh, T, C, nc, done, serr = state
        pop_m = fm > 0
        head, fh, T, C, nc, done, serr = push_head(
            mid, head, fh, T, C, nc, done, pop_m, serr
        )
        mid = _hwin_shift(mid, pop_m)
        fm = fm - pop_m.astype(fm.dtype)
        return (mid, head, fm, fh, T, C, nc, done, serr), None

    state = (mid, head, fm, fh, T, C, nc, done, serr)
    state, _ = jax.lax.scan(drain_mid, state, None, length=km)

    def drain_head(state, _):
        mid, head, fm, fh, T, C, nc, done, serr = state
        pop_h = fh > 0
        e_h = _hwin_front(head)
        commit = pop_h & ~done & (T * (1.0 - e_h["a"]) >= T_THRESHOLD)
        serr = _accum_sort_error(serr, commit, e_h["a"], e_h["key"])
        T, C, nc, done = _blend_one(
            T, C, nc, done, pop_h, e_h["a"], e_h["r"], e_h["g"], e_h["b"]
        )
        head = _hwin_shift(head, pop_h)
        fh = fh - pop_h.astype(fh.dtype)
        return (mid, head, fm, fh, T, C, nc, done, serr), None

    state, _ = jax.lax.scan(drain_head, state, None, length=kh)
    _, _, _, _, T, C, nc, _, (_, eop, edist) = state
    out = (_finalize(C, T, bg, width, height), T, nc)
    if sort_error:
        out = out + (eop.reshape(height, width),
                     edist.reshape(height, width))
    return out
