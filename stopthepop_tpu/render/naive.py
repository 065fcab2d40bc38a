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
from ..constants import ALPHA_MAX, ALPHA_THRESHOLD, T_THRESHOLD, TILE_X, TILE_Y
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
    scenes only. Returns (color [3, H, W], final_T, n_contrib).
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
    rgb_sorted = prep.rgb[order]  # [P, N, 3]

    T0 = jnp.ones((N,), jnp.float32)
    C0 = jnp.zeros((N, 3), jnp.float32)
    idx0 = jnp.zeros((N,), jnp.int32)
    T, C, idx = blend_prefix(
        alpha_sorted, rgb_sorted, T0, C0, idx0, jnp.int32(1)
    )
    return _finalize(C, T, bg, width, height), T, idx


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


def _kbuffer_pop(win, fill, T, C, nc, done, popm):
    """Pop the front window entry and blend it where ``popm``.

    win = (d, a, r, g, b) arrays [K, N]; scalars [N]. Returns updated state.
    """
    d, a, r, g, b = win
    a0, r0, g0, b0 = a[0], r[0], g[0], b[0]
    U = T * (1.0 - a0)
    commit = popm & ~done & (U >= T_THRESHOLD)
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
    return win, fill, T, C, nc, done


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
    static_argnames=("width", "height", "k", "sort_order", "tile_based_culling"),
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
):
    """PER_PIXEL_KBUFFER oracle. Returns (color [3,H,W], final_T, n_contrib)."""
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
    )

    def step(state, inputs):
        a_i, d_i, rgb_i = inputs
        win, fill, T, C, nc, done = state
        v = a_i > 0.0
        popm = (fill == k) & v
        win, fill, T, C, nc, done = _kbuffer_pop(
            win, fill, T, C, nc, done, popm
        )
        win, fill = _kbuffer_insert(win, fill, v, d_i, a_i, rgb_i)
        return (win, fill, T, C, nc, done), None

    state, _ = jax.lax.scan(step, state0, (alpha_s, depth_s, rgb_s))

    def drain(state, _):
        win, fill, T, C, nc, done = state
        popm = fill > 0
        win, fill, T, C, nc, done = _kbuffer_pop(
            win, fill, T, C, nc, done, popm
        )
        return (win, fill, T, C, nc, done), None

    state, _ = jax.lax.scan(drain, state, None, length=k)
    _, _, T, C, nc, _ = state
    return _finalize(C, T, bg, width, height), T, nc
