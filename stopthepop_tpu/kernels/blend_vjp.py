"""Differentiable blend op: custom VJP pairing the Pallas fwd/bwd kernels.

The custom-VJP seam sits exactly where the reference splits its hand-written
backward (SURVEY.md §3.2): blend-level gradients w.r.t. {mean2D, conic,
opacity, color} are produced by the backward kernel; everything upstream
(gather -> preprocess) is plain jnp and differentiates automatically, which
replaces the reference's entire preprocess backward (backward.cu:146-434).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .global_blend import blend_global_backward, blend_global_forward


def _int_zero_tangent(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


@functools.lru_cache(maxsize=None)
def make_blend_global(grid_x: int, grid_y: int, chunk: int, interpret: bool,
                      tile_x: int = 16, tile_y: int = 16):
    """Build (and cache) the differentiable blend for one static config."""

    @jax.custom_vjp
    def blend(payload, starts, counts):
        return blend_global_forward(
            payload, starts, counts,
            grid_x=grid_x, grid_y=grid_y, chunk=chunk, tile_x=tile_x,
            tile_y=tile_y, interpret=interpret,
        )

    def blend_fwd(payload, starts, counts):
        packed = blend(payload, starts, counts)
        return packed, (payload, starts, counts, packed)

    def blend_bwd(res, g_packed):
        payload, starts, counts, packed = res
        # The saved forward output supplies the per-pixel totals (raw
        # committed color and final transmittance) the backward replay
        # needs, so the kernel makes a single pass. Background compositing
        # (and hence d_bg) lives outside the kernel entirely.
        dpay = blend_global_backward(
            payload, g_packed, packed, starts, counts,
            grid_x=grid_x, grid_y=grid_y, chunk=chunk, tile_x=tile_x,
            tile_y=tile_y, interpret=interpret,
        )
        # Columns past the last aligned segment are never written by the
        # kernel (uninitialized) — zero them before they reach the gather VJP.
        aligned = ((counts + chunk - 1) // chunk) * chunk
        total_aligned = jnp.sum(aligned)
        col = jnp.arange(dpay.shape[1], dtype=jnp.int32)
        dpay = jnp.where(col[None, :] < total_aligned, dpay, 0.0)
        return (
            dpay,
            _int_zero_tangent(starts),
            _int_zero_tangent(counts),
        )

    blend.defvjp(blend_fwd, blend_bwd)
    return blend


def make_blend_kbuffer(grid_x: int, grid_y: int, k: int, width: int,
                       height: int, chunk: int, seg_cap: int,
                       interpret: bool, group: int = None,
                       group_bwd: int = None, route_precision=None,
                       tile2x: bool = False):
    """Differentiable k-buffer blend for one static config.

    Env-dependent knobs (lane-width groups, routing precision) are resolved
    HERE, outside the lru cache, so a changed env var is honored on the
    next trace instead of freezing at the first call (round-4 advice); the
    cached inner factory takes only explicit values.
    """
    from .tuning import resolve_kb_groups, resolve_route_precision

    g_env, gb_env = resolve_kb_groups(interpret)
    if group is None:
        group = g_env
    if group_bwd is None:
        group_bwd = gb_env
    if route_precision is None:
        route_precision = resolve_route_precision()
    return _make_blend_kbuffer(grid_x, grid_y, k, width, height, chunk,
                               seg_cap, interpret, group, group_bwd,
                               route_precision, tile2x)


@functools.lru_cache(maxsize=None)
def _make_blend_kbuffer(grid_x: int, grid_y: int, k: int, width: int,
                        height: int, chunk: int, seg_cap: int,
                        interpret: bool, group: int, group_bwd: int,
                        route_precision, tile2x: bool = False):
    """Cached inner factory (all-explicit args).

    Gradients flow to the payload's blendable rows (xy, conic, opacity, rgb)
    and to bg; the inverse-covariance rows get zero gradient (per-ray depth
    only permutes the blend order — discrete, like the reference which also
    emits no depth gradients), and so does the camera vector.
    """
    from .kbuffer_blend import blend_kbuffer_backward, blend_kbuffer_forward

    @jax.custom_vjp
    def blend(payload, starts, counts, bg, cam):
        return blend_kbuffer_forward(
            payload, starts, counts, bg, cam,
            grid_x=grid_x, grid_y=grid_y, k=k, width=width, height=height,
            chunk=chunk, group=group, interpret=interpret,
        )

    def blend_fwd(payload, starts, counts, bg, cam):
        packed = blend(payload, starts, counts, bg, cam)
        return packed, (payload, starts, counts, bg, cam, packed)

    def blend_bwd(res, g_packed):
        payload, starts, counts, bg, cam, packed = res
        dpay = blend_kbuffer_backward(
            payload, packed, g_packed, starts, counts, bg, cam,
            grid_x=grid_x, grid_y=grid_y, k=k, width=width, height=height,
            chunk=chunk, seg_cap=seg_cap, group=group_bwd,
            route_precision=route_precision, grad_row_split=tile2x,
            interpret=interpret,
        )
        dpay = _zero_unwritten(dpay, counts, chunk, tile2x=tile2x)
        d_bg = jnp.einsum("tcp,tp->c", g_packed[:, 0:3, :], packed[:, 3, :])
        return (
            dpay,
            _int_zero_tangent(starts),
            _int_zero_tangent(counts),
            d_bg,
            jnp.zeros_like(res[4]),
        )

    blend.defvjp(blend_fwd, blend_bwd)
    return blend


def _zero_unwritten(dpay, counts, chunk, tile2x: bool = False):
    """Zero payload-gradient entries the backward kernel never writes.

    The kernels write every column inside the aligned segment span
    [0, sum(aligned counts)) — gradient rows 0..8, zeros in rows 9..15,
    and (since round 3) explicit zero DMAs over the truncated tails of
    over-seg_cap segments — so the only unwritten regions are rows >= 16
    and the unused capacity tail. One broadcast compare instead of the
    old per-column searchsorted (42 ms/step at config 2 — measured).

    ``tile2x`` (32x16 binning): each binning segment was replayed by TWO
    16x16 half-tiles writing disjoint dpay row ranges (grad_row_split) —
    sum them, and halve the aligned total (counts lists each parent
    segment once per half)."""
    aligned = ((counts + chunk - 1) // chunk) * chunk
    total = jnp.sum(aligned)
    if tile2x:
        total = total // 2
        grads = dpay[:9] + dpay[16:25]
    else:
        grads = dpay[:9]
    col = jnp.arange(dpay.shape[1], dtype=jnp.int32)
    grads = jnp.where(col[None, :] < total, grads, 0.0)
    return jnp.concatenate(
        [grads, jnp.zeros((dpay.shape[0] - 9, dpay.shape[1]), dpay.dtype)],
        axis=0,
    )


def make_blend_hier(grid_x: int, grid_y: int, queue_sizes, width: int,
                    height: int, hier_4x4_culling: bool, chunk: int,
                    seg_cap: int, interpret: bool,
                    batched_cascade: bool = False, group: int = None,
                    group_bwd: int = None, route_precision=None,
                    tile2x: bool = False):
    """Differentiable hierarchical blend for one static config.

    Env knobs resolve here, outside the lru cache (see make_blend_kbuffer);
    the on-chip group clamp lives in tuning.resolve_hier_groups.
    """
    from .tuning import resolve_hier_groups, resolve_route_precision

    g_env, gb_env = resolve_hier_groups(interpret)
    if group is None:
        group = g_env
    if group_bwd is None:
        group_bwd = gb_env
    if route_precision is None:
        route_precision = resolve_route_precision()
    return _make_blend_hier(grid_x, grid_y, queue_sizes, width, height,
                            hier_4x4_culling, chunk, seg_cap, interpret,
                            batched_cascade, group, group_bwd,
                            route_precision, tile2x)


@functools.lru_cache(maxsize=None)
def _make_blend_hier(grid_x: int, grid_y: int, queue_sizes, width: int,
                     height: int, hier_4x4_culling: bool, chunk: int,
                     seg_cap: int, interpret: bool, batched_cascade: bool,
                     group: int, group_bwd: int, route_precision,
                     tile2x: bool = False):
    """Cached inner factory (all-explicit args).

    Same gradient surface as the k-buffer blend: payload blendable rows + bg;
    depth keys and camera get zero gradient (discrete resort).
    ``group`` > 1 lane-widens the cascade over count-matched tiles (the
    k-buffer's grouped-tile scheme, hier_blend._fwd_kernel). ``group_bwd``
    sets the backward's group independently (grouping is value-exact, so
    mixing is sound): the forward's VPU cascade is issue-bound and wins from
    lane widening (182 -> 122 ms at G=2, config 2).
    """
    from .hier_blend import blend_hier_backward, blend_hier_forward

    if batched_cascade:
        group = 1
        group_bwd = 1

    @jax.custom_vjp
    def blend(payload, starts, counts, bg, cam):
        return blend_hier_forward(
            payload, starts, counts, bg, cam,
            grid_x=grid_x, grid_y=grid_y, queue_sizes=queue_sizes,
            width=width, height=height, hier_4x4_culling=hier_4x4_culling,
            chunk=chunk, batched_cascade=batched_cascade, group=group,
            interpret=interpret,
        )

    def blend_fwd(payload, starts, counts, bg, cam):
        packed = blend(payload, starts, counts, bg, cam)
        return packed, (payload, starts, counts, bg, cam, packed)

    def blend_bwd(res, g_packed):
        payload, starts, counts, bg, cam, packed = res
        dpay = blend_hier_backward(
            payload, packed, g_packed, starts, counts, bg, cam,
            grid_x=grid_x, grid_y=grid_y, queue_sizes=queue_sizes,
            width=width, height=height, hier_4x4_culling=hier_4x4_culling,
            chunk=chunk, seg_cap=seg_cap,
            batched_cascade=batched_cascade, group=group_bwd,
            route_precision=route_precision, grad_row_split=tile2x,
            interpret=interpret,
        )
        dpay = _zero_unwritten(dpay, counts, chunk, tile2x=tile2x)
        d_bg = jnp.einsum("tcp,tp->c", g_packed[:, 0:3, :], packed[:, 3, :])
        return (
            dpay,
            _int_zero_tangent(starts),
            _int_zero_tangent(counts),
            d_bg,
            jnp.zeros_like(cam),
        )

    blend.defvjp(blend_fwd, blend_bwd)
    return blend
