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


@functools.lru_cache(maxsize=None)
def make_blend_kbuffer(grid_x: int, grid_y: int, k: int, width: int,
                       height: int, chunk: int, seg_cap: int,
                       interpret: bool, group: int = None,
                       group_bwd: int = None):
    """Differentiable k-buffer blend for one static config.

    Gradients flow to the payload's blendable rows (xy, conic, opacity, rgb)
    and to bg; the inverse-covariance rows get zero gradient (per-ray depth
    only permutes the blend order — discrete, like the reference which also
    emits no depth gradients), and so does the camera vector.
    """
    from .kbuffer_blend import blend_kbuffer_backward, blend_kbuffer_forward

    # Tiles blended per grid step (lane axis = group x 256): amortizes the
    # sequential window loop's instruction issue across count-matched tiles.
    # The backward's group is independent (grouping is value-exact): its
    # per-pop moment routing scales WITH the lane width and measured slower
    # grouped (round 4: fwd 33.6 -> 21.4 ms at G=2, bwd 106 -> 139 ms), so
    # it defaults to 1.
    import os

    if group is None:
        group = int(os.environ.get("STP_KB_GROUP", "2"))
    if group_bwd is None:
        group_bwd = int(os.environ.get("STP_KB_GROUP_BWD", "1"))

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
            interpret=interpret,
        )
        dpay = _zero_unwritten(dpay, counts, chunk)
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


def _zero_unwritten(dpay, counts, chunk):
    """Zero payload-gradient entries the backward kernel never writes.

    The kernels write every column inside the aligned segment span
    [0, sum(aligned counts)) — gradient rows 0..8, zeros in rows 9..15,
    and (since round 3) explicit zero DMAs over the truncated tails of
    over-seg_cap segments — so the only unwritten regions are rows >= 16
    and the unused capacity tail. One broadcast compare instead of the
    old per-column searchsorted (42 ms/step at config 2 — measured)."""
    aligned = ((counts + chunk - 1) // chunk) * chunk
    total = jnp.sum(aligned)
    col = jnp.arange(dpay.shape[1], dtype=jnp.int32)
    grads = jnp.where(col[None, :] < total, dpay[:9], 0.0)
    return jnp.concatenate(
        [grads, jnp.zeros((dpay.shape[0] - 9, dpay.shape[1]), dpay.dtype)],
        axis=0,
    )


@functools.lru_cache(maxsize=None)
def make_blend_hier(grid_x: int, grid_y: int, queue_sizes, width: int,
                    height: int, hier_4x4_culling: bool, chunk: int,
                    seg_cap: int, interpret: bool,
                    batched_cascade: bool = False, group: int = None,
                    group_bwd: int = None):
    """Differentiable hierarchical blend for one static config.

    Same gradient surface as the k-buffer blend: payload blendable rows + bg;
    depth keys and camera get zero gradient (discrete resort).
    ``group`` > 1 lane-widens the cascade over count-matched tiles (the
    k-buffer's grouped-tile scheme, hier_blend._fwd_kernel). ``group_bwd``
    sets the backward's group independently (grouping is value-exact, so
    mixing is sound): the forward's VPU cascade is issue-bound and wins from
    lane widening (182 -> 122 ms at G=2, config 2), while the backward's
    per-pop moment routing (one-hot compare + per-tile lane-slice dots)
    scales WITH G and measured slower grouped — default it to 1.
    """
    from .hier_blend import blend_hier_backward, blend_hier_forward

    import os

    if group is None:
        # Clamp at 2 on the chip: G>=4 at 64/8/4 overflows the 16 MB Mosaic
        # scoped-vmem stack on v5e (gate_full r4); interpret has no stack.
        group = int(os.environ.get("STP_HIER_GROUP", "2"))
        if not interpret:
            group = min(2, group)
    if group_bwd is None:
        group_bwd = int(os.environ.get("STP_HIER_GROUP_BWD", "1"))

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
            interpret=interpret,
        )
        dpay = _zero_unwritten(dpay, counts, chunk)
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
