"""Tiled rendering pipeline: preprocess -> duplicate -> sort -> Pallas blend.

This is the production path (the analog of Rasterizer::forward,
rasterizer_impl.cu:221-413) with TPU-native stages:

  stage          reference                         here
  -------------  --------------------------------  ---------------------------
  preprocess     preprocessCUDA (1 thread/gauss)   vectorized jnp (autodiff)
  scan+alloc     CUB InclusiveSum + D2H resize     static capacity + cumsum
  duplicate      duplicateWithKeys[_extended]      searchsorted pair expansion
  sort           CUB DeviceRadixSort (64-bit key)  lax.sort two-key lexicographic
  ranges         identifyTileRanges kernel         searchsorted + 128-aligned
                                                   segment re-layout
  render         renderCUDA et al                  Pallas tile kernels
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax.numpy as jnp

import jax

from ..config import GlobalSortOrder
from ..constants import TILE_X, TILE_Y
from ..kernels.blend_vjp import make_blend_global, make_blend_kbuffer
from ..kernels.global_blend import PAYLOAD_F, unpack_image
from ..kernels.kbuffer_blend import KB_PAYLOAD_F
from .duplicate import (
    AlignedSegments,
    PairBuffer,
    align_segments,
    build_pairs,
    build_pairs_aligned,
    recon_table_columns,
    segment_gather,
)
from .preprocess import PreprocessOutput

# Segments are aligned to the DMA chunk size so the backward kernel's
# full-chunk gradient writes stay within each tile's own segment.
SEGMENT_ALIGN = 256


def _use_recon():
    from ..kernels.tuning import resolve_use_recon

    return resolve_use_recon()


def tile_grid(width: int, height: int, tile_x: int = TILE_X,
              tile_y: int = TILE_Y):
    return (width + tile_x - 1) // tile_x, (height + tile_y - 1) // tile_y


def _payload_gather(table, segs: AlignedSegments, capacity=None,
                    grad_cols=None, carry_bf16=False, recon=None,
                    pack_fwd_span=None):
    """table[gauss_id].T (feature-major), with the carry-sort VJP when the
    fused pair build supplied the sort permutation. ``capacity`` (static)
    bounds the real (non-padding) pre-sort slots for the backward;
    ``grad_cols`` limits it to the leading differentiable columns;
    ``carry_bf16`` opts the backward into bf16-packed cotangent carriers
    (see segment_gather).

    ``recon = (recon_cols [P, 4], s_tile [C], pair_valid [C], grid_x)``
    selects the slot-reconstruction VJP (make_segment_gather_recon): the
    forward sort then carries no slot operand; the recon columns join this
    gather (free: row gathers cost per row) and are sliced off the output.
    """
    if recon is not None:
        from .duplicate import make_segment_gather_recon

        recon_cols, s_tile, pair_valid, grid_x = recon
        table2 = jnp.concatenate(
            [table, jax.lax.stop_gradient(recon_cols)], axis=1
        )
        out = make_segment_gather_recon(
            capacity, grid_x, grad_cols, carry_bf16, pack_fwd_span,
        )(table2, segs.gauss_id, s_tile, pair_valid, segs.gauss_offsets)
        return out[:-4]
    if segs.orig_slot is not None:
        return segment_gather(
            table, segs.gauss_id, segs.orig_slot, segs.gauss_offsets,
            capacity, grad_cols, carry_bf16, pack_fwd_span,
        )
    return table[segs.gauss_id].T


def build_payload(prep: PreprocessOutput, segs: AlignedSegments, chunk: int,
                  capacity: int = None, carry_bf16: bool = False,
                  recon=None, pack_fwd: bool = False,
                  carry_depth: bool = True):
    """Gather the feature-major blend payload [16, C_aligned + chunk].

    A differentiable gather: its VJP scatter-adds payload gradients back to
    the per-Gaussian arrays, which is exactly the role of the reference's
    atomicAdd gradient accumulation (backward.cu:561-592) — but deterministic.
    The trailing ``chunk`` zero columns let the kernel's fixed-size DMA read
    past the final segment.
    """
    ids = segs.gauss_id
    cols = [prep.mean2d, prep.conic_opacity, prep.rgb]
    if carry_depth:
        cols.append(jax.lax.stop_gradient(prep.depth)[:, None])
    table = jnp.concatenate(cols, axis=1)
    # [P, 10] — one wide gather beats ten narrow ones on TPU. With
    # carry_depth=False (nothing downstream reads the Depth accumulator)
    # the depth column is dropped from the gather and its payload row is
    # zero-padded, so the kernels see the same layout (D accumulates 0).
    # Only mean2d/conic/rgb (cols 0..8) carry gradients; depth is
    # stop-gradient and skips the backward reduction. pack_fwd packs cols
    # 2.. into f16-pair carriers across the gather
    # (duplicate.pack_table_f16).
    nf = table.shape[1]
    feats = _payload_gather(table, segs, capacity, 9, carry_bf16,
                            recon, (2, nf) if pack_fwd else None)  # [nf, C]
    feats = jnp.concatenate(
        [feats, jnp.zeros((PAYLOAD_F - nf, ids.shape[0]), jnp.float32)],
        axis=0,
    )
    return jnp.pad(feats, ((0, 0), (0, chunk)))


def render_tiled(
    prep: PreprocessOutput,
    bg: jnp.ndarray,
    *,
    image_width: int,
    image_height: int,
    capacity: int,
    sort_order: GlobalSortOrder = GlobalSortOrder.Z_DEPTH,
    tile_based_culling: bool = False,
    campos=None,
    inverse_vp=None,
    chunk: int = 128,
    carry_bf16: bool = False,
    tile_x: int = TILE_X,
    tile_y: int = TILE_Y,
    pad_capacity=None,
    rank_key: bool = False,
    pack_fwd: bool = False,
    carry_depth: bool = True,
    interpret: bool = False,
):
    """GLOBAL-mode tiled render. Returns (color, final_T, n_contrib, pairs).

    chunk=128 measures fastest end-to-end: the blend's MXU matmuls are at the
    native 128 dim either way, and halving the chunk halves the per-tile
    alignment padding that inflates the sort/gather domains.

    ``tile_x``/``tile_y``: binning tile (16x16 default = reference parity;
    32x16 cuts the pair domain ~35%% — every sort/gather/scan stage scales
    with it — at ~1.3x blend-kernel work; a NET win on TPU at production
    sizes). ``prep`` must have been built with the same tile dims."""
    grid_x, grid_y = tile_grid(image_width, image_height, tile_x, tile_y)
    # Slot reconstruction drops the sort's carried slot operand (sort cost
    # is per-operand); tile-based culling leaves slot holes, so it keeps
    # the carried slot (see make_segment_gather_recon).
    from ..kernels.tuning import resolve_use_recon

    use_recon = ((not tile_based_culling) and grid_x <= 1024
                 and grid_y <= 1024 and resolve_use_recon())
    # Segment alignment must equal the DMA chunk so the backward kernel's
    # full-chunk writes stay within each tile's own segment.
    pairs, segs = build_pairs_aligned(
        prep,
        capacity=capacity,
        grid_x=grid_x,
        grid_y=grid_y,
        align=chunk,
        sort_order=sort_order,
        tile_based_culling=tile_based_culling,
        campos=campos,
        inverse_vp=inverse_vp,
        image_width=image_width,
        image_height=image_height,
        pad_capacity=pad_capacity,
        rank_key=rank_key,
        tile_x=tile_x,
        tile_y=tile_y,
        carry_slot=not use_recon,
    )
    recon = (
        (recon_table_columns(prep), pairs.tile_id, pairs.valid, grid_x)
        if use_recon else None
    )
    payload = build_payload(prep, segs, chunk, capacity, carry_bf16, recon,
                            pack_fwd, carry_depth)
    blend = make_blend_global(grid_x, grid_y, chunk, interpret, tile_x, tile_y)
    packed = blend(payload, segs.starts, segs.counts)
    color, final_t, n_contrib, depth_acc = unpack_image(
        packed, grid_x, grid_y, image_width, image_height, tile_x, tile_y
    )
    # Background composite in jnp (outside the kernel): autodiff supplies
    # d_bg and folds the bg path into the final-T cotangent for the kernel.
    color = color + final_t[None, :, :] * bg[:, None, None]
    return color, final_t, n_contrib, pairs, depth_acc


def build_payload_kbuffer(prep: PreprocessOutput, segs: AlignedSegments,
                          chunk: int, capacity: int = None,
                          carry_bf16: bool = False, recon=None):
    """Gather the k-buffer blend payload [32, C_aligned + chunk].

    Differentiable gather (see build_payload); includes the packed inverse
    3D covariance for exact per-ray depths (forward.cu:208-220). The trailing
    ``chunk`` zero columns absorb the final fixed-size DMA over-read.
    """
    table = jnp.concatenate(
        [
            prep.mean2d, prep.conic_opacity, prep.rgb, prep.cov3d_inv9,
            prep.opacity_power_threshold[:, None],
        ],
        axis=1,
    )  # [P, 19]
    # cov3d_inv9 / power threshold rows get zero gradient (discrete
    # resort, like the reference) — restrict the VJP to cols 0..8.
    feats = _payload_gather(table, segs, capacity, 9, carry_bf16,
                            recon)  # [19, C]
    feats = jnp.pad(feats, ((0, KB_PAYLOAD_F - feats.shape[0]), (0, chunk)))
    return feats




def split_binning_segments(starts, counts, bin_gx, bin_gy, sub):
    """Map per-binning-tile segments to per-16x16 blend tiles.

    A (sub*16)x16 binning tile covers ``sub`` 16x16 blend tiles that ALL
    read the parent's pair segment: pairs overlapping the parent rect but
    not a given half never pass the blend's alpha threshold there (the
    emission rect bounds the alpha >= 1/255 extent), so the extra entries
    are exact no-ops for that half's pixels — one binning stream feeds
    every render mode, like the reference's shared BinningState
    (rasterizer_impl.cu:264, forward.cu:388-494). Returns
    (grid_x16, starts16, counts16) for the 16x16 blend grid.
    """
    s = jnp.repeat(starts.reshape(bin_gy, bin_gx), sub, axis=1).reshape(-1)
    c = jnp.repeat(counts.reshape(bin_gy, bin_gx), sub, axis=1).reshape(-1)
    return bin_gx * sub, s, c


def _resolve_bin_tile(tile_x, tile_y):
    """Validate a resort-mode binning tile; returns (tile2x, sub)."""
    if (tile_x, tile_y) == (TILE_X, TILE_Y):
        return False, 1
    if (tile_x, tile_y) != (2 * TILE_X, TILE_Y):
        raise NotImplementedError(
            "resort-mode binning tiles support 16x16 (reference parity) "
            "and 32x16 (the measured GLOBAL winner) only"
        )
    return True, 2


def render_tiled_kbuffer(
    prep: PreprocessOutput,
    bg: jnp.ndarray,
    *,
    image_width: int,
    image_height: int,
    capacity: int,
    campos,
    inverse_vp,
    k: int = 4,
    sort_order: GlobalSortOrder = GlobalSortOrder.Z_DEPTH,
    tile_based_culling: bool = False,
    chunk: int = 128,
    seg_cap: int = 16384,
    carry_bf16: bool = False,
    pad_capacity=None,
    rank_key: bool = False,
    tile_x: int = TILE_X,
    tile_y: int = TILE_Y,
    interpret: bool = False,
):
    """PER_PIXEL_KBUFFER tiled render. Returns (color, final_T, n_contrib,
    pairs).

    ``tile_x``/``tile_y``: BINNING tile (16x16 = reference parity; 32x16
    cuts the pair domain ~35%). The blend always runs 16x16 tiles — with a
    32x16 binning tile each half reads the parent segment (see
    split_binning_segments) and the backward splits gradient rows per half
    (blend_vjp tile2x)."""
    tile2x, sub = _resolve_bin_tile(tile_x, tile_y)
    bin_gx, bin_gy = tile_grid(image_width, image_height, tile_x, tile_y)
    pairs, segs = build_pairs_aligned(
        prep,
        capacity=capacity,
        grid_x=bin_gx,
        grid_y=bin_gy,
        align=chunk,
        sort_order=sort_order,
        tile_based_culling=tile_based_culling,
        campos=campos,
        inverse_vp=inverse_vp,
        image_width=image_width,
        image_height=image_height,
        pad_capacity=pad_capacity,
        rank_key=rank_key,
        tile_x=tile_x,
        tile_y=tile_y,
        carry_slot=(tile_based_culling or bin_gx > 1024
                    or bin_gy > 1024 or not _use_recon()),
    )
    recon = (
        None if (tile_based_culling or bin_gx > 1024 or bin_gy > 1024
                 or not _use_recon())
        else (recon_table_columns(prep), pairs.tile_id, pairs.valid, bin_gx)
    )
    payload = build_payload_kbuffer(prep, segs, chunk, capacity, carry_bf16,
                                    recon)
    cam = jnp.concatenate(
        [inverse_vp.reshape(-1), campos.reshape(-1)]
    ).astype(jnp.float32)
    if tile2x:
        grid_x, starts_b, counts_b = split_binning_segments(
            segs.starts, segs.counts, bin_gx, bin_gy, sub)
        grid_y = bin_gy
    else:
        grid_x, grid_y = bin_gx, bin_gy
        starts_b, counts_b = segs.starts, segs.counts
    # Lane-width groups + routing precision resolve inside the factory
    # (kernels/tuning.py — the single home for env knobs and chip clamps).
    blend = make_blend_kbuffer(
        grid_x, grid_y, k, image_width, image_height, chunk, seg_cap,
        interpret, tile2x=tile2x,
    )
    packed = blend(payload, starts_b, counts_b, bg, cam)
    color, final_t, n_contrib, depth_acc = unpack_image(
        packed, grid_x, grid_y, image_width, image_height
    )
    return color, final_t, n_contrib, pairs, depth_acc


def render_tiled_full(
    prep: PreprocessOutput,
    bg: jnp.ndarray,
    *,
    image_width: int,
    image_height: int,
    capacity: int,
    campos,
    inverse_vp,
    sort_order: GlobalSortOrder = GlobalSortOrder.Z_DEPTH,
    tile_based_culling: bool = False,
    seg_full: int = 2048,
    chunk: int = 128,
    pad_capacity=None,
    rank_key: bool = False,
    tile_x: int = TILE_X,
    tile_y: int = TILE_Y,
    interpret: bool = False,
):
    """PER_PIXEL_FULL tiled render (exact per-ray sort; forward only, like
    the reference's renderSortedFullCUDA). Returns (color, final_T,
    n_contrib, pairs, depth_acc). Tiles with more than ``seg_full`` pairs
    are truncated and reported through ``pairs.overflow``."""
    from ..kernels.full_blend import blend_full_forward
    from ..kernels.global_blend import unpack_image

    tile2x, sub = _resolve_bin_tile(tile_x, tile_y)
    bin_gx, bin_gy = tile_grid(image_width, image_height, tile_x, tile_y)
    grid_x, grid_y = bin_gx, bin_gy
    pairs, segs = build_pairs_aligned(
        prep,
        capacity=capacity,
        grid_x=bin_gx,
        grid_y=bin_gy,
        align=chunk,
        tile_x=tile_x,
        tile_y=tile_y,
        sort_order=sort_order,
        tile_based_culling=tile_based_culling,
        campos=campos,
        inverse_vp=inverse_vp,
        image_width=image_width,
        image_height=image_height,
        pad_capacity=pad_capacity,
        rank_key=rank_key,
        carry_slot=False,
    )
    payload = build_payload_kbuffer(prep, segs, chunk, capacity)
    cam = jnp.concatenate(
        [inverse_vp.reshape(-1), campos.reshape(-1)]
    ).astype(jnp.float32)
    if tile2x:
        grid_x, starts_b, counts_b = split_binning_segments(
            segs.starts, segs.counts, bin_gx, bin_gy, sub)
    else:
        starts_b, counts_b = segs.starts, segs.counts
    packed = blend_full_forward(
        jax.lax.stop_gradient(payload),
        starts_b, counts_b, jax.lax.stop_gradient(bg), cam,
        grid_x=grid_x, grid_y=grid_y, width=image_width,
        height=image_height, seg_full=seg_full, interpret=interpret,
    )
    color, final_t, n_contrib, depth_acc = unpack_image(
        packed, grid_x, grid_y, image_width, image_height
    )
    pairs = pairs._replace(
        overflow=pairs.overflow | jnp.any(segs.counts > seg_full)
    )
    return color, final_t, n_contrib, pairs, depth_acc


def render_tiled_hier(
    prep: PreprocessOutput,
    bg: jnp.ndarray,
    *,
    image_width: int,
    image_height: int,
    capacity: int,
    campos,
    inverse_vp,
    queue_sizes=(64, 8, 4),
    sort_order: GlobalSortOrder = GlobalSortOrder.Z_DEPTH,
    tile_based_culling: bool = False,
    hier_4x4_culling: bool = False,
    chunk: int = 128,
    seg_cap: int = 16384,
    carry_bf16: bool = False,
    pad_capacity=None,
    rank_key: bool = False,
    batched_cascade: bool = False,
    tile_x: int = TILE_X,
    tile_y: int = TILE_Y,
    interpret: bool = False,
):
    """HIERARCHICAL tiled render. Returns (color, final_T, n_contrib,
    pairs).

    ``tile_x``/``tile_y``: BINNING tile; 32x16 feeds each 16x16 half-tile
    cascade from the parent segment (split_binning_segments). The cascade
    geometry itself (4x4 tail / 2x2 mid / per-pixel head) stays 16x16."""
    from ..kernels.blend_vjp import make_blend_hier

    tile2x, sub = _resolve_bin_tile(tile_x, tile_y)
    bin_gx, bin_gy = tile_grid(image_width, image_height, tile_x, tile_y)
    pairs, segs = build_pairs_aligned(
        prep,
        capacity=capacity,
        grid_x=bin_gx,
        grid_y=bin_gy,
        align=chunk,
        sort_order=sort_order,
        tile_based_culling=tile_based_culling,
        campos=campos,
        inverse_vp=inverse_vp,
        image_width=image_width,
        image_height=image_height,
        pad_capacity=pad_capacity,
        rank_key=rank_key,
        tile_x=tile_x,
        tile_y=tile_y,
        carry_slot=(tile_based_culling or bin_gx > 1024
                    or bin_gy > 1024 or not _use_recon()),
    )
    recon = (
        None if (tile_based_culling or bin_gx > 1024 or bin_gy > 1024
                 or not _use_recon())
        else (recon_table_columns(prep), pairs.tile_id, pairs.valid, bin_gx)
    )
    payload = build_payload_kbuffer(prep, segs, chunk, capacity, carry_bf16,
                                    recon)
    cam = jnp.concatenate(
        [inverse_vp.reshape(-1), campos.reshape(-1)]
    ).astype(jnp.float32)
    if tile2x:
        grid_x, starts_b, counts_b = split_binning_segments(
            segs.starts, segs.counts, bin_gx, bin_gy, sub)
        grid_y = bin_gy
    else:
        grid_x, grid_y = bin_gx, bin_gy
        starts_b, counts_b = segs.starts, segs.counts
    # Lane-width groups (incl. the on-chip G<=2 scoped-vmem clamp) and
    # routing precision resolve inside the factory (kernels/tuning.py).
    blend = make_blend_hier(
        grid_x, grid_y, tuple(queue_sizes), image_width, image_height,
        hier_4x4_culling, chunk, seg_cap, interpret,
        batched_cascade=batched_cascade, tile2x=tile2x,
    )
    packed = blend(payload, starts_b, counts_b, bg, cam)
    color, final_t, n_contrib, depth_acc = unpack_image(
        packed, grid_x, grid_y, image_width, image_height
    )
    return color, final_t, n_contrib, pairs, depth_acc


def render_tiled_timed(
    prep_fn,
    timer,
    bg: jnp.ndarray,
    *,
    image_width: int,
    image_height: int,
    capacity: int,
    sort_order: GlobalSortOrder = GlobalSortOrder.Z_DEPTH,
    tile_based_culling: bool = False,
    campos=None,
    inverse_vp=None,
    chunk: int = 256,
    interpret: bool = False,
):
    """GLOBAL render with per-stage timing (reference Timer stage names
    Preprocess/Duplicate/Sort/Render, rasterizer_impl.cu:248). Each stage is
    dispatched and blocked separately via ``timer.time`` —
    utils/profiling.StageTimer — at the cost of fusion across stages; use the
    untimed path (one jit) for production and ``utils.profiling.trace`` for
    in-jit kernel breakdowns.

    ``prep_fn`` is a zero-arg callable producing the PreprocessOutput.
    """
    from .duplicate import expand_pairs, sort_expanded

    grid_x, grid_y = tile_grid(image_width, image_height)
    num_tiles = grid_x * grid_y
    prep = timer.time("Preprocess", prep_fn)
    expanded = timer.time(
        "Duplicate",
        jax.jit(
            lambda p: expand_pairs(
                p, capacity=capacity, grid_x=grid_x, grid_y=grid_y,
                sort_order=sort_order, tile_based_culling=tile_based_culling,
                campos=campos, inverse_vp=inverse_vp,
                image_width=image_width, image_height=image_height,
            )
        ),
        prep,
    )
    pairs = timer.time(
        "Sort",
        jax.jit(lambda e: sort_expanded(*e, num_tiles=num_tiles)),
        expanded,
    )

    def render(prep, pairs, bg):
        capacity_aligned = capacity + num_tiles * chunk
        segs = align_segments(pairs, num_tiles, capacity_aligned, chunk)
        payload = build_payload(prep, segs, chunk, capacity)
        blend = make_blend_global(grid_x, grid_y, chunk, interpret)
        packed = blend(payload, segs.starts, segs.counts)
        color, final_t, n_contrib, depth_acc = unpack_image(
            packed, grid_x, grid_y, image_width, image_height
        )
        color = color + final_t[None, :, :] * bg[:, None, None]
        return color, final_t, n_contrib, depth_acc

    color, final_t, n_contrib, depth_acc = timer.time(
        "Render", jax.jit(render), prep, pairs, bg
    )
    timer.frame()
    return color, final_t, n_contrib, pairs, depth_acc
