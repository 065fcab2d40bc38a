"""Gaussian→tile pair expansion ("duplication") with static shapes.

TPU-native re-design of the reference's two duplication kernels
(forward.cu:25-65 duplicateWithKeysCUDA and stopthepop_common.cuh:324-621
duplicateWithKeys_extended):

The reference sizes its pair buffer with a device→host read of the scanned
tile counts (rasterizer_impl.cu:316-321) — a mid-pipeline host sync that XLA
cannot express. Here the buffer has a *static capacity* and the pair→Gaussian
rank mapping is branch-free: scatter one mark at each Gaussian's cumulative
offset and take an inclusive cumsum —

    g[i] = #{j : offsets[j] <= i}  ==  cumsum(scatter(ones at offsets))[i]

(equivalent to a searchsorted, but XLA lowers searchsorted to a while-loop of
serial gathers that costs ~30 ms at production sizes on TPU; the
scatter+cumsum form is a single vectorized pass). Slots past ``num_rendered``
(and tile-culled pairs) get the INVALID_TILE_ID sentinel and sort to the end —
the reference's own under-fill trick (stopthepop_common.cuh:504-508).
Overflow past capacity is detected and reported instead of silently dropped.

Per-Gaussian values are fetched at pair rank through two *packed* tables (one
int32, one f32) so the pair domain sees a constant number of wide gathers
instead of a dozen narrow ones (TPU gathers cost per-row, not per-byte).

The warp-cooperative load-balancing path (stopthepop_common.cuh:516-621) has
no TPU analog because this formulation is already perfectly balanced: every
pair slot costs the same work regardless of how many tiles its Gaussian
touches.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import GlobalSortOrder
from ..constants import INVALID_TILE_ID, TILE_X, TILE_Y
from ..ops.scan import cumsum_mxu
from ..ops.sort import sort_pairs
from ..ops.stopthepop import (
    max_contrib_power_rect,
    per_tile_depth,
    tile_rect_bounds,
)
from .preprocess import PreprocessOutput


def _i32_to_f32_exact(x: jnp.ndarray) -> jnp.ndarray:
    """Encode non-negative int32 columns as EXACTLY-representable f32.

    Each int column becomes two f32 columns holding its 16-bit halves via
    CONVERT (values < 2^16 are exact in f32). Never bitcast ints into f32
    for transport through float-typed tables: small-int bit patterns are
    denormal floats and TPU gathers/vector ops flush them to zero (this
    silently zeroed every pair's validity/rect on chip — round 3).
    [..., k] int32 -> [..., 2k] f32, inverse _f32_exact_to_i32.
    """
    hi = (x >> 16).astype(jnp.float32)
    lo = (x & 0xFFFF).astype(jnp.float32)
    return jnp.concatenate([hi, lo], axis=-1)


def _f32_exact_to_i32(f: jnp.ndarray) -> jnp.ndarray:
    """Inverse of _i32_to_f32_exact: [..., 2k] f32 -> [..., k] int32."""
    k = f.shape[-1] // 2
    hi = f[..., :k].astype(jnp.int32)
    lo = f[..., k:].astype(jnp.int32)
    return (hi << 16) | lo


def rank_expand(offsets_inclusive: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """g[i] = number of offsets <= i, for i in [0, capacity).

    Branch-free searchsorted(offsets, arange(capacity), side='right'). The
    running count rides an f32 cumsum (exact below 2^24, i.e. any realistic
    P) — XLA's i32 scan on TPU is several times slower than the f32 one.
    """
    assert capacity < (1 << 24), "rank_expand f32 cumsum needs capacity < 2^24"
    marks = jnp.zeros((capacity,), jnp.float32).at[offsets_inclusive].add(
        1.0, mode="drop"
    )
    return cumsum_mxu(marks).astype(jnp.int32)


def rect_histogram(prep: PreprocessOutput, grid_x: int, grid_y: int):
    """Exact per-tile pair counts [T] without touching the pair domain.

    counts[ty, tx] = sum_g 1[rect_g covers (tx, ty)] — separable into two
    indicator matrices contracted over Gaussians, which the MXU eats in well
    under a millisecond. The scatter-add alternative (one update per *pair*)
    costs ~15 ms at production sizes. Indicators are exactly representable in
    bf16; accumulation happens in f32, so the counts are exact.

    Only valid when nothing culls pairs *per-tile* (i.e. not
    tile_based_culling) — per-Gaussian culling is handled by the valid mask.
    """
    tx = jnp.arange(grid_x, dtype=jnp.int32)
    ty = jnp.arange(grid_y, dtype=jnp.int32)
    a = (
        (tx[None, :] >= prep.rect_min[:, :1])
        & (tx[None, :] < prep.rect_max[:, :1])
        & prep.valid[:, None]
    ).astype(jnp.bfloat16)  # [P, gx]
    b = (
        (ty[None, :] >= prep.rect_min[:, 1:2])
        & (ty[None, :] < prep.rect_max[:, 1:2])
    ).astype(jnp.bfloat16)  # [P, gy]
    counts = jax.lax.dot_general(
        b, a, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [gy, gx]
    return counts.reshape(-1).astype(jnp.int32)


class AlignedSegments(NamedTuple):
    """Per-tile pair segments laid out at ``align``-pair boundaries.

    The Pallas blend kernels DMA payload chunks along the (128-wide) lane
    axis, so every tile's segment must start at a 128-aligned offset.
    ``orig_slot``/``gauss_offsets`` (present on the fused
    build_pairs_aligned path) enable the gather-only payload VJP.
    """

    gauss_id: jnp.ndarray   # [C_aligned] int32 (clamped where invalid)
    valid: jnp.ndarray      # [C_aligned] bool
    starts: jnp.ndarray     # [num_tiles] int32, each a multiple of align
    counts: jnp.ndarray     # [num_tiles] int32 exact (unaligned) counts
    orig_slot: jnp.ndarray = None      # [C_aligned] int32 pre-sort slot
    gauss_offsets: jnp.ndarray = None  # [P] int32 inclusive pair offsets


class PairBuffer(NamedTuple):
    tile_id: jnp.ndarray   # [C] int32, sorted; INVALID_TILE_ID padding
    depth: jnp.ndarray     # [C] float32, sorted within tiles
    gauss_id: jnp.ndarray  # [C] int32 Gaussian index (clamped where invalid)
    valid: jnp.ndarray     # [C] bool
    starts: jnp.ndarray    # [num_tiles] int32 per-tile range start
    ends: jnp.ndarray      # [num_tiles] int32 per-tile range end
    num_rendered: jnp.ndarray  # [] int32 — exact pair count (pre-capacity)
    overflow: jnp.ndarray  # [] bool — num_rendered > capacity


def count_pairs(prep: PreprocessOutput) -> jnp.ndarray:
    """Exact number of (Gaussian, tile) pairs the rect expansion produces."""
    return jnp.sum(prep.tiles_touched)


def rank_key_bits(num_tiles: int, num_gaussians: int):
    """Static feasibility of the packed rank-key sort: rank_bits or None.

    The packed u32 key is ``tile << rank_bits | depth_rank``. Tiles need
    ``bit_length(num_tiles)`` bits (so the all-ones invalid sentinel stays
    above every real tile); ranks need room for the ``num_gaussians`` real
    ranks plus the all-ones per-tile padding sentinel. 1080p at 16x16 tiles
    (8160 tiles, 13 bits) leaves 19 rank bits => P <= 524287.
    """
    tile_bits = max(1, int(num_tiles).bit_length())
    rank_bits = 32 - tile_bits
    if rank_bits <= 0 or num_gaussians > (1 << rank_bits) - 1:
        return None
    return rank_bits


def depth_ranks(prep: PreprocessOutput) -> jnp.ndarray:
    """[P] int32 depth rank per Gaussian (stable: ties keep index order).

    The rank is a total order consistent with ``prep.depth``, so sorting
    pairs by ``(tile, rank)`` is bitwise-identical to the stable
    ``(tile, depth)`` sort: within a tile each Gaussian contributes at most
    one pair and the pair stream is gid-major, so depth ties resolve to
    ascending gid under both keys. Invalid Gaussians rank last (their pairs
    carry the invalid sentinel key anyway).
    """
    P = prep.depth.shape[0]
    depth_m = jax.lax.stop_gradient(
        jnp.where(prep.valid, prep.depth, jnp.inf)
    )
    iota = jnp.arange(P, dtype=jnp.int32)
    _, order = jax.lax.sort((depth_m, iota), num_keys=1)
    _, rank = jax.lax.sort((order, iota), num_keys=1)
    return rank


def expand_pairs(
    prep: PreprocessOutput,
    *,
    capacity: int,
    grid_x: int,
    grid_y: int,
    sort_order: GlobalSortOrder = GlobalSortOrder.Z_DEPTH,
    tile_based_culling: bool = False,
    campos=None,
    inverse_vp=None,
    image_width: int = 0,
    image_height: int = 0,
    tile_x: int = TILE_X,
    tile_y: int = TILE_Y,
    rank=None,
    rank_bits=None,
):
    """The "Duplicate" stage: expand + key + optionally tile-cull all pairs.

    Returns (tile_id, depth_key, gauss_id, num_rendered, overflow), unsorted.

    With ``rank``/``rank_bits`` (per-Gaussian depth ranks, see depth_ranks —
    only meaningful for the per-Gaussian Z_DEPTH/DISTANCE orders), the
    second return is instead the packed uint32 sort key
    ``tile << rank_bits | rank`` (invalid pairs all-ones): one single-key
    sort operand replacing the (tile, depth) two-key pair.
    """
    offsets = jnp.cumsum(prep.tiles_touched).astype(jnp.int32)  # inclusive [P]
    num_rendered = offsets[-1] if prep.tiles_touched.size else jnp.int32(0)
    P = prep.tiles_touched.shape[0]

    i = jnp.arange(capacity, dtype=jnp.int32)
    g = jnp.clip(rank_expand(offsets, capacity), 0, P - 1)

    # The per-pair gather's cost scales with its COLUMN count (measured:
    # this fusion was 27.6% of the whole 5M step at 11 gathered columns,
    # results_r5/prof_global_5m_pf.log + hlo_5m_pf.txt), so ALL per-Gaussian
    # values ride in ONE gather made as NARROW as possible. Ints are
    # transported as EXACT f32 CONVERTS — NOT bitcasts: small-int f32 bit
    # patterns are denormals and the TPU gather/vector path flushes them to
    # zero (observed on-chip: every pair's validity column read back 0, so
    # whole renders collapsed to background; the round-3 execution gate
    # exists because of this). Two transports:
    #   * value-packed (round 5, the default when static ranges allow):
    #     base/rank each ride one exact-f32 column (values < 2^24) and the
    #     rect ints pack bitwise into one column
    #     (rmin_x | rmin_y<<10 | valid<<20 < 2^21, grids <= 1024) plus
    #     width — 3-4 columns total;
    #   * 16-bit halves (fallback for huge capacities/grids): 2 columns
    #     per int, range-free.
    if rank is not None:
        assert sort_order in (
            GlobalSortOrder.Z_DEPTH, GlobalSortOrder.DISTANCE,
        ), "rank keys need a per-Gaussian depth order"
    base_col = jnp.concatenate([jnp.zeros((1,), jnp.int32), offsets[:-1]])
    width_col = jnp.maximum(prep.rect_max[:, 0] - prep.rect_min[:, 0], 1)
    pack_vals = (
        capacity < (1 << 24) and P < (1 << 24)
        and grid_x <= 1024 and grid_y <= 1024
        and not os.environ.get("STP_FORCE_HALVES_TRANSPORT")
        # env knob: test hook for the fallback transport (real triggers —
        # >=16.7M-pair capacities or >1024-tile grids — exceed test scale)
    )
    if pack_vals:
        rect_col = (
            prep.rect_min[:, 0]
            | (prep.rect_min[:, 1] << 10)
            | (prep.valid.astype(jnp.int32) << 20)
        )
        # width <= 1024 needs 11 bits and base/rank need up to 24 — width
        # packs with rect only if grids were <= 512; keep it separate.
        int_cols = [base_col, rect_col, width_col]
        if rank is not None:
            int_cols.append(rank)
    else:
        int_cols = [
            base_col,
            prep.rect_min[:, 0],
            prep.rect_min[:, 1],
            width_col,
            prep.valid.astype(jnp.int32),
        ]
        if rank is not None:
            int_cols.append(rank)
    ni = len(int_cols)
    int_tab = jnp.stack(int_cols, axis=1)  # [P, ni] (all non-negative)

    need_power = tile_based_culling or sort_order == GlobalSortOrder.PTD_MAX
    need_ptd = sort_order in (GlobalSortOrder.PTD_CENTER, GlobalSortOrder.PTD_MAX)

    # Rank-key sorting without per-tile depths never reads the expanded
    # depth — drop the column from the gather entirely.
    need_depth = rank is None or need_power or need_ptd
    f_cols = [prep.depth] if need_depth else []
    if need_power:
        f_cols += [
            prep.mean2d[:, 0],
            prep.mean2d[:, 1],
            prep.conic_opacity[:, 0],
            prep.conic_opacity[:, 1],
            prep.conic_opacity[:, 2],
            prep.conic_opacity[:, 3],
            prep.opacity_power_threshold,
        ]
    if need_ptd:
        f_cols += [prep.cov3d_inv9[:, k] for k in range(9)]
    if pack_vals:
        int_f = int_tab.astype(jnp.float32)  # exact: all values < 2^24
        n_if = ni
    else:
        int_f = _i32_to_f32_exact(int_tab)
        n_if = 2 * ni
    if f_cols:
        tab = jnp.concatenate(
            [int_f, jnp.stack(f_cols, axis=1)], axis=1
        )
    else:
        tab = int_f
    tg = tab[g]  # the one big gather
    fg = tg[:, n_if:]
    if pack_vals:
        ig = tg[:, :ni].astype(jnp.int32)  # exact round-trip (< 2^24)
        base, rect_p, width = (ig[:, k] for k in range(3))
        rmin_x = rect_p & 1023
        rmin_y = (rect_p >> 10) & 1023
        gvalid = rect_p >> 20
        rank_g = ig[:, 3] if rank is not None else None
    else:
        ig = _f32_exact_to_i32(tg[:, :n_if])
        base, rmin_x, rmin_y, width, gvalid = (ig[:, k] for k in range(5))
        rank_g = ig[:, 5] if rank is not None else None
    local = i - base
    # Division-free rect decode: XLA lowers s32 vector division on TPU to
    # a long emulation sequence, and this is the hottest pair-domain
    # fusion (results_r5/prof_global_5m_vp.log: 15.3 ns/row where the bare
    # 4-column gather rate is ~4.8). Exact float-reciprocal quotient with
    # a +-1 integer fixup: for every VALID pair, local < rect_w * rect_h
    # <= 2^22, so the f32 candidate quotient floor(local * (1/w)) is off
    # by at most 1 (relative product error ~2^-23) and one remainder-test
    # round corrects it exactly in int arithmetic. Invalid/padding slots
    # may decode garbage; their tile_id is overwritten by the sentinel.
    q = jnp.floor(
        local.astype(jnp.float32) * (1.0 / width.astype(jnp.float32))
    ).astype(jnp.int32)
    r = local - q * width
    q = q + (r >= width).astype(jnp.int32) - (r < 0).astype(jnp.int32)
    r = local - q * width
    ty = rmin_y + q
    tx = rmin_x + r
    tile_id = ty * grid_x + tx

    valid = (i < num_rendered) & (gvalid > 0)
    depth = fg[:, 0] if need_depth else None

    if need_power:
        conic_opac = fg[:, 3:7]
        mean2d = fg[:, 1:3]
        power_thresh = fg[:, 7]
        tile_min, tile_max = tile_rect_bounds(tx, ty, tile_x, tile_y)
        power, max_pos = max_contrib_power_rect(
            conic_opac, mean2d, tile_min, tile_max,
            patch_w=tile_x - 1, patch_h=tile_y - 1,
        )
        if tile_based_culling:
            valid = valid & (power <= power_thresh)

    if need_ptd:
        cov3d_inv9 = fg[:, -9:]
        if sort_order == GlobalSortOrder.PTD_CENTER:
            # Center of the inclusive pixel rect: (tx*16 + 7.5, ty*16 + 7.5).
            target = jnp.stack(
                [
                    tx.astype(jnp.float32) * tile_x + (tile_x - 1) / 2.0,
                    ty.astype(jnp.float32) * tile_y + (tile_y - 1) / 2.0,
                ],
                axis=-1,
            )
        else:
            target = max_pos
        depth = per_tile_depth(
            target, cov3d_inv9, campos, image_width, image_height, inverse_vp
        )

    tile_id = jnp.where(valid, tile_id, INVALID_TILE_ID).astype(jnp.int32)
    if rank is not None:
        key = (
            (tile_id.astype(jnp.uint32) << rank_bits)
            | rank_g.astype(jnp.uint32)
        )
        key = jnp.where(valid, key, jnp.uint32(0xFFFFFFFF))
        return (
            tile_id, key, g,
            num_rendered.astype(jnp.int32), num_rendered > capacity,
        )
    depth_key = jnp.where(valid, depth, jnp.inf).astype(jnp.float32)
    return (
        tile_id, depth_key, g,
        num_rendered.astype(jnp.int32), num_rendered > capacity,
    )


def sort_expanded(tile_id, depth_key, g, num_rendered, overflow,
                  num_tiles: int) -> PairBuffer:
    """The "Sort" stage: global (tile, depth) sort + tile-range build."""
    s_tile, s_depth, s_gid = sort_pairs(tile_id, depth_key, g)

    # Per-tile counts by scatter-add (invalid ids fall outside and drop);
    # sorted-by-tile order makes starts an exclusive cumsum.
    counts_t = jnp.zeros((num_tiles,), jnp.int32).at[tile_id].add(
        (tile_id != INVALID_TILE_ID).astype(jnp.int32), mode="drop"
    )
    incl = jnp.cumsum(counts_t)
    starts = (incl - counts_t).astype(jnp.int32)
    return PairBuffer(
        tile_id=s_tile,
        depth=s_depth,
        gauss_id=s_gid,
        valid=s_tile != INVALID_TILE_ID,
        starts=starts,
        ends=incl.astype(jnp.int32),
        num_rendered=num_rendered,
        overflow=overflow,
    )


def build_pairs(
    prep: PreprocessOutput,
    *,
    capacity: int,
    grid_x: int,
    grid_y: int,
    sort_order: GlobalSortOrder = GlobalSortOrder.Z_DEPTH,
    tile_based_culling: bool = False,
    campos=None,
    inverse_vp=None,
    image_width: int = 0,
    image_height: int = 0,
    tile_x: int = TILE_X,
    tile_y: int = TILE_Y,
) -> PairBuffer:
    """Expand, optionally tile-cull, key and sort all Gaussian/tile pairs."""
    expanded = expand_pairs(
        prep, capacity=capacity, grid_x=grid_x, grid_y=grid_y,
        sort_order=sort_order, tile_based_culling=tile_based_culling,
        campos=campos, inverse_vp=inverse_vp,
        image_width=image_width, image_height=image_height,
        tile_x=tile_x, tile_y=tile_y,
    )
    return sort_expanded(*expanded, num_tiles=grid_x * grid_y)


def build_pairs_aligned(
    prep: PreprocessOutput,
    *,
    capacity: int,
    grid_x: int,
    grid_y: int,
    align: int,
    sort_order: GlobalSortOrder = GlobalSortOrder.Z_DEPTH,
    tile_based_culling: bool = False,
    campos=None,
    inverse_vp=None,
    image_width: int = 0,
    image_height: int = 0,
    tile_x: int = TILE_X,
    tile_y: int = TILE_Y,
    pad_capacity=None,
    carry_slot: bool = True,
    rank_key: bool = False,
):
    """Fused pair build producing the align-padded layout in ONE sort.

    Instead of re-gathering the sorted list into aligned segments (two
    multi-million-row gathers — the slow primitive on TPU), per-tile padding
    entries (depth +inf, so they sort to each tile segment's end) join the
    sort itself: the sorted array IS the aligned layout. Total length is
    ``capacity + num_tiles * align``; per-tile pad counts come from the
    pre-sort per-tile histogram.

    Returns (PairBuffer over the padded array, AlignedSegments).

    ``rank_key=True`` opts into the packed single-key sort (see depth_ranks
    / rank_key_bits): bitwise-identical order, one fewer sort operand, at
    the cost of two [P]-element rank sorts. Silently falls back to the
    two-key sort for per-tile-depth orders or when (tile, rank) cannot pack
    into 32 bits. The PairBuffer's ``depth`` is None on this path (nothing
    downstream consumes it; the valid mask comes from the key bits).
    """
    num_tiles = grid_x * grid_y
    rank = rank_bits = None
    if rank_key and sort_order in (
        GlobalSortOrder.Z_DEPTH, GlobalSortOrder.DISTANCE,
    ):
        rank_bits = rank_key_bits(num_tiles, prep.depth.shape[0])
        if rank_bits is not None:
            rank = depth_ranks(prep)
    if rank is None:
        rank_bits = None
    tile_id, depth_key, g, num_rendered, overflow = expand_pairs(
        prep, capacity=capacity, grid_x=grid_x, grid_y=grid_y,
        sort_order=sort_order, tile_based_culling=tile_based_culling,
        campos=campos, inverse_vp=inverse_vp,
        image_width=image_width, image_height=image_height,
        tile_x=tile_x, tile_y=tile_y,
        rank=rank, rank_bits=rank_bits,
    )
    if tile_based_culling:
        # Per-tile culling drops individual pairs; only a pair-domain
        # histogram sees that.
        valid = tile_id != INVALID_TILE_ID
        counts = jnp.zeros((num_tiles,), jnp.int32).at[tile_id].add(
            valid.astype(jnp.int32), mode="drop"
        )
    else:
        counts = rect_histogram(prep, grid_x, grid_y)
    return sort_stream_aligned(
        tile_id, depth_key, g, counts,
        num_tiles=num_tiles, align=align,
        num_rendered=num_rendered, overflow=overflow,
        gauss_offsets=jnp.cumsum(prep.tiles_touched).astype(jnp.int32),
        pad_capacity=pad_capacity,
        carry_slot=carry_slot,
        rank_bits=rank_bits,
    )


def sort_stream_aligned(
    tile_id, depth_key, g, counts, *, num_tiles: int, align: int,
    num_rendered, overflow, gauss_offsets=None, pad_capacity=None,
    carry_slot: bool = True, rank_bits=None,
):
    """Sort a raw pair stream into the align-padded per-tile layout.

    The stream-level core of ``build_pairs_aligned`` (which feeds it the
    rect expansion): callers that assemble pair streams some other way —
    e.g. the ring-streamed Gaussian sharding in parallel/ring.py, which
    accumulates pairs over ``ppermute`` rotations — reuse the same
    pad-into-sort trick. ``counts`` must be the exact per-tile count of
    valid entries in the stream.

    ``pad_capacity`` (static) bounds the shared padding pool. The worst
    case is ``num_tiles * (align - 1)`` (the ``None`` default rounds up to
    ``num_tiles * align``), but per-tile pad needs are remainders mod
    ``align`` — across thousands of tiles their sum concentrates near
    ``num_tiles * align / 2``, so a ~0.6 * worst-case pool cuts every
    downstream pair-domain cost (this sort itself, the payload gather, the
    blend DMA footprint) by ~20% of the padding share. Exceeding the pool
    is detected and reported through the returned ``overflow`` flag (the
    same contract as pair-capacity overflow); segment starts are clamped
    in-range so the render stays memory-safe (output garbage, flagged).
    """
    capacity = tile_id.shape[0]
    pad_needed = (-counts) % align  # [T]
    if pad_capacity is None:
        pad_capacity = num_tiles * align
    pad_capacity = min(pad_capacity, num_tiles * align)

    # Shared padding pool: tile t contributes pad_needed[t] entries of
    # (tile t, depth +inf), laid out densely by the same rank-expansion the
    # pair stream uses; slots past the total (or past the pool) are INVALID
    # sentinels that sort to the global end.
    pad_off = jnp.cumsum(pad_needed).astype(jnp.int32)  # inclusive [T]
    total_pad = pad_off[-1] if num_tiles else jnp.int32(0)
    pad_overflow = total_pad > pad_capacity
    t_of_pad = jnp.clip(rank_expand(pad_off, pad_capacity), 0, num_tiles - 1)
    pad_valid = jnp.arange(pad_capacity, dtype=jnp.int32) < total_pad
    pad_tile = jnp.where(pad_valid, t_of_pad, INVALID_TILE_ID)
    pad_gid = jnp.zeros((pad_capacity,), jnp.int32)

    # The pre-sort slot index rides through the sort so the payload VJP can
    # invert the permutation with a second (cheap) integer sort instead of a
    # scatter — TPU scatters run ~10x slower than gathers. When the caller
    # can reconstruct slots post-sort (make_segment_gather_recon), the sort
    # drops that operand (carry_slot=False): sort cost is per-operand.
    total = capacity + pad_capacity
    if rank_bits is not None:
        # Packed single-key path: ``depth_key`` is the u32 key. Padding
        # entries take their tile's all-ones rank (sorting to the segment
        # end, like depth +inf); unused pool slots take the full sentinel.
        pad_rank = jnp.uint32((1 << rank_bits) - 1)
        pad_key = jnp.where(
            pad_valid,
            (t_of_pad.astype(jnp.uint32) << rank_bits) | pad_rank,
            jnp.uint32(0xFFFFFFFF),
        )
        keys = (jnp.concatenate([depth_key, pad_key]),
                jnp.concatenate([g, pad_gid]))
        if carry_slot:
            s_key, s_gid, s_slot = jax.lax.sort(
                keys + (jnp.arange(total, dtype=jnp.int32),), num_keys=1
            )
        else:
            s_key, s_gid = jax.lax.sort(keys, num_keys=1)
            s_slot = None
        tile_part = (s_key >> rank_bits).astype(jnp.int32)
        in_grid = tile_part < num_tiles
        s_tile = jnp.where(in_grid, tile_part, INVALID_TILE_ID)
        pair_valid = in_grid & (
            (s_key & pad_rank) != pad_rank
        )
        s_depth = None
    else:
        pad_depth = jnp.full((pad_capacity,), jnp.inf, jnp.float32)
        operands = (
            jnp.concatenate([tile_id, pad_tile]),
            jnp.concatenate([depth_key, pad_depth]),
            jnp.concatenate([g, pad_gid]),
        )
        if carry_slot:
            operands = operands + (jnp.arange(total, dtype=jnp.int32),)
            s_tile, s_depth, s_gid, s_slot = jax.lax.sort(
                operands, num_keys=2
            )
        else:
            s_tile, s_depth, s_gid = jax.lax.sort(operands, num_keys=2)
            s_slot = None
        pair_valid = (s_tile != INVALID_TILE_ID) & jnp.isfinite(s_depth)

    # On pad-pool overflow some tiles miss their padding, so the aligned
    # layout assumption breaks; clamp starts in-range (memory safety) and
    # report. Without overflow the clamp is the identity.
    aligned = counts + pad_needed
    seg_incl = jnp.cumsum(aligned)
    seg_starts = (seg_incl - aligned).astype(jnp.int32)
    seg_starts = jnp.minimum(
        seg_starts, jnp.maximum(total - aligned.astype(jnp.int32), 0)
    )
    overflow = overflow | pad_overflow
    pairs = PairBuffer(
        tile_id=s_tile,
        depth=s_depth,
        gauss_id=s_gid,
        valid=pair_valid,
        starts=seg_starts,
        ends=(seg_starts + counts).astype(jnp.int32),
        num_rendered=num_rendered,
        overflow=overflow,
    )
    segs = AlignedSegments(
        gauss_id=s_gid,
        valid=pairs.valid,
        starts=seg_starts,
        counts=counts,
        orig_slot=s_slot,
        gauss_offsets=gauss_offsets,
    )
    return pairs, segs


# ---------------------------------------------------------------------------
# Gather-only payload gradient
# ---------------------------------------------------------------------------
#
# The blend payload is table[gauss_id] over the sorted pair list; its natural
# VJP is a scatter-add of millions of conflicting rows — and TPU scatters run
# at ~1/10 the (already modest) row-gather rate. Instead: route the payload
# cotangent back to *pre-sort* slot order (where each Gaussian's pairs are
# contiguous) by CARRYING the cotangent columns through one sort keyed on the
# saved pre-sort slot index, then reduce each Gaussian's contiguous range
# with a prefix sum and a [P]-row gather. The carry-sort beats the
# permutation-inversion alternative (int sort + row gather) ~2x on TPU
# because the cotangent arrives feature-major from the Pallas kernel and a
# row-gather of a feature-major array strides across lanes, while each
# feature column is a contiguous vector the sort moves at full bandwidth.
# This replaces the reference's atomicAdd accumulation (backward.cu:561-592)
# with an entirely sort/scan-shaped — and still deterministic — reduction.


def _carry_sort_segment_reduce(orig_slot, d_out, offsets, capacity,
                               grad_cols, carry_bf16):
    """The shared backward: unsort pair cotangents to pre-sort (Gaussian-
    contiguous) order by carrying them through one sort keyed on the slot,
    then reduce each Gaussian's contiguous range with an MXU-blocked prefix
    sum and one [P]-row gather. Returns d_table [P, F]."""
    F, C = d_out.shape
    cap = C if capacity is None else min(capacity, C)
    ncols = F if grad_cols is None else min(grad_cols, F)
    if carry_bf16:
        cols = [d_out[j] for j in range(ncols)]
        if len(cols) % 2:
            cols.append(jnp.zeros_like(cols[0]))

        def pack(a, b):
            ha = jax.lax.bitcast_convert_type(
                a.astype(jnp.bfloat16), jnp.uint16
            ).astype(jnp.uint32)
            hb = jax.lax.bitcast_convert_type(
                b.astype(jnp.bfloat16), jnp.uint16
            ).astype(jnp.uint32)
            return ((ha << 16) | hb).astype(jnp.int32)

        carriers = [pack(a, b) for a, b in zip(cols[0::2], cols[1::2])]
        sorted_packed = jax.lax.sort(
            tuple([orig_slot] + carriers), num_keys=1
        )

        def unpack(c):
            u = c.astype(jnp.uint32)
            hi = jax.lax.bitcast_convert_type(
                (u >> 16).astype(jnp.uint16), jnp.bfloat16
            )
            lo = jax.lax.bitcast_convert_type(
                (u & 0xFFFF).astype(jnp.uint16), jnp.bfloat16
            )
            return hi.astype(jnp.float32), lo.astype(jnp.float32)

        sorted_cols = [sorted_packed[0]]
        for c in sorted_packed[1:]:
            sorted_cols.extend(unpack(c))
        sorted_cols = sorted_cols[: 1 + ncols]
    else:
        sorted_cols = jax.lax.sort(
            tuple([orig_slot] + [d_out[j] for j in range(ncols)]),
            num_keys=1,
        )
    # Feature-major [ncols, cap]: the stack is a cheap concat of contiguous
    # columns, and the prefix scan rides the MXU-blocked cumsum along lanes
    # (jnp.cumsum here measured ~10 ms at 1080p/500K; see ops/scan.py).
    d_un = jnp.stack([c[:cap] for c in sorted_cols[1:]], axis=0)
    d_un = jax.lax.optimization_barrier(d_un)
    cs0 = jnp.pad(cumsum_mxu(d_un), ((0, 0), (1, 0)))  # [ncols, cap+1]
    # Materialize row-major before the gather (barrier keeps XLA from
    # fusing the transpose into a strided-lane gather).
    cs0 = jax.lax.optimization_barrier(cs0.T)
    offsets = jnp.minimum(offsets, cap)  # overflowed pairs were dropped
    # prev[g] == offsets[g-1], so one gather + a shift covers both
    # segment edges (saves a second [P, F] gather).
    cs_at = cs0[offsets]
    d_table = cs_at - jnp.concatenate(
        [jnp.zeros((1, ncols), d_out.dtype), cs_at[:-1]], axis=0
    )
    if ncols < F:
        d_table = jnp.pad(d_table, ((0, 0), (0, F - ncols)))
    return d_table




# ---------------------------------------------------------------------------
# Packed forward payload (f16 pair carriers)
# ---------------------------------------------------------------------------
#
# The pair-domain row gather's cost scales with the COLUMN count (measured,
# benchmarks/sort_micro.py round 5: 9 cols 11.8 ns/row vs 5 cols 4.8 at
# 3.24M rows) — the TPU analog of the reference economizing its sort to one
# 64-bit key (rasterizer_impl.cu:344-362). Packing the 8 low-sensitivity
# GLOBAL payload features (conic a/b/c, opacity, r/g/b, depth) into 4
# f16-pair carriers shrinks the gather from 10 to 6 columns; x/y stay f32
# (pixel coordinates up to 1920 would lose sub-pixel precision in 16 bits).
# f16 (not bf16): 11-bit mantissa keeps the relative rounding ~5e-4 — the
# conic rides the Gaussian exponent, where bf16's 4e-3 would move alphas
# visibly. All values are range-safe: conic entries are bounded by the 0.3
# dilation (<= 3.33), colors/opacity are O(1), depths are scene units
# << 65504 (f16 max).
#
# The pack lives INSIDE the gather's custom fwd (pack in the cheap [P]
# domain -> 6-column gather -> unpack fused into the gather's consumer), so
# the op's primal output and cotangent stay in the UNPACKED basis and the
# carry-sort VJP is untouched: gradients are w.r.t. the f16-rounded forward
# values, applied to the f32 master parameters (standard mixed precision).


def pack_table_f16(table, span):
    """Pack table columns [span[0], span[1]) (even count) into f16 pairs.

    [P, F] -> [P, F - n/2] with column j pairing (lo+2j, lo+2j+1)."""
    lo, hi = span
    f16 = table[:, lo:hi].astype(jnp.float16)
    u = jax.lax.bitcast_convert_type(f16, jnp.uint16).astype(jnp.uint32)
    packed_u = (u[:, 0::2] | (u[:, 1::2] << 16)).astype(jnp.uint32)
    packed = jax.lax.bitcast_convert_type(packed_u, jnp.float32)
    return jnp.concatenate([table[:, :lo], packed, table[:, hi:]], axis=1)


def unpack_rows_f16(out_p, span, total_rows):
    """Invert pack_table_f16 on the transposed gather output.

    out_p [F', C] feature-major with rows [lo, lo+n/2) packed; returns
    [total_rows, C] with the original row layout."""
    lo, hi = span
    n2 = (hi - lo) // 2
    u = jax.lax.bitcast_convert_type(out_p[lo:lo + n2], jnp.uint32)
    a = jax.lax.bitcast_convert_type(
        (u & 0xFFFF).astype(jnp.uint16), jnp.float16
    ).astype(jnp.float32)
    b = jax.lax.bitcast_convert_type(
        (u >> 16).astype(jnp.uint16), jnp.float16
    ).astype(jnp.float32)
    inter = jnp.stack([a, b], axis=1).reshape(hi - lo, out_p.shape[1])
    out = jnp.concatenate([out_p[:lo], inter, out_p[lo + n2:]], axis=0)
    assert out.shape[0] == total_rows
    return out


@functools.lru_cache(maxsize=None)
def make_segment_gather(capacity=None, grad_cols=None, carry_bf16=False,
                        pack_fwd_span=None):
    """Build (and cache) the transposed gather op for one static config.

    Returns ``table[gauss_id].T`` — feature-major [F, C], the layout the
    blend kernels consume — so the backward receives its cotangent
    feature-major too and every carried column is a contiguous slice.

    ``capacity`` is the number of *real* pair slots: pre-sort slots
    >= capacity are the alignment-padding block appended by
    build_pairs_aligned, whose cotangents are identically zero — restricting
    the backward to [:capacity] cuts the scan by the padding fraction
    (~30% at production sizes). None means no bound.

    ``grad_cols`` (static) limits the backward to the first N table columns;
    the rest are stop-gradient features (e.g. the depth column) whose
    cotangents are identically zero and need not ride the sort/scan.

    ``carry_bf16`` (static, opt-in) rounds the pair cotangents to bfloat16
    and packs them in PAIRS into int32 carriers before the unsort — the
    carry-sort's cost is per-operand, so 9 f32 columns become 5 packed ones
    (measured ~1.7x on the backward's dominant stage). Mixed-precision
    gradients in the standard deep-learning sense: the per-Gaussian
    reduction and everything downstream stay f32.

    ``pack_fwd_span`` (static, opt-in) packs that column span into f16
    pairs across the gather (see pack_table_f16): fewer gathered columns,
    same unpacked output basis.
    """

    def _do_gather(table, gauss_id):
        if pack_fwd_span is None:
            return table[gauss_id].T
        out_p = pack_table_f16(table, pack_fwd_span)[gauss_id].T
        return unpack_rows_f16(out_p, pack_fwd_span, table.shape[1])

    @jax.custom_vjp
    def gather(table, gauss_id, orig_slot, gauss_offsets):
        return _do_gather(table, gauss_id)

    def gather_fwd(table, gauss_id, orig_slot, gauss_offsets):
        return _do_gather(table, gauss_id), (orig_slot, gauss_offsets)

    def gather_bwd(res, d_out):
        import numpy as np

        orig_slot, offsets = res
        d_table = _carry_sort_segment_reduce(
            orig_slot, d_out, offsets, capacity, grad_cols, carry_bf16
        )

        def int0(x):
            return np.zeros(x.shape, dtype=jax.dtypes.float0)

        return d_table, int0(orig_slot), int0(orig_slot), int0(offsets)

    gather.defvjp(gather_fwd, gather_bwd)
    return gather


def segment_gather(table, gauss_id, orig_slot, gauss_offsets, capacity=None,
                   grad_cols=None, carry_bf16=False, pack_fwd_span=None):
    """table[gauss_id].T (feature-major) with a carry-sort-and-scan VJP."""
    return make_segment_gather(capacity, grad_cols, carry_bf16,
                               pack_fwd_span)(
        table, gauss_id, orig_slot, gauss_offsets
    )


def recon_table_columns(prep: PreprocessOutput):
    """[P, 2] f32-bitcast recon columns: (pair base offset, packed rect).

    Appended to a payload table, they let the segment gather reconstruct
    each pair's pre-sort slot after the fact (make_segment_gather_recon), so
    the forward sort needs not carry the slot operand. Packing bounds:
    rect mins and width each < 1024 tiles (16K pixels/axis at 16px tiles).
    """
    offsets = jnp.cumsum(prep.tiles_touched).astype(jnp.int32)
    base = jnp.concatenate([jnp.zeros((1,), jnp.int32), offsets[:-1]])
    width = jnp.maximum(prep.rect_max[:, 0] - prep.rect_min[:, 0], 1)
    packed = (
        (prep.rect_min[:, 0] << 20)
        | (prep.rect_min[:, 1] << 10)
        | width
    ).astype(jnp.int32)
    cols = jnp.stack([base, packed], axis=1)
    # Exact-f32 convert transport ([P, 4]: hi halves then lo halves) — see
    # _i32_to_f32_exact for why bitcasts must not ride float gathers.
    return _i32_to_f32_exact(cols)


@functools.lru_cache(maxsize=None)
def make_segment_gather_recon(capacity, grid_x, grad_cols=None,
                              carry_bf16=False, pack_fwd_span=None):
    """segment_gather without a carried slot operand.

    The forward sort's dominant cost is per carried operand (measured
    ~2.5-3 ms per operand at 3.2M pairs); the pre-sort slot index it used
    to carry for the backward unsort is reconstructible instead: the
    expansion maps slot i to (gaussian g, tile ty*grid_x+tx) via
    ``local = i - base[g]; ty = rmin_y + local // w; tx = rmin_x + local %
    w`` (expand_pairs), so ``slot = base[g] + (ty - rmin_y[g]) * w[g] +
    (tx - rmin_x[g])`` — and base/rect ride the payload gather for free
    (TPU row gathers cost per row, not per byte; recon_table_columns).

    Preconditions (enforced at the call site in render/pipeline.py):
    no tile-based culling (culled pairs would leave slot holes that break
    the segment reduction), grids <= 1024 tiles per axis (packing). The
    forward is bitwise-identical to the carried-slot path (lax.sort is
    stable, so dropping a carried operand cannot change the order); the
    backward matches up to float-summation blocking (the two recon rows
    change the MXU cumsum tiling — observed 1-ulp differences).

    ``s_tile``/``pair_valid`` are the sorted tile ids and validity mask;
    invalid and alignment-padding entries get the ``capacity`` sentinel
    slot, which sorts past every real slot and is dropped by the backward's
    [:capacity] bound exactly like the padding block used to be.
    """

    def _do_gather(table, gauss_id):
        if pack_fwd_span is None:
            return table[gauss_id].T
        out_p = pack_table_f16(table, pack_fwd_span)[gauss_id].T
        return unpack_rows_f16(out_p, pack_fwd_span, table.shape[1])

    @jax.custom_vjp
    def gather(table, gauss_id, s_tile, pair_valid, gauss_offsets):
        return _do_gather(table, gauss_id)

    def _slot_from(out_t, s_tile, pair_valid):
        ints = _f32_exact_to_i32(out_t[-4:].T)
        base, packed = ints[:, 0], ints[:, 1]
        rmin_x = packed >> 20
        rmin_y = (packed >> 10) & 0x3FF
        w = packed & 0x3FF
        tx = s_tile % grid_x
        ty = s_tile // grid_x
        local = (ty - rmin_y) * w + (tx - rmin_x)
        return jnp.where(pair_valid, base + local, capacity).astype(jnp.int32)

    def gather_fwd(table, gauss_id, s_tile, pair_valid, gauss_offsets):
        out_t = _do_gather(table, gauss_id)
        return out_t, (_slot_from(out_t, s_tile, pair_valid), gauss_offsets)

    def gather_bwd(res, d_out):
        import numpy as np

        slot, offsets = res
        d_table = _carry_sort_segment_reduce(
            slot, d_out, offsets, capacity, grad_cols, carry_bf16
        )

        def int0(x):
            return np.zeros(x.shape, dtype=jax.dtypes.float0)

        return (d_table, int0(slot), int0(slot), int0(slot), int0(offsets))

    gather.defvjp(gather_fwd, gather_bwd)
    return gather


@functools.lru_cache(maxsize=None)
def make_slot_gather(capacity: int, grad_cols=None, carry_bf16=False):
    """Pair-domain table gather ``table[slot].T`` with a carry-sort-only VJP.

    make_segment_gather's sibling for the ring-streamed pipeline
    (parallel/ring.py): the table rows there are *pair* records in
    accumulation order, so every row is referenced at most once and the
    backward is just the unsort — an ascending-slot carry-sort, with no
    per-Gaussian segment reduction (that reduction happens inside the ring
    scan's backward, where each step's pairs are Gaussian-contiguous).

    ``capacity`` is the table row count: slots >= capacity (the alignment
    padding block) clamp in the forward gather (their columns are never
    blended) and their cotangents sort past ``capacity`` and are dropped.
    """

    @jax.custom_vjp
    def gather(table, slot):
        return table[slot].T

    def gather_fwd(table, slot):
        return table[slot].T, slot

    def gather_bwd(slot, d_out):
        import numpy as np

        F, C = d_out.shape
        ncols = F if grad_cols is None else min(grad_cols, F)
        if carry_bf16:
            cols = [d_out[j] for j in range(ncols)]
            if len(cols) % 2:
                cols.append(jnp.zeros_like(cols[0]))

            def pack(a, b):
                ha = jax.lax.bitcast_convert_type(
                    a.astype(jnp.bfloat16), jnp.uint16
                ).astype(jnp.uint32)
                hb = jax.lax.bitcast_convert_type(
                    b.astype(jnp.bfloat16), jnp.uint16
                ).astype(jnp.uint32)
                return ((ha << 16) | hb).astype(jnp.int32)

            carriers = [pack(a, b) for a, b in zip(cols[0::2], cols[1::2])]
            sorted_packed = jax.lax.sort(
                tuple([slot] + carriers), num_keys=1
            )

            def unpack(c):
                u = c.astype(jnp.uint32)
                hi = jax.lax.bitcast_convert_type(
                    (u >> 16).astype(jnp.uint16), jnp.bfloat16
                )
                lo = jax.lax.bitcast_convert_type(
                    (u & 0xFFFF).astype(jnp.uint16), jnp.bfloat16
                )
                return hi.astype(jnp.float32), lo.astype(jnp.float32)

            sorted_cols = [sorted_packed[0]]
            for c in sorted_packed[1:]:
                sorted_cols.extend(unpack(c))
            sorted_cols = sorted_cols[: 1 + ncols]
        else:
            sorted_cols = jax.lax.sort(
                tuple([slot] + [d_out[j] for j in range(ncols)]),
                num_keys=1,
            )
        d_rows = jnp.stack(
            [c[:capacity] for c in sorted_cols[1:]], axis=1
        )  # [capacity, ncols] row-major, accumulation order
        if ncols < F:
            d_rows = jnp.pad(d_rows, ((0, 0), (0, F - ncols)))

        def int0(x):
            return np.zeros(x.shape, dtype=jax.dtypes.float0)

        return d_rows, int0(slot)

    gather.defvjp(gather_fwd, gather_bwd)
    return gather


def align_segments(
    pairs: PairBuffer, num_tiles: int, capacity_out: int, align: int = 128
) -> AlignedSegments:
    """Re-index the sorted pair list into align-padded per-tile segments.

    ``capacity_out`` must be >= capacity + num_tiles * align (static).
    """
    counts = (pairs.ends - pairs.starts).astype(jnp.int32)
    aligned = ((counts + align - 1) // align) * align
    incl = jnp.cumsum(aligned)
    seg_starts = (incl - aligned).astype(jnp.int32)

    s = jnp.arange(capacity_out, dtype=jnp.int32)
    t = jnp.clip(rank_expand(incl, capacity_out), 0, num_tiles - 1)

    tile_tab = jnp.stack([seg_starts, pairs.starts, counts], axis=1)  # [T, 3]
    tg = tile_tab[t]
    off = s - tg[:, 0]
    valid = off < tg[:, 2]
    src = jnp.clip(tg[:, 1] + off, 0, pairs.gauss_id.shape[0] - 1)
    return AlignedSegments(
        gauss_id=pairs.gauss_id[src],
        valid=valid,
        starts=seg_starts,
        counts=counts,
    )
