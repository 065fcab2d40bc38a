"""Pallas TPU kernel: PER_PIXEL_FULL sort-mode tile blend (forward only).

TPU-native re-architecture of the reference's exact-sort oracle renderer
(renderSortedFullCUDA, resorted_render.cuh:474-675). The CUDA version walks
each pixel's tile range through a cub::BlockRadixSort and blends on a single
thread — an O(pixels x range) oracle. Here the whole per-pixel sort is a
data-parallel in-VMEM computation with no sequential blend at all:

  1. stage the tile's pair segment and evaluate (exact per-ray depth, alpha,
     rgb) per (pair, pixel) into five [SEG_FULL, lanes] VMEM planes
     (pairs on sublanes, a half-tile of 128 pixels on lanes);
  2. sort the planes along the sublane axis with a per-lane bitonic network
     (each pixel's column is an independent sort; compare-exchange is plain
     vector select, log^2(SEG_FULL) stages);
  3. blend with the masked log-space prefix-product (the same formulation as
     render/naive.py::blend_prefix): U = T-prefix via cumsum of log1p(-a),
     commit = U >= T_THRESHOLD (the done latch via monotonicity), and all
     color/depth accumulations become column reductions.

Two half-tile passes (128 lanes each) keep the five planes inside VMEM at
SEG_FULL up to 4096. Segments longer than SEG_FULL are truncated (the caller
reports an overflow flag); like the reference, this mode has no backward
(backward.cu:733-736 throws) — the differentiable naive oracle remains in
render/naive.py for small scenes.

Tie handling: the bitonic network is not stable, so pairs at exactly equal
per-ray depth may blend in either order (the naive oracle uses a stable
argsort). Real scenes have no exact float-depth ties.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import T_THRESHOLD, TILE_PIXELS
from .kbuffer_blend import (
    KB_PAYLOAD_F,
    _chunk_alpha_depth,
    _tile_pixels_sublanes,
    _view_rays,
)

N_PLANES = 5  # key(d_head), alpha, r, g, b

# Above this size the unrolled network's traced-op count (log^2(n)/2 stages
# x N_PLANES selects on [n, L] vectors) blows up Mosaic compile time to tens
# of minutes; the looped form traces ONE stage body and drives (k, s) as
# loop-carried scalars via dynamic-shift rolls.
_BITONIC_LOOP_MIN = 256


def _bitonic_planes_looped(planes, n, descending=False):
    """Bitonic sort of the plane list by planes[0], loop-based.

    Same network as _bitonic_planes, expressed as two nested fori_loops
    (phase p: k = 2^p; inner j: s = 2^(p-1-j)) so the compare-exchange body
    is traced exactly once. The XOR-partner x[i^s] is materialised as two
    dynamic-shift pltpu.rolls selected by (i & s) == 0 — Mosaic's dynamic
    sublane gather spans only one vreg, but rolls have no such limit; the
    circular wrap never crosses an aligned 2s block for power-of-two n.
    """
    L = planes[0].shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, L), 0)
    log2n = n.bit_length() - 1

    def stage(k, s, planes):
        keep_lo = (iota & s) == 0
        asc = (iota & k) == 0
        if descending:
            asc = ~asc
        key = planes[0]
        kp = jnp.where(
            keep_lo, pltpu.roll(key, -s, 0), pltpu.roll(key, s, 0)
        )
        want_min = ~(asc ^ keep_lo)
        take = (want_min & (kp < key)) | (~want_min & (kp > key))
        out = [jnp.where(take, kp, key)]
        for p in planes[1:]:
            pp = jnp.where(
                keep_lo, pltpu.roll(p, -s, 0), pltpu.roll(p, s, 0)
            )
            out.append(jnp.where(take, pp, p))
        return out

    def phase(p, planes):
        k = jnp.int32(1) << p

        def inner(j, planes):
            s = jnp.int32(1) << (p - 1 - j)
            return stage(k, s, planes)

        return jax.lax.fori_loop(0, p, inner, planes)

    return jax.lax.fori_loop(1, log2n + 1, phase, planes)


def _bitonic_planes(planes, n, descending=False):
    """Sort the plane list by planes[0] along axis 0, per-lane independent.

    Textbook bitonic network: for phase k, stride s, partner i^s, ascending
    iff (i & k) == 0 — constant within each aligned 2s block, so every stage
    is a reshape + masked swap of contiguous half-blocks. `descending`
    inverts every stage's direction (there is no TPU lowering for lax.rev,
    so callers needing a descending batch sort it directly).

    Every compare/select runs on 2D ``(rows, L)`` views: Mosaic cannot lower
    3D i1 vectors (``arith.trunci vector<MxSxLxi8> -> i1`` is unsupported),
    so the [m, s, L] half-block tensors are collapsed to [m*s, L] before any
    boolean op, and the per-block ascending flag is materialised row-wise
    from a 2D iota instead of a [m, 1, 1] broadcast.

    Large n dispatches to the looped form (see _bitonic_planes_looped):
    the unrolled network's compile time is quadratic-log in n and crosses
    from seconds into tens of minutes past a few hundred rows.
    """
    if n >= _BITONIC_LOOP_MIN:
        return _bitonic_planes_looped(planes, n, descending)
    L = planes[0].shape[1]
    k = 2
    while k <= n:
        s = k // 2
        while s >= 1:
            m = n // (2 * s)
            rows = m * s

            def lohi(x):
                xr = x.reshape(m, 2, s, L)
                return (
                    xr[:, 0].reshape(rows, L),
                    xr[:, 1].reshape(rows, L),
                )

            lo, hi = lohi(planes[0])  # [m*s, L] each
            row = jax.lax.broadcasted_iota(jnp.int32, (rows, L), 0)
            blk = row // s  # block index; element index = blk * 2s + ...
            asc = ((blk * (2 * s)) & k) == 0
            if descending:
                asc = ~asc
            # NOT jnp.where(asc, lo>hi, lo<hi): a select with boolean
            # result operands lowers to an i8->i1 arith.trunci that Mosaic
            # rejects ("Unsupported target bitwidth for truncation"); plain
            # logical ops stay on native i1 predicates.
            swap = (asc & (lo > hi)) | (~asc & (lo < hi))
            out = []
            for p in planes:
                plo, phi = lohi(p)
                nlo = jnp.where(swap, phi, plo)
                nhi = jnp.where(swap, plo, phi)
                out.append(
                    jnp.concatenate(
                        [nlo.reshape(m, s, L), nhi.reshape(m, s, L)],
                        axis=1,
                    ).reshape(n, L)
                )
            planes = out
            s //= 2
        k *= 2
    return planes


def _cumsum_rows(x):
    """Inclusive cumsum along axis 0 by log-doubling shifts."""
    n, L = x.shape
    s = 1
    while s < n:
        x = x + jnp.concatenate(
            [jnp.zeros((s, L), x.dtype), x[:-s]], axis=0
        )
        s *= 2
    return x


def _fwd_kernel(
    starts_ref, counts_ref, bg_ref, cam_ref,  # scalar prefetch (SMEM)
    payload_ref,                              # HBM [32, C_pad]
    out_ref,                                  # VMEM [1, 8, 256]
    buf, planes, sems,                        # scratch
    *, seg_full: int, chunk: int, grid_x: int, width: int, height: int,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    rounds = pl.cdiv(jnp.minimum(count, seg_full), chunk)
    tx = t % grid_x
    ty = t // grid_x
    pixf_x, pixf_y = _tile_pixels_sublanes(tx, ty)  # [256, 1]

    def get_dma(slot, kk):
        offset = pl.multiple_of(start + kk * chunk, chunk)
        return pltpu.make_async_copy(
            payload_ref.at[:, pl.ds(offset, chunk)], buf.at[slot],
            sems.at[slot],
        )

    for h in (0, 1):  # two half-tile passes of 128 pixels each
        px_h = pixf_x[h * 128:(h + 1) * 128]  # [128, 1]
        py_h = pixf_y[h * 128:(h + 1) * 128]
        vd_h = _view_rays(cam_ref, px_h, py_h, width, height)

        planes[0] = jnp.full((seg_full, 128), jnp.inf)
        for p in range(1, N_PLANES):
            planes[p] = jnp.zeros((seg_full, 128), jnp.float32)

        @pl.when(rounds > 0)
        def _():
            get_dma(0, 0).start()

        def stage(kk, _):
            slot = kk % 2

            @pl.when(kk + 1 < rounds)
            def _():
                get_dma((kk + 1) % 2, kk + 1).start()

            get_dma(slot, kk).wait()
            data = buf[slot]
            a_all, depth = _chunk_alpha_depth(
                data, px_h, py_h, vd_h, count - kk * chunk
            )  # [128, CH] each (half-tile pixels on sublanes)
            key = jnp.where(a_all > 0.0, depth, jnp.inf)
            off = pl.multiple_of(kk * chunk, chunk)
            planes[0, pl.ds(off, chunk), :] = key.T
            planes[1, pl.ds(off, chunk), :] = a_all.T
            for c in range(3):
                planes[2 + c, pl.ds(off, chunk), :] = jnp.broadcast_to(
                    data[6 + c:7 + c, :].T, (chunk, 128)
                )
            return 0

        jax.lax.fori_loop(0, rounds, stage, 0)

        key, a, r, g, b = _bitonic_planes(
            [planes[p] for p in range(N_PLANES)], seg_full
        )

        # Masked-cumprod blend, identical math to naive.blend_prefix.
        logU = _cumsum_rows(jnp.log1p(-a))
        U = jnp.exp(logU)                       # inclusive transmittance
        T_before = jnp.concatenate(
            [jnp.ones((1, 128), jnp.float32), U[:-1]], axis=0
        )
        commit = U >= T_THRESHOLD
        w = a * T_before * commit.astype(jnp.float32)
        Cr = jnp.sum(w * r, axis=0, keepdims=True)        # [1, 128]
        Cg = jnp.sum(w * g, axis=0, keepdims=True)
        Cb = jnp.sum(w * b, axis=0, keepdims=True)
        D = jnp.sum(w * jnp.where(jnp.isfinite(key), key, 0.0), axis=0,
                    keepdims=True)
        T_fin = jnp.min(
            jnp.where(commit, U, jnp.inf), axis=0, keepdims=True
        )
        T_fin = jnp.minimum(T_fin, 1.0)
        contributed = commit & (a > 0.0)
        pos = jax.lax.broadcasted_iota(jnp.int32, (seg_full, 128), 0) + 1
        nc = jnp.max(jnp.where(contributed, pos, 0), axis=0, keepdims=True)

        out_ref[0, :, pl.ds(h * 128, 128)] = jnp.concatenate(
            [
                Cr + T_fin * bg_ref[0],
                Cg + T_fin * bg_ref[1],
                Cb + T_fin * bg_ref[2],
                T_fin,
                nc.astype(jnp.float32),
                D,
                jnp.zeros((2, 128), jnp.float32),
            ],
            axis=0,
        )


def blend_full_forward(
    payload: jnp.ndarray,   # [32, C_pad] f32 feature-major (kbuffer layout)
    starts: jnp.ndarray,    # [T] int32 (chunk-aligned)
    counts: jnp.ndarray,    # [T] int32
    bg: jnp.ndarray,        # [3] f32
    cam: jnp.ndarray,       # [19] f32: inverse_vp flat (16) + campos (3)
    *,
    grid_x: int,
    grid_y: int,
    width: int,
    height: int,
    seg_full: int = 2048,
    chunk: int = 128,
    interpret: bool = False,
):
    """Run the exact full-sort forward blend. Returns packed [T, 8, 256].

    ``seg_full`` (power of two, multiple of chunk) bounds the per-tile pair
    count; longer segments are truncated — check counts > seg_full upstream.
    """
    assert seg_full & (seg_full - 1) == 0, "seg_full must be a power of two"
    assert seg_full % chunk == 0
    num_tiles = grid_x * grid_y
    kernel = functools.partial(
        _fwd_kernel, seg_full=seg_full, chunk=chunk, grid_x=grid_x,
        width=width, height=height,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 8, TILE_PIXELS), lambda t, *_: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, KB_PAYLOAD_F, chunk), jnp.float32),
            pltpu.VMEM((N_PLANES, seg_full, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (num_tiles, 8, TILE_PIXELS), jnp.float32
        ),
        grid_spec=grid_spec,
        # The plane scratch is 5 x seg_full x 128 f32 (10.5 MB at 4096) and
        # each bitonic stage holds a few plane-sized temporaries; the 16 MB
        # default scoped-vmem budget is too tight above seg_full ~1024.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(starts, counts, bg, cam, payload)
