"""Pallas TPU kernel: GLOBAL sort-mode tile blend, forward.

TPU-native re-architecture of the reference's renderCUDA (forward.cu:234-366):

  * one Pallas grid step per 16x16 tile (the CUDA block) — but instead of 256
    threads each running a sequential early-exit blend loop, the whole tile is
    blended with vectorized chunk math: alphas for a [256 pixels x CH
    gaussians] block at once (pixels on the sublane axis, gaussians on the
    lane axis);
  * the front-to-back transmittance recurrence becomes an inclusive prefix
    product computed in log space with a triangular matmul on the MXU
    (cumsum along lanes = X @ U, U upper-triangular ones) — mathematically
    identical to the sequential loop (see render/naive.py for the
    masked-cumprod equivalence argument);
  * the CUDA __shared__ staging of 256 Gaussians (forward.cu:271-302) maps to
    a VMEM double buffer fed by async DMA from the sorted pair payload in
    HBM, with per-tile dynamic trip counts (no wasted fetches on short
    tiles).

Payload layout (feature-major so chunk DMAs slice the 128-aligned lane axis):
  payload [16, C_padded] float32, rows =
    0 xy.x | 1 xy.y | 2 conic.a | 3 conic.b | 4 conic.c | 5 opacity |
    6 r | 7 g | 8 b | 9 depth | 10.. zero padding
Output: [num_tiles, 8, 256] packed rows =
  (r, g, b, final_T, n_contrib, depth_acc, 0, 0), pixels row-major within the
  tile; depth_acc = sum(depth * alpha * T), the reference's Depth debug
  visualization accumulator (stopthepop_common.cuh:277-298), rides in the
  color matmul for free and is non-differentiable (its cotangent is ignored).
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
    T_THRESHOLD,
    TILE_PIXELS,
    TILE_X,
    TILE_Y,
)

PAYLOAD_F = 16  # payload feature rows (padded to a friendly sublane count)


def _upper_tri(ch: int, dtype=jnp.float32):
    """M[i, j] = 1 iff i <= j, so (x @ M) is an inclusive cumsum over lanes."""
    row = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 1)
    return (row <= col).astype(dtype)


def _tile_pixel_coords(tx, ty, tile_x=TILE_X, tile_y=TILE_Y):
    """(pixf_x, pixf_y) [tile_pixels, 1] for in-tile row-major pixel order."""
    j = jax.lax.broadcasted_iota(jnp.int32, (tile_x * tile_y, 1), 0)
    pixf_x = (tx * tile_x + j % tile_x).astype(jnp.float32)
    pixf_y = (ty * tile_y + j // tile_x).astype(jnp.float32)
    return pixf_x, pixf_y


def _chunk_alpha(data, pixf_x, pixf_y, count_rem):
    """Effective alphas for one payload chunk.

    data [16, CH] payload columns; rows past ``count_rem`` are padding.
    Returns eff [256, CH]. Matches forward.cu:312-325 (skip if factor < 0,
    clamp at 0.99, skip if alpha < 1/255).
    """
    ch = data.shape[1]
    dx = data[0:1, :] - pixf_x  # [256, CH]
    dy = data[1:2, :] - pixf_y
    a = data[2:3, :]
    b = data[3:4, :]
    c = data[4:5, :]
    opw = data[5:6, :]
    factor = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, opw * jnp.exp(-factor))
    col = jax.lax.broadcasted_iota(jnp.int32, (1, ch), 1)
    ok = (factor >= 0.0) & (alpha >= ALPHA_THRESHOLD) & (col < count_rem)
    return jnp.where(ok, alpha, 0.0)


def _blend_chunk(eff, tri, T_carry):
    """Prefix-product transmittance for one chunk (lanes = gaussians).

    Returns (U inclusive [256, CH], T_before exclusive, commit mask,
    T_new [256, 1]).
    """
    logu = jnp.dot(eff_log := jnp.log1p(-eff), tri, preferred_element_type=jnp.float32)
    del eff_log  # clarity: logu = log1p(-eff) @ tri
    U = T_carry * jnp.exp(logu)
    T_before = U / (1.0 - eff)  # eff <= 0.99 so the division is safe
    commit = U >= T_THRESHOLD
    T_new = jnp.minimum(
        T_carry, jnp.min(jnp.where(commit, U, jnp.inf), axis=1, keepdims=True)
    )
    return U, T_before, commit, T_new


def _fwd_kernel(
    starts_ref, counts_ref,          # scalar prefetch (SMEM)
    payload_ref,                     # HBM [16, C_pad]
    out_ref,                         # VMEM block [1, 8, 256]
    buf, sems,                       # scratch: [2, 16, CH] VMEM, 2 DMA sems
    *, chunk: int, grid_x: int, tile_x: int, tile_y: int,
):
    tp = tile_x * tile_y
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    rounds = pl.cdiv(count, chunk)
    tx = t % grid_x
    ty = t // grid_x
    pixf_x, pixf_y = _tile_pixel_coords(tx, ty, tile_x, tile_y)
    tri = _upper_tri(chunk)

    def get_dma(slot, k):
        # Segment starts are 128-aligned by construction (align_segments);
        # the hint lets Mosaic prove the lane-axis slice is tile-aligned.
        offset = pl.multiple_of(start + k * chunk, 128)
        return pltpu.make_async_copy(
            payload_ref.at[:, pl.ds(offset, chunk)],
            buf.at[slot],
            sems.at[slot],
        )

    @pl.when(rounds > 0)
    def _():
        get_dma(0, 0).start()

    def body(k, carry):
        T, C, nc = carry  # [256,1], [256,4], [256,1]
        slot = k % 2

        @pl.when(k + 1 < rounds)
        def _():
            get_dma((k + 1) % 2, k + 1).start()

        get_dma(slot, k).wait()
        data = buf[slot]  # [16, CH]
        eff = _chunk_alpha(data, pixf_x, pixf_y, count - k * chunk)
        U, T_before, commit, T_new = _blend_chunk(eff, tri, T)
        w = eff * T_before * commit  # [256, CH]
        C = C + jax.lax.dot_general(
            w, data[6:10, :],  # r, g, b, depth in one MXU pass
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        col = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        pos = (k * chunk + col + 1).astype(jnp.float32)
        contrib = commit & (eff > 0.0)
        nc = jnp.maximum(
            nc, jnp.max(jnp.where(contrib, pos, 0.0), axis=1, keepdims=True)
        )
        return T_new, C, nc

    # Early termination (forward.cu:331-335: contributors after every pixel
    # saturates change nothing): stop streaming chunks once max T < 1e-4.
    # The DMA for round k+1 is already in flight when round k decides to
    # stop; the post-loop wait retires it.
    def cond(carry):
        k, T, C, nc, done = carry
        return (k < rounds) & jnp.logical_not(done)

    def wbody(carry):
        k, T, C, nc, done = carry
        T_new, C_new, nc_new = body(k, (T, C, nc))
        done = jnp.max(T_new) < T_THRESHOLD
        return k + 1, T_new, C_new, nc_new, done

    k_end, T, C, nc, _ = jax.lax.while_loop(
        cond,
        wbody,
        (
            jnp.int32(0),
            jnp.ones((tp, 1), jnp.float32),
            jnp.zeros((tp, 4), jnp.float32),
            jnp.zeros((tp, 1), jnp.float32),
            jnp.bool_(False),
        ),
    )

    @pl.when(k_end < rounds)
    def _():
        get_dma(k_end % 2, k_end).wait()
    # Raw committed color — the background composite (+ final_T * bg)
    # happens outside the kernel in jnp, so bg needs no SMEM marshaling and
    # its gradient comes from plain autodiff.
    packed = jnp.concatenate(
        [
            C[:, 0:3],
            T,
            nc,
            C[:, 3:4],
            jnp.zeros((tp, 2), jnp.float32),
        ],
        axis=1,
    )  # [tp, 8]
    out_ref[0] = packed.T


def blend_global_forward(
    payload: jnp.ndarray,   # [16, C_pad] f32 (padded by >= chunk columns)
    starts: jnp.ndarray,    # [T] int32
    counts: jnp.ndarray,    # [T] int32
    *,
    grid_x: int,
    grid_y: int,
    chunk: int = 256,
    tile_x: int = TILE_X,
    tile_y: int = TILE_Y,
    interpret: bool = False,
):
    """Run the forward blend kernel. Returns packed [T, 8, tile_pixels] with
    RAW committed color (background not composited — done by the caller)."""
    num_tiles = grid_x * grid_y
    tp = tile_x * tile_y
    kernel = functools.partial(
        _fwd_kernel, chunk=chunk, grid_x=grid_x, tile_x=tile_x, tile_y=tile_y
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 8, tp), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, PAYLOAD_F, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((num_tiles, 8, tp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, counts, payload)


def unpack_image(packed, grid_x: int, grid_y: int, width: int, height: int,
                 tile_x: int = TILE_X, tile_y: int = TILE_Y):
    """[T, 8, tile_pixels] packed tiles -> (color [3, H, W], final_T [H, W],
    n_contrib [H, W] int32)."""
    t = packed.reshape(grid_y, grid_x, 8, tile_y, tile_x)
    full = jnp.transpose(t, (2, 0, 3, 1, 4)).reshape(
        8, grid_y * tile_y, grid_x * tile_x
    )
    color = full[0:3, :height, :width]
    final_t = full[3, :height, :width]
    n_contrib = full[4, :height, :width].astype(jnp.int32)
    depth_acc = full[5, :height, :width]
    return color, final_t, n_contrib, depth_acc


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------
#
# Re-derivation of the reference's GLOBAL backward render (backward.cu:437-595)
# for the masked-cumprod formulation. The reference replays the tile range
# BACK-to-front, reconstructing transmittance by division and accumulating
# per-Gaussian gradients with atomicAdd. Here ONE front-to-back replay
# suffices: the per-pixel totals the back-to-front walk would carry are
# already in the saved forward output —
#
#   S_tot  = C_raw . g   (committed color dot its cotangent)
#   T_final = packed[3]
#
# and the replay forms the suffix  S_i = S_tot - prefix_i  with a triangular
# matmul, emitting per-pair payload gradients:
#
#   dL/dalpha_i = m_i [ (c_i . g) T_before_i - (S_i + g_T T_final)/(1-alpha_i) ]
#
# (background compositing lives outside the kernel, so its contribution
# arrives folded into the final-transmittance cotangent g_T). Gradients are
# gated where the forward skipped (alpha < 1/255, factor < 0) and where the
# 0.99 clamp was active — matching jax.grad of the jnp oracle. Per-pair
# gradients are written to disjoint aligned segments (no atomics needed); the
# caller scatter-adds them to per-Gaussian arrays deterministically.

def _bwd_kernel(
    starts_ref, counts_ref,          # scalar prefetch
    payload_ref,                     # HBM [16, C_pad]
    grad_ref,                        # VMEM block [1, 8, 256] (packed cotangent)
    packed_ref,                      # VMEM block [1, 8, 256] (fwd output)
    dpay_ref,                        # HBM out [16, C_pad]
    buf, dbuf, sems, dsems,          # scratch
    *, chunk: int, grid_x: int, tile_x: int, tile_y: int,
):
    tp = tile_x * tile_y
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]
    rounds = pl.cdiv(count, chunk)
    tx = t % grid_x
    ty = t // grid_x
    pixf_x, pixf_y = _tile_pixel_coords(tx, ty, tile_x, tile_y)
    tri = _upper_tri(chunk)

    gp = grad_ref[0]                     # [8, 256]
    g_pix = gp[0:3, :].T                 # [256, 3] color cotangent
    gT = gp[3:4, :].T                    # [256, 1] final_T cotangent
    fwd = packed_ref[0]                  # [8, 256] saved forward output
    S_tot = jnp.sum(fwd[0:3, :].T * g_pix, axis=1, keepdims=True)  # [256, 1]
    T_final = fwd[3:4, :].T              # [256, 1]
    KT = gT * T_final                    # [256, 1]
    # Replay truncation (the reference walks back only to the last
    # contributor, backward.cu:480-489): every pair past the tile's max
    # n_contrib has either commit=0 or alpha below threshold, so its
    # gradient is identically zero — those rounds only need zero-fill.
    nc_max = jnp.max(fwd[4, :]).astype(jnp.int32)
    rounds_eff = pl.cdiv(jnp.minimum(nc_max, count), chunk)

    def get_dma(slot, k):
        offset = pl.multiple_of(start + k * chunk, 128)
        return pltpu.make_async_copy(
            payload_ref.at[:, pl.ds(offset, chunk)], buf.at[slot], sems.at[slot]
        )

    def put_dma(slot, k):
        offset = pl.multiple_of(start + k * chunk, 128)
        return pltpu.make_async_copy(
            dbuf.at[slot], dpay_ref.at[:, pl.ds(offset, chunk)], dsems.at[slot]
        )

    ones = jnp.ones((tp, 1), jnp.float32)
    zeros1 = jnp.zeros((tp, 1), jnp.float32)

    # ---- single replay pass: per-pair gradients ----
    @pl.when(rounds_eff > 0)
    def _():
        get_dma(0, 0).start()

    def body_b(k, carry):
        T, prefix = carry
        slot = k % 2

        @pl.when(k + 1 < rounds_eff)
        def _():
            get_dma((k + 1) % 2, k + 1).start()

        get_dma(slot, k).wait()
        # Make sure the staging buffer we are about to overwrite has been
        # flushed (its DMA was started two rounds ago).
        @pl.when(k >= 2)
        def _():
            put_dma(slot, k - 2).wait()

        data = buf[slot]
        ch = data.shape[1]
        dx = data[0:1, :] - pixf_x
        dy = data[1:2, :] - pixf_y
        a = data[2:3, :]
        b = data[3:4, :]
        c = data[4:5, :]
        opw = data[5:6, :]
        factor = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy
        alpha_raw = opw * jnp.exp(-factor)
        alpha = jnp.minimum(ALPHA_MAX, alpha_raw)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, ch), 1)
        ok = (factor >= 0.0) & (alpha >= ALPHA_THRESHOLD) & (col < count - k * chunk)
        eff = jnp.where(ok, alpha, 0.0)

        U, T_before, commit, T_new = _blend_chunk(eff, tri, T)
        w = eff * T_before * commit
        cdotg = jnp.dot(g_pix, data[6:9, :], preferred_element_type=jnp.float32)
        wc = w * cdotg
        prefix_incl = prefix + jnp.dot(
            wc, tri, preferred_element_type=jnp.float32
        )
        S = S_tot - prefix_incl
        galpha = commit * (
            cdotg * T_before - (S + KT) / (1.0 - eff)
        )
        gate = ok & (alpha_raw < ALPHA_MAX)
        galpha = jnp.where(gate, galpha, 0.0)
        dfactor = -eff * galpha
        d_xy_x = jnp.sum(dfactor * (a * dx + b * dy), axis=0, keepdims=True)
        d_xy_y = jnp.sum(dfactor * (c * dy + b * dx), axis=0, keepdims=True)
        d_a = jnp.sum(dfactor * 0.5 * dx * dx, axis=0, keepdims=True)
        d_b = jnp.sum(dfactor * dx * dy, axis=0, keepdims=True)
        d_c = jnp.sum(dfactor * 0.5 * dy * dy, axis=0, keepdims=True)
        d_opw = jnp.sum(
            galpha * eff / jnp.maximum(opw, 1e-12), axis=0, keepdims=True
        )
        d_rgb = jax.lax.dot_general(
            g_pix, w,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [3, CH]
        dbuf[slot] = jnp.concatenate(
            [
                d_xy_x, d_xy_y, d_a, d_b, d_c, d_opw, d_rgb,
                jnp.zeros((PAYLOAD_F - 9, ch), jnp.float32),
            ],
            axis=0,
        )
        put_dma(slot, k).start()
        return T_new, prefix_incl[:, -1:]

    T_last, _ = jax.lax.fori_loop(0, rounds_eff, body_b, (ones, zeros1))

    # Drain outstanding output DMAs from the replay.
    @pl.when(rounds_eff >= 2)
    def _():
        put_dma(rounds_eff % 2, rounds_eff - 2).wait()

    @pl.when(rounds_eff >= 1)
    def _():
        put_dma((rounds_eff - 1) % 2, rounds_eff - 1).wait()

    # Zero-fill the truncated tail so the downstream carry-sort reduction
    # never reads stale memory: both staging buffers become zero chunks that
    # ping-pong DMAs over the remaining aligned segment.
    @pl.when(rounds_eff < rounds)
    def _():
        dbuf[0] = jnp.zeros_like(dbuf[0])
        dbuf[1] = jnp.zeros_like(dbuf[1])

        def zbody(k, _):
            @pl.when(k >= rounds_eff + 2)
            def _():
                put_dma(k % 2, k - 2).wait()

            put_dma(k % 2, k).start()
            return 0

        jax.lax.fori_loop(rounds_eff, rounds, zbody, 0)

        @pl.when(rounds - rounds_eff >= 2)
        def _():
            put_dma(rounds % 2, rounds - 2).wait()

        put_dma((rounds - 1) % 2, rounds - 1).wait()


def blend_global_backward(
    payload: jnp.ndarray,      # [16, C_pad]
    grad_packed: jnp.ndarray,  # [T, 8, 256] cotangent of the packed output
    packed: jnp.ndarray,       # [T, 8, 256] saved forward output
    starts: jnp.ndarray,
    counts: jnp.ndarray,
    *,
    grid_x: int,
    grid_y: int,
    chunk: int = 256,
    tile_x: int = TILE_X,
    tile_y: int = TILE_Y,
    interpret: bool = False,
):
    """Returns d_payload [16, C_pad] (zero where no pair was written)."""
    num_tiles = grid_x * grid_y
    tp = tile_x * tile_y
    kernel = functools.partial(
        _bwd_kernel, chunk=chunk, grid_x=grid_x, tile_x=tile_x, tile_y=tile_y
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, 8, tp), lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, tp), lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, PAYLOAD_F, chunk), jnp.float32),
            pltpu.VMEM((2, PAYLOAD_F, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    dpay = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(payload.shape, jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, counts, payload, grad_packed, packed)
    return dpay
