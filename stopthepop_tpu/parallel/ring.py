"""Ring-streamed Gaussian sharding: bounded-memory scale-out of P.

The SURVEY §5.7 north-star design for scenes too large to gather on one
chip (BASELINE config 5, 10M+ Gaussians at 4K): shard the image into bands
AND the Gaussians into shards, and instead of all_gathering the full
per-Gaussian feature table (parallel/spatial.py — O(P) memory per chip),
stream the shards around the ring with ``ppermute`` while each chip bins
pairs for its own band — ring attention's structure with "depth-sorted
blend" as the streamed reduction. Per-chip memory is O(P/n) parameters +
O(band pairs), never O(P).

Per ring step each chip:
  1. rebuilds a band-local view of the resident shard (rects clamped to
     the band, mean2d shifted into band pixel space);
  2. rank-expands that shard's (Gaussian, tile) pairs for its band and
     keys them (any GlobalSortOrder, via the band-adjusted inverse VP);
  3. gathers the pair *records* (the blend payload rows) shard-locally —
     the rows land in a static accumulation buffer, Gaussian-contiguous
     within the step;
  4. rotates the shard to the next chip.

After n steps one pad-into-sort (duplicate.sort_stream_aligned) lays the
accumulated stream out in aligned per-tile segments and the unmodified
Pallas GLOBAL blend renders the band. The payload enters the kernel
through a pair-domain gather whose VJP is carry-sort-only
(duplicate.make_slot_gather); reverse-mode AD of the scan then replays the
ring backwards — each step's pair cotangents reduce to the resident
shard's feature gradients through the Gaussian-contiguous run reduction
(make_expand_rows), and the transposed ppermutes deliver them to the
owning chip. Deterministic end to end: the same sort/scan machinery as the
single-chip path, no scatter-adds (the TPU replacement for the reference's
atomicAdd accumulation, backward.cu:561-592, at multi-chip scale).

Resort modes (KBUFFER/HIER) stream through the same ring: the accumulated
record rows carry the packed inverse 3D covariance + opacity power
threshold (the kbuffer payload ingredients, render/pipeline.py::
build_payload_kbuffer), the pad-into-sort lays the merged stream out in
global sort order per band, and the unmodified Pallas k-buffer /
hierarchical kernels blend it — the per-pixel resort window is a property
of the blend kernel, not of how the pairs arrived, so it survives shard
rotation by construction. This is the bounded-memory scale-out of the
paper's quality config (PTD + k-buffer) that SURVEY §5.7/§7.6 calls for:
per-chip memory stays O(P/n) parameters + O(band pairs), never O(P).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import GaussianRasterizationSettings, GlobalSortOrder, SortMode
from ..constants import TILE_X, TILE_Y
from ..kernels.blend_vjp import make_blend_global
from ..kernels.global_blend import PAYLOAD_F, unpack_image
from ..models.gaussians import GaussianModel
from ..ops.scan import cumsum_mxu
from ..render.duplicate import (
    expand_pairs,
    make_slot_gather,
    rect_histogram,
    sort_stream_aligned,
)
from ..train.trainer import CameraArrays
from .spatial import (
    SpatialConfig,
    _band_prep,
    _preprocess_features,
    band_inverse_vp,
    plan_bands,
)

# Per-pair record columns (accumulation-order table):
#   GLOBAL:  0:2 mean2d | 2:6 conic_opacity | 6:9 rgb | 9 depth/sort-key
#   resort:  0:2 mean2d | 2:6 conic_opacity | 6:9 rgb | 9:18 cov3d_inv9
#            | 18 opacity_power_threshold   (kbuffer payload order,
#            render/pipeline.py::build_payload_kbuffer)
REC_F = 10
REC_F_RESORT = 19
GRAD_COLS = 9  # mean2d/conic/rgb carry gradients; the rest is stop-grad


@functools.lru_cache(maxsize=None)
def make_expand_rows(grad_cols: int = GRAD_COLS):
    """``table[gid]`` row expansion with a run-reduction VJP.

    Within one ring step the pair stream is Gaussian-contiguous (rank
    expansion order), so the gather's transpose is a segment reduction:
    cumsum the cotangent rows and difference at each Gaussian's inclusive
    offset — the same gather-only trick as make_segment_gather's tail, with
    no sort needed (the rows never left expansion order).
    """

    @jax.custom_vjp
    def expand(table, gid, offsets):
        return table[gid]  # [cap, F] row-major

    def fwd(table, gid, offsets):
        return table[gid], (gid, offsets, table.shape[0])

    def bwd(res, d_rows):
        import numpy as np

        gid, offsets, p_rows = res
        cap, F = d_rows.shape
        ncols = min(grad_cols, F)
        d = d_rows[:, :ncols].T  # feature-major [ncols, cap]
        cs = jnp.pad(cumsum_mxu(d), ((0, 0), (1, 0)))  # [ncols, cap+1]
        cs = jax.lax.optimization_barrier(cs.T)  # row-major [cap+1, ncols]
        offs = jnp.minimum(offsets, cap)
        cs_at = cs[offs]
        d_table = cs_at - jnp.concatenate(
            [jnp.zeros((1, ncols), d_rows.dtype), cs_at[:-1]], axis=0
        )
        if ncols < F:
            d_table = jnp.pad(d_table, ((0, 0), (0, F - ncols)))

        def int0(x):
            return np.zeros(x.shape, dtype=jax.dtypes.float0)

        return d_table, int0(gid), int0(offsets)

    expand.defvjp(fwd, bwd)
    return expand


def ring_band_render(
    model_shard: GaussianModel,
    cam: CameraArrays,
    rs: GaussianRasterizationSettings,
    cfg: SpatialConfig,
    *,
    per_step_capacity: int,
    axis: str = "shards",
    chunk: int = 128,
    seg_cap: int = 16384,
    carry_bf16: bool = False,
    interpret: bool = False,
):
    """Render this chip's band by streaming Gaussian shards around the ring.

    Call inside shard_map over ``axis``. Returns (color [3, band_h, W],
    final_T [band_h, W], overflow [] bool). ``per_step_capacity`` bounds the
    pairs any single (shard, band) combination may emit; overflow reports
    violations exactly like the single-chip pair buffer.

    All sort modes stream: the resort kernels (KBUFFER/HIER) consume the
    same globally-sorted band stream as the single-chip path — the records
    carry the per-ray-depth ingredients, and the per-pixel resort window
    lives in the blend kernel, indifferent to which shard a pair came from.
    """
    rs = rs._replace(
        viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
        inv_viewprojmatrix=cam.inv_viewprojmatrix, campos=cam.campos,
    )
    ext = rs.settings
    mode = SortMode(ext.sort_settings.sort_mode)
    if mode == SortMode.PPX_FULL:
        raise NotImplementedError(
            "PPX_FULL is the single-chip quality oracle (fwd-only, like the "
            "reference, backward.cu:733-736); use GLOBAL/KBUFFER/HIER for "
            "ring-streamed scale-out"
        )
    resort = mode in (SortMode.PPX_KBUFFER, SortMode.HIER)
    rec_f = REC_F_RESORT if resort else REC_F
    n = jax.lax.axis_size(axis)
    band = jax.lax.axis_index(axis)
    band_h = cfg.band_gy * TILE_Y
    num_tiles = cfg.grid_x * cfg.band_gy
    ivp_band = band_inverse_vp(rs.inv_viewprojmatrix, band, cfg)
    sort_order = GlobalSortOrder(ext.sort_settings.sort_order)
    if ext.culling_settings.tile_based_culling:
        raise NotImplementedError(
            "tile_based_culling under ring streaming needs a pair-domain "
            "histogram per step; use parallel.spatial for now"
        )

    feat, ints = _preprocess_features(model_shard, cam, rs)  # [p, 20], [p, 5]
    perm = [(i, (i + 1) % n) for i in range(n)]
    expand_rows = make_expand_rows()

    def step(carry, _):
        feat_r, ints_r = carry
        prep = _band_prep(feat_r, ints_r, band, cfg)
        tile_id, depth_key, gid, num_r, _ = expand_pairs(
            prep, capacity=per_step_capacity,
            grid_x=cfg.grid_x, grid_y=cfg.band_gy,
            sort_order=sort_order,
            campos=rs.campos, inverse_vp=ivp_band,
            image_width=cfg.image_width, image_height=band_h,
        )
        # Pair records, shard-local: [per_cap, rec_f]. The differentiable
        # columns (mean2d/conic/rgb) go through the run-reduction gather;
        # the rest of the row is stop-grad (discrete resort, like the
        # reference): GLOBAL appends the sort-key value as its depth
        # column, the resort modes append the per-ray-depth ingredients
        # (packed Sigma^-1 + u, opacity power threshold).
        table = jnp.concatenate(
            [prep.mean2d, prep.conic_opacity, prep.rgb], axis=1
        )  # [p, 9]
        offsets = jnp.cumsum(prep.tiles_touched).astype(jnp.int32)
        rows = expand_rows(table, gid, offsets)  # [per_cap, 9]
        if resort:
            extra = jnp.concatenate(
                [prep.cov3d_inv9, prep.opacity_power_threshold[:, None]],
                axis=1,
            )
            rows = jnp.concatenate(
                [rows, jax.lax.stop_gradient(extra)[gid]], axis=1
            )
        else:
            rows = jnp.concatenate(
                [rows, jax.lax.stop_gradient(depth_key)[:, None]], axis=1
            )
        counts_step = rect_histogram(prep, cfg.grid_x, cfg.band_gy)
        feat_n = jax.lax.ppermute(feat_r, axis, perm)
        ints_n = jax.lax.ppermute(ints_r, axis, perm)
        out = (tile_id, depth_key, rows, counts_step,
               num_r > per_step_capacity)
        return (feat_n, ints_n), out

    (_, _), (tids, deps, rows, counts_s, ovfs) = jax.lax.scan(
        step, (feat, ints), None, length=n
    )
    c_total = n * per_step_capacity
    tile_id = tids.reshape(c_total)
    depth = deps.reshape(c_total)
    ptable = rows.reshape(c_total, rec_f)
    counts = counts_s.sum(axis=0)
    overflow = jnp.any(ovfs)

    pairs, segs = sort_stream_aligned(
        tile_id, depth, jnp.zeros((c_total,), jnp.int32), counts,
        num_tiles=num_tiles, align=chunk,
        num_rendered=jnp.int32(0), overflow=overflow,
    )
    feats = make_slot_gather(c_total, GRAD_COLS, carry_bf16)(
        ptable, segs.orig_slot
    )  # [rec_f, c_total + T*chunk]
    if resort:
        from ..kernels.blend_vjp import make_blend_hier, make_blend_kbuffer
        from ..kernels.kbuffer_blend import KB_PAYLOAD_F

        payload = jnp.pad(
            feats, ((0, KB_PAYLOAD_F - rec_f), (0, chunk))
        )
        cam_vec = jnp.concatenate(
            [ivp_band.reshape(-1), rs.campos.reshape(-1)]
        ).astype(jnp.float32)
        qs = ext.sort_settings.queue_sizes
        if mode == SortMode.PPX_KBUFFER:
            blend = make_blend_kbuffer(
                cfg.grid_x, cfg.band_gy, int(qs.per_pixel),
                cfg.image_width, band_h, chunk, seg_cap, interpret,
            )
        else:
            blend = make_blend_hier(
                cfg.grid_x, cfg.band_gy,
                (int(qs.tile_4x4), int(qs.tile_2x2), int(qs.per_pixel)),
                cfg.image_width, band_h,
                ext.culling_settings.hierarchical_4x4_culling,
                chunk, seg_cap, interpret,
            )
        packed = blend(payload, segs.starts, segs.counts, rs.bg, cam_vec)
        color, final_t, _, _ = unpack_image(
            packed, cfg.grid_x, cfg.band_gy, cfg.image_width, band_h
        )
        return color, final_t, overflow
    payload = jnp.pad(
        feats, ((0, PAYLOAD_F - REC_F), (0, chunk))
    )
    blend = make_blend_global(cfg.grid_x, cfg.band_gy, chunk, interpret)
    packed = blend(payload, segs.starts, segs.counts)
    color, final_t, _, _ = unpack_image(
        packed, cfg.grid_x, cfg.band_gy, cfg.image_width, band_h
    )
    color = color + final_t[None, :, :] * rs.bg[:, None, None]
    return color, final_t, overflow


def make_ring_render(
    mesh: Mesh,
    *,
    static: GaussianRasterizationSettings,
    per_step_capacity: int,
    axis: str = "shards",
    chunk: int = 128,
    interpret: bool = False,
):
    """Jitted ring-streamed inference render: model shards [P/n, ...] ->
    full [3, H, W] image (band padding cropped)."""
    n = mesh.shape[axis]
    cfg = plan_bands(static.image_width, static.image_height, n,
                     n * per_step_capacity)

    def render(model_shard, cam):
        color, _, overflow = ring_band_render(
            model_shard, cam, static, cfg,
            per_step_capacity=per_step_capacity, axis=axis, chunk=chunk,
            interpret=interpret,
        )
        return color, overflow

    rendered = shard_map(
        render, mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(None, axis, None), P()),
        check_vma=False,
    )

    def full(model_shard, cam):
        img, overflow = rendered(model_shard, cam)
        return img[:, : cfg.image_height, :], overflow

    return jax.jit(full), cfg


def make_ring_train_step(
    mesh: Mesh,
    optimizer,
    *,
    static: GaussianRasterizationSettings,
    per_step_capacity: int,
    axis: str = "shards",
    chunk: int = 128,
    lambda_dssim: float = 0.2,
    carry_bf16: bool = False,
    interpret: bool = False,
):
    """Jitted sharded train step: bands x ring-streamed Gaussian shards.

    Same contract as parallel.spatial.make_spatial_train_step (model/opt
    shards lead-sharded over ``axis``, targets row-sharded into bands) with
    O(P/n) per-chip memory instead of the all_gather's O(P).
    """
    import optax

    from .spatial import spatial_rgb_loss

    n = mesh.shape[axis]
    cfg = plan_bands(static.image_width, static.image_height, n,
                     n * per_step_capacity)
    gspec = P(axis)
    band_spec = P(None, axis, None)

    def step(model_shard, opt_shard, cam, target_band):
        def loss_fn(ms):
            color, _, _ = ring_band_render(
                ms, cam, static, cfg,
                per_step_capacity=per_step_capacity, axis=axis, chunk=chunk,
                carry_bf16=carry_bf16, interpret=interpret,
            )
            return spatial_rgb_loss(color, target_band, cfg, axis=axis,
                                    lambda_dssim=lambda_dssim)

        loss, grads = jax.value_and_grad(loss_fn)(model_shard)
        updates, opt_shard2 = optimizer.update(grads, opt_shard, model_shard)
        model2 = optax.apply_updates(model_shard, updates)
        return model2, opt_shard2, loss

    def leaf_specs(tree, spec):
        return jax.tree.map(lambda x: spec if jnp.ndim(x) > 0 else P(), tree)

    _cache = {}

    def sharded(model_shard, opt_shard, cam, target_band):
        key = jax.tree.structure((model_shard, opt_shard))
        if key not in _cache:
            in_specs = (
                leaf_specs(model_shard, gspec),
                leaf_specs(opt_shard, gspec),
                P(),
                band_spec,
            )
            out_specs = (
                leaf_specs(model_shard, gspec),
                leaf_specs(opt_shard, gspec),
                P(),
            )
            _cache[key] = jax.jit(shard_map(
                step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=False,
            ))
        return _cache[key](model_shard, opt_shard, cam, target_band)

    return sharded
