"""Spatially-sharded multi-chip rendering: tiles x Gaussians over one mesh axis.

The reference is a single-GPU rasterizer (SURVEY.md §2.9); this is the
TPU-native scaling design the survey's §5.7/§5.8 call for, for scenes/images
too large for one chip (BASELINE config 5: 10M+ Gaussians at 4K):

  * the Gaussian parameter arrays are sharded over the mesh axis — each chip
    preprocesses only its own P/n shard (SH eval, covariance projection:
    the per-primitive FLOPs parallelize perfectly);
  * the image is sharded into horizontal bands of tile rows — each chip
    owns grid_y/n tile rows and runs pair expansion, the (tile, depth)
    sort, and the Pallas blend only for its band (the per-pixel costs
    parallelize over the axis too);
  * between the two stands one collective: an all_gather of the compact
    per-Gaussian *render features* (the 11 floats + 5 ints the blend needs
    — NOT the raw parameters, so preprocess compute is never replicated).
    Reverse-mode AD of that all_gather is a psum_scatter, which is exactly
    the deterministic replacement for the reference's atomicAdd gradient
    accumulation (backward.cu:561-592) at multi-chip scale: per-band
    partial gradients reduce across chips and land pre-sharded on the
    parameter owner.
  * the D-SSIM loss needs 5 pixel rows of cross-band context (11x11
    window); a ppermute halo exchange makes the sharded loss bit-equivalent
    to the single-device one (zero-filled at true image edges, exactly like
    the zero-padded convolution).

All sort orders and the resort modes run band-sharded: the gathered feature
table carries the packed inverse 3D covariance, and band-local pixel/tile
coordinates map onto true camera rays through a per-band adjusted
inverse-view-projection matrix (the band's NDC-y is an affine function of
the full image's, so the remap folds into the matrix rows — zero kernel or
pipeline changes; see band_inverse_vp).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import GaussianRasterizationSettings
from ..constants import TILE_X, TILE_Y
from ..models.gaussians import GaussianModel
from ..render.pipeline import render_tiled, tile_grid
from ..render.preprocess import PreprocessOutput, preprocess
from ..train.loss import _gaussian_kernel1d
from ..train.trainer import CameraArrays

HALO = 5  # half of the 11x11 SSIM window


class SpatialConfig(NamedTuple):
    grid_x: int
    grid_y: int        # full-image tile rows (unpadded)
    band_gy: int       # tile rows per band (grid_y padded to n bands)
    image_width: int
    image_height: int  # true image height
    band_capacity: int
    n_bands: int


def plan_bands(image_width: int, image_height: int, n_bands: int,
               band_capacity: int) -> SpatialConfig:
    grid_x, grid_y = tile_grid(image_width, image_height)
    band_gy = -(-grid_y // n_bands)
    return SpatialConfig(grid_x, grid_y, band_gy, image_width, image_height,
                         band_capacity, n_bands)


def band_inverse_vp(inverse_vp, band, cfg: SpatialConfig):
    """Inverse view-projection matrix for band-local pixel coordinates.

    A band pixel y_local maps to full-image NDC as an affine function of the
    band-local NDC the kernels compute from (height = band_h):
    ndc_full = a * ndc_band + b with a = band_h/H, b = a - 1 + 2*y0/H.
    Rays are linear in (ndc_x, ndc_y, 1) through the matrix rows
    (kbuffer_blend._view_rays / ops.transforms.compute_view_ray), so the
    remap folds into rows 1 and 3 — every per-tile-depth target and per-ray
    depth then comes out exactly as in the unsharded render.
    """
    band_h = cfg.band_gy * TILE_Y
    # Target the TRUE image height (what the unsharded render uses for its
    # NDC); rows past it are padding, cropped/masked downstream.
    h_full = cfg.image_height
    a = band_h / h_full
    y0 = (band * band_h).astype(jnp.float32)
    b = a - 1.0 + 2.0 * y0 / h_full
    row1 = inverse_vp[1:2, :]
    return jnp.concatenate(
        [
            inverse_vp[0:1, :],
            a * row1,
            inverse_vp[2:3, :],
            inverse_vp[3:4, :] + b * row1,
        ],
        axis=0,
    )


def _preprocess_features(model: GaussianModel, cam: CameraArrays,
                         rs: GaussianRasterizationSettings):
    """Per-shard preprocess -> (float feature table [p,20], int table [p,5]).

    Float cols: mean2d xy, conic_opacity abco, rgb, depth, power_threshold,
    packed inverse 3D covariance (6 inv-cov + 3 u) for exact per-ray depths.
    Int cols: rect_min xy, rect_max xy, valid.
    """
    ext = rs.settings
    prep = preprocess(
        model.means3d, model.opacities(),
        scales=model.scales(), rotations=model.rotations_normalized(),
        shs=model.shs(),
        scale_modifier=rs.scale_modifier,
        viewmatrix=rs.viewmatrix, projmatrix=rs.projmatrix, campos=rs.campos,
        tanfovx=rs.tanfovx, tanfovy=rs.tanfovy,
        image_width=rs.image_width, image_height=rs.image_height,
        sh_degree=rs.sh_degree,
        sort_order=ext.sort_settings.sort_order,
        rect_bounding=ext.culling_settings.rect_bounding,
        tight_opacity_bounding=ext.culling_settings.tight_opacity_bounding,
        proper_ewa_scaling=ext.proper_ewa_scaling,
    )
    feat = jnp.concatenate(
        [
            prep.mean2d,
            prep.conic_opacity,
            prep.rgb,
            jax.lax.stop_gradient(prep.depth)[:, None],
            jax.lax.stop_gradient(prep.opacity_power_threshold)[:, None],
            # Packed Sigma^-1 + u for the per-tile-depth keys and the
            # resort modes' exact per-ray depths; stop-gradient like the
            # single-chip payload (discrete resort, no depth gradients).
            jax.lax.stop_gradient(prep.cov3d_inv9),
        ],
        axis=1,
    )
    ints = jnp.concatenate(
        [prep.rect_min, prep.rect_max, prep.valid[:, None].astype(jnp.int32)],
        axis=1,
    )
    return feat, ints


def _band_prep(feat, ints, band: jnp.ndarray, cfg: SpatialConfig):
    """Rebuild a band-local PreprocessOutput from gathered feature tables.

    The band owns tile rows [band * band_gy, (band+1) * band_gy); rects are
    clamped into band tile space and mean2d is shifted into band pixel
    space, so the unmodified single-chip pipeline renders the band.
    """
    P_ = feat.shape[0]
    y0_tile = band * cfg.band_gy
    y0_px = (y0_tile * TILE_Y).astype(jnp.float32)
    rect_min = ints[:, 0:2]
    rect_max = ints[:, 2:4]
    valid = ints[:, 4] > 0
    bmin_y = jnp.clip(rect_min[:, 1] - y0_tile, 0, cfg.band_gy)
    bmax_y = jnp.clip(rect_max[:, 1] - y0_tile, 0, cfg.band_gy)
    h = jnp.maximum(bmax_y - bmin_y, 0)
    w = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 0)
    tiles = (w * h).astype(jnp.int32)
    valid = valid & (tiles > 0)
    tiles = jnp.where(valid, tiles, 0)
    mean2d = feat[:, 0:2] - jnp.stack(
        [jnp.zeros((), jnp.float32), y0_px]
    )[None, :]
    zeros1 = jnp.zeros((P_,), jnp.float32)
    return PreprocessOutput(
        valid=valid,
        p_view=jnp.zeros((P_, 3), jnp.float32),
        mean2d=mean2d,
        depth=feat[:, 9],
        conic_opacity=feat[:, 2:6],
        rgb=feat[:, 6:9],
        clamped=jnp.zeros((P_, 3), bool),
        radius=zeros1,
        radii=jnp.zeros((P_,), jnp.int32),
        rect_dims=jnp.zeros((P_, 2), jnp.float32),
        rect_min=jnp.stack([rect_min[:, 0], bmin_y], axis=1),
        rect_max=jnp.stack([rect_max[:, 0], bmax_y], axis=1),
        tiles_touched=tiles,
        cov3d_inv9=feat[:, 11:20],
        opacity_power_threshold=feat[:, 10],
    )


def band_render(model_shard: GaussianModel, cam: CameraArrays,
                rs: GaussianRasterizationSettings, cfg: SpatialConfig,
                axis: str = "tiles", interpret: bool = False):
    """Render this chip's image band (call inside shard_map over ``axis``).

    Returns (color [3, band_h, W], final_T [band_h, W]).
    """
    rs = rs._replace(
        viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
        inv_viewprojmatrix=cam.inv_viewprojmatrix, campos=cam.campos,
    )
    feat, ints = _preprocess_features(model_shard, cam, rs)
    # The one cross-chip collective of the forward pass; its VJP is the
    # psum_scatter that reduces per-band feature gradients to the owner.
    feat_all = jax.lax.all_gather(feat, axis, axis=0, tiled=True)
    ints_all = jax.lax.all_gather(ints, axis, axis=0, tiled=True)
    band = jax.lax.axis_index(axis)
    prep = _band_prep(feat_all, ints_all, band, cfg)
    band_h = cfg.band_gy * TILE_Y
    ivp_band = band_inverse_vp(rs.inv_viewprojmatrix, band, cfg)
    from ..config import SortMode
    from ..render.pipeline import render_tiled_hier, render_tiled_kbuffer

    ext = rs.settings
    mode = SortMode(ext.sort_settings.sort_mode)
    common = dict(
        image_width=cfg.image_width, image_height=band_h,
        capacity=cfg.band_capacity,
        sort_order=ext.sort_settings.sort_order,
        tile_based_culling=ext.culling_settings.tile_based_culling,
        campos=rs.campos, inverse_vp=ivp_band,
        interpret=interpret,
    )
    if mode == SortMode.PPX_KBUFFER:
        color, final_t, _, _, _ = render_tiled_kbuffer(
            prep, rs.bg, k=int(ext.sort_settings.queue_sizes.per_pixel),
            **common,
        )
    elif mode == SortMode.HIER:
        qs = ext.sort_settings.queue_sizes
        color, final_t, _, _, _ = render_tiled_hier(
            prep, rs.bg,
            queue_sizes=(int(qs.tile_4x4), int(qs.tile_2x2),
                         int(qs.per_pixel)),
            hier_4x4_culling=ext.culling_settings.hierarchical_4x4_culling,
            **common,
        )
    else:
        color, final_t, _, _, _ = render_tiled(prep, rs.bg, **common)
    return color, final_t


def _halo_exchange(x, axis: str):
    """Bring HALO rows from the neighbor bands: [C, h, W] -> [C, h+2H, W].

    Missing neighbors (first/last band) contribute zeros — identical to the
    zero-padded convolution at true image edges.
    """
    n = jax.lax.axis_size(axis)
    perm_down = [(i, i + 1) for i in range(n - 1)]   # my rows -> next band
    perm_up = [(i + 1, i) for i in range(n - 1)]     # my rows -> prev band
    top_halo = jax.lax.ppermute(x[:, -HALO:, :], axis, perm_down)
    bot_halo = jax.lax.ppermute(x[:, :HALO, :], axis, perm_up)
    return jnp.concatenate([top_halo, x, bot_halo], axis=1)


def _conv11(x, w1d):
    """Separable 11x11 Gaussian blur, zero-padded on W, valid-cropped on H
    (the H padding comes from the halo exchange)."""
    def conv_axis(x, axis, pad):
        if pad:
            padc = [(0, 0)] * x.ndim
            padc[axis] = (HALO, HALO)
            x = jnp.pad(x, padc)
        n = x.shape[axis] - 2 * HALO
        out = 0.0
        for k in range(2 * HALO + 1):
            out = out + float(w1d[k]) * jax.lax.slice_in_dim(x, k, k + n, axis=axis)
        return out

    return conv_axis(conv_axis(x, 2, True), 1, False)


def spatial_rgb_loss(color, target, cfg: SpatialConfig, axis: str = "tiles",
                     lambda_dssim: float = 0.2):
    """L1 + D-SSIM over band-sharded images, exactly matching the
    single-device rgb_loss (train/loss.py): cross-band SSIM windows get real
    neighbor rows via ppermute halos; rows past the true image height are
    masked out of both terms. Returns the replicated scalar loss."""
    band = jax.lax.axis_index(axis)
    band_h = cfg.band_gy * TILE_Y
    y0 = band * band_h
    row = y0 + jnp.arange(band_h)
    rmask = (row < cfg.image_height).astype(jnp.float32)[None, :, None]

    n_px = 3.0 * cfg.image_height * cfg.image_width
    l1 = jax.lax.psum(jnp.sum(jnp.abs(color - target) * rmask), axis) / n_px

    w1d = _gaussian_kernel1d()
    cp = _halo_exchange(color, axis)
    tp = _halo_exchange(target, axis)
    c1, c2 = 0.01**2, 0.03**2
    mu_p = _conv11(cp, w1d)
    mu_t = _conv11(tp, w1d)
    mu_pp, mu_tt, mu_pt = mu_p * mu_p, mu_t * mu_t, mu_p * mu_t
    sigma_p = _conv11(cp * cp, w1d) - mu_pp
    sigma_t = _conv11(tp * tp, w1d) - mu_tt
    sigma_pt = _conv11(cp * tp, w1d) - mu_pt
    ssim_map = ((2 * mu_pt + c1) * (2 * sigma_pt + c2)) / (
        (mu_pp + mu_tt + c1) * (sigma_p + sigma_t + c2)
    )
    ssim = jax.lax.psum(jnp.sum(ssim_map * rmask), axis) / n_px
    return (1.0 - lambda_dssim) * l1 + lambda_dssim * (1.0 - ssim)


def make_spatial_train_step(
    mesh: Mesh,
    optimizer,
    *,
    static: GaussianRasterizationSettings,
    band_capacity: int,
    axis: str = "tiles",
    lambda_dssim: float = 0.2,
    interpret: bool = False,
):
    """Build a jitted sharded train step over a 1-D ("tiles",) mesh.

    Sharding contract (leading-axis over ``axis``):
      model_shard / opt_shard: [P/n, ...] Gaussian parameter shards
      targets: [3, H_pad, W] sharded on rows into n bands (H_pad =
               n * band_gy * 16)
    Returns (model_shard', opt_shard', loss) with loss replicated.
    """
    n = mesh.shape[axis]
    cfg = plan_bands(static.image_width, static.image_height, n,
                     band_capacity)
    gspec = P(axis)
    band_spec = P(None, axis, None)

    def step(model_shard, opt_shard, cam, target_band):
        def loss_fn(ms):
            color, _ = band_render(ms, cam, static, cfg, axis=axis,
                                   interpret=interpret)
            return spatial_rgb_loss(color, target_band, cfg, axis=axis,
                                    lambda_dssim=lambda_dssim)

        loss, grads = jax.value_and_grad(loss_fn)(model_shard)
        updates, opt_shard2 = optimizer.update(grads, opt_shard, model_shard)
        model2 = optax.apply_updates(model_shard, updates)
        return model2, opt_shard2, loss

    def leaf_specs(tree, spec):
        # Scalar leaves (e.g. the Adam step counter) are replicated.
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


def make_spatial_render(
    mesh: Mesh,
    *,
    static: GaussianRasterizationSettings,
    band_capacity: int,
    axis: str = "tiles",
    interpret: bool = False,
):
    """Jitted sharded inference render: model shards -> full [3, H, W] image
    (crops the band padding)."""
    n = mesh.shape[axis]
    cfg = plan_bands(static.image_width, static.image_height, n,
                     band_capacity)

    def render(model_shard, cam):
        color, _ = band_render(model_shard, cam, static, cfg, axis=axis,
                               interpret=interpret)
        return color

    rendered = shard_map(
        render, mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(None, axis, None),
        check_vma=False,
    )

    def full(model_shard, cam):
        img = rendered(model_shard, cam)
        return img[:, : cfg.image_height, :]

    return jax.jit(full), cfg


def shard_model(model: GaussianModel, mesh: Mesh, axis: str = "tiles"):
    """Device_put a replicated model as leading-axis shards over ``axis``."""
    spec = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, spec), model)
