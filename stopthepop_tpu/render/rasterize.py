"""Public rasterization API.

Mirrors the reference's Python surface (diff_gaussian_rasterization/
__init__.py:32-53, 265-314): ``rasterize_gaussians(...)`` and
``GaussianRasterizer`` with the same argument names and the same input
validation, returning ``(color [3, H, W], radii [P])``. Functional-JAX
differences:

  * no autograd.Function — the whole pipeline is differentiable JAX; the
    blend uses a custom VJP internally (kernels/blend_vjp.py);
  * ``means2D`` is the same densification-gradient dummy as upstream: its
    value is ignored, but gradients arrive scaled by (0.5*W, 0.5*H) exactly
    like the reference's NDC-scaled dL_dmean2D (backward.cu ddelx_dx=0.5*W);
  * buffer capacity is static: ``pair_capacity`` (default 16*P) replaces the
    reference's dynamic resize-after-scan (rasterizer_impl.cu:316-321); pass
    the ``overflow`` debug output to detect undersizing.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import (
    DebugVisualization,
    GaussianRasterizationSettings,
    GlobalSortOrder,
    SortMode,
)
from ..constants import PAIR_CAPACITY_FACTOR
from ..ops.transforms import mark_visible
from .naive import render_full_sort_naive
from .pipeline import (
    render_tiled,
    render_tiled_full,
    render_tiled_hier,
    render_tiled_kbuffer,
)
from .preprocess import preprocess


class RenderOutput(NamedTuple):
    color: jnp.ndarray      # [3, H, W]
    radii: jnp.ndarray      # [P] int32
    final_t: jnp.ndarray    # [H, W]
    n_contrib: jnp.ndarray  # [H, W] int32
    overflow: jnp.ndarray   # [] bool — pair buffer overflow indicator
    depth_acc: jnp.ndarray = None  # [H, W] sum(w * depth) accumulator
    grad_overflow: jnp.ndarray = None  # [] bool — a tile exceeds seg_cap, so
    # the resort-mode backward would truncate that tile's pair gradients


def default_pair_capacity(num_gaussians: int) -> int:
    return PAIR_CAPACITY_FACTOR * max(num_gaussians, 1)


def suggest_capacities(
    means3D,
    opacities,
    raster_settings: GaussianRasterizationSettings,
    *,
    scales=None,
    rotations=None,
    cov3Ds_precomp=None,
    headroom: float = 1.1,
    tile_shape: tuple = None,
):
    """Probe a scene once and suggest the three static sizing knobs.

    The reference sizes its buffers dynamically after a device scan
    (rasterizer_impl.cu:316-321); under jit the shapes are static, so users
    pick ``pair_capacity`` up front. This helper renders nothing — it runs
    the (cheap, P-domain) preprocess for the given camera/settings and
    measures the actual pair stream, returning 128-aligned

        (pair_capacity, pad_capacity, seg_cap)

    to pass to ``rasterize_gaussians`` / ``GaussianRasterizer``:
    the pair stream bound (with ``headroom``), the exact shared
    alignment-padding pool, and the worst single-tile pair count (the bound
    resort-mode backwards truncate per-tile gradients at). Undersizing is
    still *detected* at render time (``overflow`` / ``grad_overflow`` in the
    full output); this is the sizing aid. For a moving scene (training),
    probe a few representative cameras and take the max — or use the
    trainer CLI, which does."""
    from .duplicate import rect_histogram
    from .pipeline import tile_grid
    from .preprocess import preprocess

    rs = raster_settings
    ext = rs.settings
    tx, ty = tile_shape if tile_shape is not None else (16, 16)
    prep = preprocess(
        means3D, opacities, scales=scales, rotations=rotations,
        cov3d_precomp=cov3Ds_precomp,
        # Sizing depends on geometry only; a dummy color skips SH eval.
        colors_precomp=jnp.ones((means3D.shape[0], 3), jnp.float32),
        scale_modifier=rs.scale_modifier,
        viewmatrix=rs.viewmatrix, projmatrix=rs.projmatrix,
        campos=rs.campos, tanfovx=rs.tanfovx, tanfovy=rs.tanfovy,
        image_width=int(rs.image_width), image_height=int(rs.image_height),
        sh_degree=0,
        sort_order=GlobalSortOrder(ext.sort_settings.sort_order),
        rect_bounding=ext.culling_settings.rect_bounding,
        tight_opacity_bounding=ext.culling_settings.tight_opacity_bounding,
        proper_ewa_scaling=ext.proper_ewa_scaling,
        tile_x=tx, tile_y=ty,
    )
    gx, gy = tile_grid(int(rs.image_width), int(rs.image_height), tx, ty)
    counts = rect_histogram(prep, gx, gy)

    def _al(v):
        return (int(v) + 127) // 128 * 128

    pair_capacity = _al(max(int(jnp.sum(prep.tiles_touched)) * headroom,
                            128))
    # Exact pad need for THIS stream + one chunk per 16 tiles of slack for
    # headroom-added pairs.
    pad_capacity = _al(int(jnp.sum((-counts) % 128)) + 128 * (gx * gy // 16 + 1))
    seg_cap = _al(max(int(jnp.max(counts)) * headroom, 2048))
    return pair_capacity, pad_capacity, seg_cap


def rasterize_gaussians(
    means3D,
    means2D,
    sh,
    colors_precomp,
    opacities,
    scales,
    rotations,
    cov3Ds_precomp,
    raster_settings: GaussianRasterizationSettings,
    **kw,
):
    """Render; with ``debug=True`` in the settings, failures dump the exact
    inputs to snapshot_fw.npz for offline replay (the reference's debug
    contract, __init__.py:96-103)."""
    if raster_settings.debug:
        from ..utils.snapshot import snapshot_on_failure

        with snapshot_on_failure(
            "fw",
            {
                "means3D": means3D, "means2D": means2D, "sh": sh,
                "colors_precomp": colors_precomp, "opacities": opacities,
                "scales": scales, "rotations": rotations,
                "cov3Ds_precomp": cov3Ds_precomp,
                "bg": raster_settings.bg,
                "viewmatrix": raster_settings.viewmatrix,
                "projmatrix": raster_settings.projmatrix,
                "inv_viewprojmatrix": raster_settings.inv_viewprojmatrix,
                "campos": raster_settings.campos,
            },
            meta=raster_settings.settings.to_dict(),
        ):
            return _rasterize_impl(
                means3D, means2D, sh, colors_precomp, opacities, scales,
                rotations, cov3Ds_precomp, raster_settings, **kw,
            )
    return _rasterize_impl(
        means3D, means2D, sh, colors_precomp, opacities, scales, rotations,
        cov3Ds_precomp, raster_settings, **kw,
    )


def _rasterize_impl(
    means3D,
    means2D,
    sh,
    colors_precomp,
    opacities,
    scales,
    rotations,
    cov3Ds_precomp,
    raster_settings: GaussianRasterizationSettings,
    *,
    pair_capacity: Optional[int] = None,
    pad_capacity: Optional[int] = None,
    seg_cap: int = 16384,
    seg_full: int = 2048,
    full_mode: str = "auto",
    chunk: int = 128,
    carry_bf16: bool = False,
    rank_key: bool = False,
    pack_fwd: bool = False,
    batched_cascade: bool = False,
    tile_shape: tuple = None,
    interpret="auto",
    full_output: bool = False,
    debug_visualization: DebugVisualization = DebugVisualization.Disabled,
    debug_data=None,
):
    """Render. Returns (color, radii) like the reference, or RenderOutput.

    ``render_depth=True`` in the settings maps to the Depth debug
    visualization exactly like the reference (rasterize_points.cu:104-107):
    the returned image is the colormapped visualization.

    ``pad_capacity`` (static) bounds the shared per-tile alignment-padding
    pool of the fused sort (default: the worst case ``num_tiles * chunk``).
    Benchmarks/trainers that probe their scenes can pass the measured exact
    need — every pair-domain stage (sort, payload gather, backward unsort)
    shrinks by the slack; overflow is detected and reported like pair
    overflow.
    """
    rs = raster_settings
    ext = rs.settings
    sort_mode = SortMode(ext.sort_settings.sort_mode)
    sort_order = GlobalSortOrder(ext.sort_settings.sort_order)
    P = means3D.shape[0]
    W, H = int(rs.image_width), int(rs.image_height)
    if interpret == "auto":
        # Pallas kernels only execute natively on TPU; on the CPU backend
        # interpret mode is the sole option, so detect it instead of
        # making every CPU caller (tests, torch front-end) opt in.
        interpret = jax.default_backend() != "tpu"
    capacity = pair_capacity  # None -> resolved after preprocess (eager
    # calls auto-size exactly; traced calls fall back to the static default)
    # Binning tile override (GLOBAL mode only): 16x16 = reference parity;
    # 32x16 shrinks the pair domain (sorts/gathers) ~35% on TPU.
    from ..constants import TILE_X, TILE_Y

    tile_x, tile_y = tile_shape if tile_shape is not None else (TILE_X, TILE_Y)
    # Every sort mode consumes the same binning stream at either tile size
    # (like the reference's single BinningState, rasterizer_impl.cu:264):
    # GLOBAL blends the 32x16 tile directly; the resort modes blend its two
    # 16x16 halves off the shared parent segment (pipeline.
    # split_binning_segments). Validation of supported sizes lives in
    # pipeline._resolve_bin_tile.

    def none_if_empty(x):
        return None if x is None or (hasattr(x, "size") and x.size == 0) else x

    sh = none_if_empty(sh)
    colors_precomp = none_if_empty(colors_precomp)
    scales = none_if_empty(scales)
    rotations = none_if_empty(rotations)
    cov3Ds_precomp = none_if_empty(cov3Ds_precomp)

    if rs.prefiltered:
        # The reference __trap()s when a point violates the prefiltered
        # contract (auxiliary.h:228-232). Here the violation raises on the
        # host via a debug callback (works under jit; costs one [P]-bool
        # transfer, only on the opt-in prefiltered path).
        visible = mark_visible(means3D, rs.viewmatrix, rs.projmatrix)

        def _check_prefiltered(v):
            import numpy as np

            if not np.asarray(v).all():
                raise RuntimeError(
                    "prefiltered=True but some points lie outside the view "
                    "frustum (the reference traps on this contract "
                    "violation, auxiliary.h:228-232). Run markVisible and "
                    "filter, or pass prefiltered=False."
                )

        jax.debug.callback(_check_prefiltered, visible)

    prep = preprocess(
        means3D,
        opacities,
        scales=scales,
        rotations=rotations,
        cov3d_precomp=cov3Ds_precomp,
        shs=sh,
        colors_precomp=colors_precomp,
        scale_modifier=rs.scale_modifier,
        viewmatrix=rs.viewmatrix,
        projmatrix=rs.projmatrix,
        campos=rs.campos,
        tanfovx=rs.tanfovx,
        tanfovy=rs.tanfovy,
        image_width=W,
        image_height=H,
        sh_degree=rs.sh_degree,
        sort_order=sort_order,
        rect_bounding=ext.culling_settings.rect_bounding,
        tight_opacity_bounding=ext.culling_settings.tight_opacity_bounding,
        proper_ewa_scaling=ext.proper_ewa_scaling,
        tile_x=tile_x,
        tile_y=tile_y,
    )

    if capacity is None:
        if isinstance(prep.tiles_touched, jax.core.Tracer):
            # Under jit shapes must be static before tracing; use the
            # default and report undersizing via the overflow flag (pass
            # pair_capacity / suggest_capacities for exact sizing).
            capacity = default_pair_capacity(P)
        else:
            # Eager call: size the pair buffer from the actual stream —
            # the static-shape analog of the reference's dynamic resize
            # after its device scan (rasterizer_impl.cu:316-321). Never
            # below the default so repeat eager calls on a moving scene
            # mostly reuse one compiled shape.
            need = int(jnp.sum(prep.tiles_touched))
            exact = (int(need * 1.1) + 127) // 128 * 128
            capacity = max(default_pair_capacity(P), exact)

    if means2D is not None and means2D.size:
        # Densification-gradient dummy: value-neutral reroute so that
        # d loss/d means2D = pixel-space mean gradient * (0.5W, 0.5H),
        # matching the reference trainer's expectations.
        scale_vec = jnp.array([0.5 * W, 0.5 * H], jnp.float32)
        m2d = means2D[:, :2] * scale_vec
        mean2d = prep.mean2d + m2d - jax.lax.stop_gradient(m2d)
        prep = prep._replace(mean2d=mean2d)

    pairs = None
    if sort_mode == SortMode.PPX_FULL:
        # Exact per-pixel full sort — the quality oracle. Two backends:
        #   * "naive": O(P x pixels) dense jnp oracle — differentiable
        #     (beats the reference, whose FULL is fwd-only), small scenes;
        #   * "tiled": the Pallas per-tile bitonic kernel — forward-only
        #     like the reference (backward.cu:733-736), lego/garden scale.
        # "auto" picks naive while the dense [P, pixels] tables stay small.
        use_naive = full_mode == "naive" or (
            full_mode == "auto" and P * W * H <= (1 << 26)
        )
        if use_naive:
            color, final_t, n_contrib, depth_acc = render_full_sort_naive(
                prep, rs.bg, W, H, rs.campos, rs.inv_viewprojmatrix
            )
            final_t = final_t.reshape(H, W)
            n_contrib = n_contrib.reshape(H, W)
            overflow = jnp.array(False)
        else:
            color, final_t, n_contrib, pairs, depth_acc = render_tiled_full(
                prep,
                rs.bg,
                image_width=W,
                image_height=H,
                capacity=capacity,
            pad_capacity=pad_capacity,
                campos=rs.campos,
                inverse_vp=rs.inv_viewprojmatrix,
                sort_order=sort_order,
                tile_based_culling=ext.culling_settings.tile_based_culling,
                seg_full=seg_full,
                rank_key=rank_key,
                tile_x=tile_x,
                tile_y=tile_y,
                interpret=interpret,
            )
            overflow = pairs.overflow
    elif sort_mode == SortMode.GLOBAL:
        # The Depth accumulator is only read by render_depth / the Depth
        # debug viz; when neither is requested, drop its payload column
        # from the pair-domain gather (depth_acc comes back as zeros and
        # is reported as None below).
        need_depth_out = rs.render_depth or (
            debug_visualization == DebugVisualization.Depth
        )
        color, final_t, n_contrib, pairs, depth_acc = render_tiled(
            prep,
            rs.bg,
            image_width=W,
            image_height=H,
            capacity=capacity,
            pad_capacity=pad_capacity,
            sort_order=sort_order,
            tile_based_culling=ext.culling_settings.tile_based_culling,
            campos=rs.campos,
            inverse_vp=rs.inv_viewprojmatrix,
            chunk=chunk,
            carry_bf16=carry_bf16,
            rank_key=rank_key,
            pack_fwd=pack_fwd,
            carry_depth=need_depth_out,
            tile_x=tile_x,
            tile_y=tile_y,
            interpret=interpret,
        )
        if not need_depth_out:
            depth_acc = None
        overflow = pairs.overflow
    elif sort_mode == SortMode.PPX_KBUFFER:
        color, final_t, n_contrib, pairs, depth_acc = render_tiled_kbuffer(
            prep,
            rs.bg,
            image_width=W,
            image_height=H,
            capacity=capacity,
            pad_capacity=pad_capacity,
            campos=rs.campos,
            inverse_vp=rs.inv_viewprojmatrix,
            k=int(ext.sort_settings.queue_sizes.per_pixel),
            sort_order=sort_order,
            tile_based_culling=ext.culling_settings.tile_based_culling,
            seg_cap=seg_cap,
            carry_bf16=carry_bf16,
            rank_key=rank_key,
            tile_x=tile_x,
            tile_y=tile_y,
            interpret=interpret,
        )
        overflow = pairs.overflow
    elif sort_mode == SortMode.HIER:
        qs = ext.sort_settings.queue_sizes
        color, final_t, n_contrib, pairs, depth_acc = render_tiled_hier(
            prep,
            rs.bg,
            image_width=W,
            image_height=H,
            capacity=capacity,
            pad_capacity=pad_capacity,
            campos=rs.campos,
            inverse_vp=rs.inv_viewprojmatrix,
            queue_sizes=(int(qs.tile_4x4), int(qs.tile_2x2), int(qs.per_pixel)),
            sort_order=sort_order,
            tile_based_culling=ext.culling_settings.tile_based_culling,
            hier_4x4_culling=ext.culling_settings.hierarchical_4x4_culling,
            seg_cap=seg_cap,
            carry_bf16=carry_bf16,
            rank_key=rank_key,
            batched_cascade=batched_cascade,
            tile_x=tile_x,
            tile_y=tile_y,
            interpret=interpret,
        )
        overflow = pairs.overflow
    else:
        raise NotImplementedError(
            f"sort_mode {sort_mode} not yet implemented in the TPU pipeline"
        )

    if rs.debug:
        # Reference parity: debug=True makes every stage check-and-throw
        # (CHECK_CUDA, auxiliary.h:246-253). Here the invariant that can
        # fail silently is pair-buffer overflow (the reference resizes
        # dynamically; eager calls auto-size above, but traced calls use a
        # static capacity). One bool host callback, opt-in, off the bench
        # hot path.
        def _check_overflow(ovf, cap=capacity):
            import numpy as np

            if bool(np.asarray(ovf)):
                raise RuntimeError(
                    f"pair buffer overflow: the scene emits more than "
                    f"pair_capacity={cap} (tile, Gaussian) pairs; output "
                    "is truncated/corrupt. Size with suggest_capacities "
                    "or raise pair_capacity."
                )

        jax.debug.callback(_check_overflow, overflow)

    viz_mode = DebugVisualization(debug_visualization)
    if rs.render_depth and viz_mode == DebugVisualization.Disabled:
        viz_mode = DebugVisualization.Depth
    if viz_mode != DebugVisualization.Disabled:
        from .debug_viz import apply_debug_visualization

        color = apply_debug_visualization(
            viz_mode,
            final_t=final_t,
            n_contrib=n_contrib,
            depth_acc=depth_acc,
            pair_counts=(pairs.ends - pairs.starts) if pairs is not None
            else None,
            prep=prep,
            campos=rs.campos,
            inverse_vp=rs.inv_viewprojmatrix,
            width=W,
            height=H,
            data=debug_data,
        )

    if full_output:
        # Resort-mode backwards truncate per-tile pair gradients past
        # seg_cap; surface that as a flag (the pair-buffer overflow's
        # sibling) instead of failing silently.
        if pairs is not None and sort_mode in (
            SortMode.PPX_KBUFFER, SortMode.HIER
        ):
            grad_overflow = jnp.any((pairs.ends - pairs.starts) > seg_cap)
        else:
            grad_overflow = jnp.array(False)
        return RenderOutput(
            color, prep.radii, final_t, n_contrib, overflow, depth_acc,
            grad_overflow,
        )
    return color, prep.radii


class GaussianRasterizer:
    """API-parity rasterizer object (reference __init__.py:265-314)."""

    def __init__(self, raster_settings: GaussianRasterizationSettings, **kw):
        self.raster_settings = raster_settings
        self._kw = kw

    def markVisible(self, positions):
        rs = self.raster_settings
        return mark_visible(positions, rs.viewmatrix, rs.projmatrix)

    def forward(
        self,
        means3D,
        means2D,
        opacities,
        shs=None,
        colors_precomp=None,
        scales=None,
        rotations=None,
        cov3D_precomp=None,
    ):
        if (shs is None and colors_precomp is None) or (
            shs is not None and colors_precomp is not None
        ):
            raise Exception(
                "Please provide excatly one of either SHs or precomputed colors!"
            )
        if ((scales is None or rotations is None) and cov3D_precomp is None) or (
            (scales is not None or rotations is not None)
            and cov3D_precomp is not None
        ):
            raise Exception(
                "Please provide exactly one of either scale/rotation pair or "
                "precomputed 3D covariance!"
            )
        return rasterize_gaussians(
            means3D,
            means2D,
            shs,
            colors_precomp,
            opacities,
            scales,
            rotations,
            cov3D_precomp,
            self.raster_settings,
            **self._kw,
        )

    __call__ = forward
