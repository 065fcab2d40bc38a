"""Drop-in torch front-end mirroring ``diff_gaussian_rasterization``.

The reference is a torch CUDA extension (diff_gaussian_rasterization/
__init__.py:32-314); its consumers drive it with torch tensors through
torch.autograd. This module exposes that exact surface —
``GaussianRasterizationSettings`` over torch tensors,
``GaussianRasterizer`` (an ``nn.Module``), ``rasterize_gaussians``, and the
shared ``ExtendedSettings`` tree — while the compute runs in this package's
JAX/TPU pipeline. Arrays bridge host-side (torch CPU <-> numpy <-> JAX
device); gradients bridge through a ``torch.autograd.Function`` whose
backward invokes a jitted JAX VJP.

Performance note: the backward re-renders inside the jitted VJP (JAX
residuals are not carried across the torch autograd boundary), so a training
step renders twice. Consumers chasing peak throughput should port their loop
to the native JAX API (``stopthepop_tpu.GaussianRasterizer``); this shim is
API completeness for existing reference training code.

This module is NOT imported by the package ``__init__`` — only torch users
import it, so the rest of the package carries no torch dependency.
"""

from __future__ import annotations

import functools
import json
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import torch

from .config import (
    CullingSettings,      # noqa: F401  (re-export: reference module surface)
    ExtendedSettings,
    GlobalSortOrder,      # noqa: F401
    SortMode,             # noqa: F401
    SortQueueSizes,       # noqa: F401
    SortSettings,         # noqa: F401
)
from .config import GaussianRasterizationSettings as _JaxSettings
from .render.rasterize import mark_visible as _jax_mark_visible
from .render.rasterize import rasterize_gaussians as _jax_rasterize

__all__ = [
    "GaussianRasterizationSettings",
    "GaussianRasterizer",
    "rasterize_gaussians",
    "ExtendedSettings",
    "SortSettings",
    "CullingSettings",
    "SortQueueSizes",
    "SortMode",
    "GlobalSortOrder",
]


class GaussianRasterizationSettings(NamedTuple):
    """Field-for-field the reference NamedTuple (__init__.py:248-263),
    holding torch tensors for bg/matrices/campos."""

    image_height: int
    image_width: int
    tanfovx: float
    tanfovy: float
    bg: Any
    scale_modifier: float
    viewmatrix: Any
    projmatrix: Any
    inv_viewprojmatrix: Any
    sh_degree: int
    campos: Any
    prefiltered: bool
    settings: ExtendedSettings
    render_depth: bool = False
    debug: bool = False


# The reference's 8 differentiable inputs, in its argument (and gradient
# return) order (__init__.py:113-172).
_DIFF_ARGS = (
    "means3D", "means2D", "sh", "colors_precomp", "opacities", "scales",
    "rotations", "cov3Ds_precomp",
)


def _to_jnp(t):
    """torch tensor / array-like -> jnp array; None / empty -> None."""
    if t is None:
        return None
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    arr = np.asarray(t)
    if arr.size == 0:
        return None
    return jnp.asarray(arr)


def _to_torch(x):
    return torch.from_numpy(np.asarray(jax.device_get(x)))


@functools.lru_cache(maxsize=None)
def _make_fns(static_key: str, present: tuple, impl_items: tuple):
    """Jitted (forward, vjp) pair for one static configuration.

    ``static_key`` is the JSON of the per-call scalars + algorithm settings;
    ``present`` names the differentiable args the caller supplied;
    ``impl_items`` are extra static kwargs for the JAX implementation
    (pair_capacity, interpret, ...).
    """
    static = json.loads(static_key)
    ext = ExtendedSettings.from_dict(static["settings"])
    impl_kw = dict(impl_items)

    def run(diff, mats):
        rs = _JaxSettings(
            image_height=static["image_height"],
            image_width=static["image_width"],
            tanfovx=static["tanfovx"],
            tanfovy=static["tanfovy"],
            bg=mats["bg"],
            scale_modifier=static["scale_modifier"],
            viewmatrix=mats["viewmatrix"],
            projmatrix=mats["projmatrix"],
            inv_viewprojmatrix=mats["inv_viewprojmatrix"],
            sh_degree=static["sh_degree"],
            campos=mats["campos"],
            prefiltered=static["prefiltered"],
            settings=ext,
            render_depth=static["render_depth"],
            debug=False,  # snapshot dumps happen at the torch layer
        )
        args = {name: diff.get(name) for name in _DIFF_ARGS}
        return _jax_rasterize(
            args["means3D"], args["means2D"], args["sh"],
            args["colors_precomp"], args["opacities"], args["scales"],
            args["rotations"], args["cov3Ds_precomp"], rs, **impl_kw,
        )

    fwd = jax.jit(run)

    def vjp_run(diff, mats, d_color):
        color_only = lambda d: run(d, mats)[0]  # noqa: E731
        _, pull = jax.vjp(color_only, diff)
        return pull(d_color)[0]

    return fwd, jax.jit(vjp_run)


@functools.lru_cache(maxsize=None)
def _make_pair_probe(static_key: str):
    """Jitted P-domain pair-count probe for one static configuration.

    The torch layer always has concrete tensors, so it can size the pair
    buffer from the actual stream — the analog of the reference's dynamic
    resize after its device scan (rasterizer_impl.cu:316-321). Only the
    cheap preprocess runs; the result picks a geometrically-bucketed
    capacity so the render jit cache stays small."""
    from .render.preprocess import preprocess as _pre

    static = json.loads(static_key)
    ext = ExtendedSettings.from_dict(static["settings"])
    order = GlobalSortOrder(ext.sort_settings.sort_order)
    cull = ext.culling_settings

    def count(diff, mats):
        prep = _pre(
            diff["means3D"], diff["opacities"],
            scales=diff.get("scales"), rotations=diff.get("rotations"),
            cov3d_precomp=diff.get("cov3Ds_precomp"),
            colors_precomp=jnp.ones((diff["means3D"].shape[0], 3),
                                    jnp.float32),
            scale_modifier=static["scale_modifier"],
            viewmatrix=mats["viewmatrix"], projmatrix=mats["projmatrix"],
            campos=mats["campos"], tanfovx=static["tanfovx"],
            tanfovy=static["tanfovy"],
            image_width=static["image_width"],
            image_height=static["image_height"], sh_degree=0,
            sort_order=order, rect_bounding=cull.rect_bounding,
            tight_opacity_bounding=cull.tight_opacity_bounding,
            proper_ewa_scaling=static.get("proper_ewa_scaling", False),
        )
        return jnp.sum(prep.tiles_touched)

    return jax.jit(count)


def _bucket_capacity(need: int, P: int) -> int:
    """Static capacity covering ``need`` pairs: default floor, then
    next power of two above 1.1x need (bounds distinct jit shapes at
    O(log need) for a whole training run)."""
    from .render.rasterize import default_pair_capacity

    cap = default_pair_capacity(P)
    want = int(need * 1.1) + 1
    while cap < want:
        cap *= 2
    return cap


def _static_key(rs: GaussianRasterizationSettings) -> str:
    return json.dumps(
        {
            "image_height": int(rs.image_height),
            "image_width": int(rs.image_width),
            "tanfovx": float(rs.tanfovx),
            "tanfovy": float(rs.tanfovy),
            "scale_modifier": float(rs.scale_modifier),
            "sh_degree": int(rs.sh_degree),
            "prefiltered": bool(rs.prefiltered),
            "render_depth": bool(rs.render_depth),
            "settings": rs.settings.to_dict(),
        },
        sort_keys=True,
    )


class _RasterizeGaussians(torch.autograd.Function):
    """The reference autograd bridge (__init__.py:55-172), re-seated on
    the jitted JAX pipeline: forward runs the jitted render; backward
    feeds the image cotangent to the jitted VJP and returns the same 8
    gradients the reference returns."""

    @staticmethod
    def forward(ctx, means3D, means2D, sh, colors_precomp, opacities,
                scales, rotations, cov3Ds_precomp, raster_settings,
                impl_items):
        torch_args = {
            "means3D": means3D, "means2D": means2D, "sh": sh,
            "colors_precomp": colors_precomp, "opacities": opacities,
            "scales": scales, "rotations": rotations,
            "cov3Ds_precomp": cov3Ds_precomp,
        }
        diff = {
            k: v for k, v in (
                (k, _to_jnp(v)) for k, v in torch_args.items()
            ) if v is not None
        }
        mats = {
            "bg": _to_jnp(raster_settings.bg),
            "viewmatrix": _to_jnp(raster_settings.viewmatrix),
            "projmatrix": _to_jnp(raster_settings.projmatrix),
            "inv_viewprojmatrix": _to_jnp(
                raster_settings.inv_viewprojmatrix
            ),
            "campos": _to_jnp(raster_settings.campos),
        }
        key = _static_key(raster_settings)

        def _run():
            items = impl_items
            if not any(k == "pair_capacity" for k, _ in items):
                # Size the pair buffer from the actual stream (reference
                # behavior: dynamic resize, rasterizer_impl.cu:316-321);
                # bucketed so jit shapes stay few.
                need = int(_make_pair_probe(key)(diff, mats))
                items = items + (
                    ("pair_capacity",
                     _bucket_capacity(need, diff["means3D"].shape[0])),
                )
            fwd, vjp = _make_fns(key, tuple(sorted(diff)), items)
            color, radii = fwd(diff, mats)
            return vjp, color, radii

        if raster_settings.debug:
            try:
                vjp, color, radii = _run()
            except Exception:
                _dump_snapshot("fw", torch_args, raster_settings)
                raise
        else:
            vjp, color, radii = _run()
        ctx.stp = (vjp, diff, mats, raster_settings.debug, torch_args,
                   raster_settings)
        return _to_torch(color), _to_torch(radii)

    @staticmethod
    def backward(ctx, grad_color, grad_radii):
        vjp, diff, mats, debug, torch_args, raster_settings = ctx.stp
        d_color = jnp.asarray(grad_color.detach().cpu().numpy())
        if debug:
            try:
                grads = vjp(diff, mats, d_color)
            except Exception:
                _dump_snapshot("bw", torch_args, raster_settings)
                raise
        else:
            grads = vjp(diff, mats, d_color)
        out = tuple(
            _to_torch(grads[name]) if name in grads else None
            for name in _DIFF_ARGS
        )
        return out + (None, None)


def _dump_snapshot(tag, torch_args, raster_settings):
    """The reference's crash forensics (__init__.py:96-103, 149-156) at the
    torch layer: dump the exact inputs for offline replay."""
    payload = {k: v for k, v in torch_args.items() if v is not None}
    payload["raster_settings"] = raster_settings._replace(
        settings=raster_settings.settings.to_dict()
    )
    import os

    path = os.path.join(
        os.environ.get("STP_SNAPSHOT_DIR", "."), f"snapshot_{tag}.dump"
    )
    torch.save(payload, path)
    print(f"\nAn error occured in {tag}. Inputs written to "
          f"{path} for debugging.")


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
    **impl_kw,
):
    """Reference entry point (__init__.py:32-53) over torch tensors."""
    return _RasterizeGaussians.apply(
        means3D, means2D, sh, colors_precomp, opacities, scales, rotations,
        cov3Ds_precomp, raster_settings, tuple(sorted(impl_kw.items())),
    )


class GaussianRasterizer(torch.nn.Module):
    """The reference nn.Module (__init__.py:265-314), same validation
    messages; extra static implementation kwargs (pair_capacity,
    interpret, ...) pass through the constructor like the JAX-native
    rasterizer's."""

    def __init__(self, raster_settings: GaussianRasterizationSettings, **kw):
        super().__init__()
        self.raster_settings = raster_settings
        self._kw = kw

    def markVisible(self, positions):
        with torch.no_grad():
            rs = self.raster_settings
            vis = _jax_mark_visible(
                _to_jnp(positions), _to_jnp(rs.viewmatrix),
                _to_jnp(rs.projmatrix),
            )
        return _to_torch(vis)

    def forward(self, means3D, means2D, opacities, shs=None,
                colors_precomp=None, scales=None, rotations=None,
                cov3D_precomp=None):
        if (shs is None and colors_precomp is None) or (
            shs is not None and colors_precomp is not None
        ):
            raise Exception(
                "Please provide excatly one of either SHs or precomputed "
                "colors!"
            )
        if ((scales is None or rotations is None)
                and cov3D_precomp is None) or (
            (scales is not None or rotations is not None)
            and cov3D_precomp is not None
        ):
            raise Exception(
                "Please provide exactly one of either scale/rotation pair "
                "or precomputed 3D covariance!"
            )
        return rasterize_gaussians(
            means3D, means2D, shs, colors_precomp, opacities, scales,
            rotations, cov3D_precomp, self.raster_settings, **self._kw,
        )
