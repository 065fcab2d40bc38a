"""Binning-tile overrides (tile_shape) for the GLOBAL path.

The reference hard-codes BLOCK_X/BLOCK_Y = 16 (config.h:16-17); on TPU the
binning tile is a free parameter of the GLOBAL pipeline — bigger tiles cut
the pair domain (every sort/gather/scan stage scales with it) at the cost
of more blend-kernel work per tile.  These tests pin the invariant that the
tile size is an implementation detail: any tiling must produce the same
image (pairs dropped by a smaller tiling are below the alpha threshold by
the rect-bound construction, auxiliary.h:91-101).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stopthepop_tpu.config import SortMode
from stopthepop_tpu.render.duplicate import count_pairs
from stopthepop_tpu.render.pipeline import render_tiled
from stopthepop_tpu.render.preprocess import preprocess
from stopthepop_tpu.utils.testing import make_camera, random_scene
from stopthepop_tpu.utils.testing import bucket_pair_capacity


def _prep(scene, cam, **kw):
    return preprocess(
        scene.means3d,
        scene.opacities,
        scales=scene.scales,
        rotations=scene.rotations,
        shs=scene.shs,
        viewmatrix=cam.viewmatrix,
        projmatrix=cam.projmatrix,
        campos=cam.campos,
        tanfovx=cam.tanfovx,
        tanfovy=cam.tanfovy,
        image_width=cam.width,
        image_height=cam.height,
        sh_degree=3,
        **kw,
    )


@pytest.mark.slow
@pytest.mark.parametrize("tile", [(32, 16), (32, 32)])
def test_tile_shape_matches_16x16(tile):
    tx, ty = tile
    cam = make_camera(64, 64)
    scene = random_scene(jax.random.PRNGKey(2), 300)
    bg = jnp.array([0.2, 0.3, 0.1])

    prep16 = _prep(scene, cam)
    cap16 = int(count_pairs(prep16)) + 64
    img16, T16, _, p16, _ = render_tiled(
        prep16, bg, image_width=64, image_height=64, capacity=cap16,
        interpret=True,
    )

    prep = _prep(scene, cam, tile_x=tx, tile_y=ty)
    cap = bucket_pair_capacity(prep)
    img, T, _, pairs, _ = render_tiled(
        prep, bg, image_width=64, image_height=64, capacity=cap,
        tile_x=tx, tile_y=ty, interpret=True,
    )
    assert not bool(pairs.overflow)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img16), atol=5e-5)
    np.testing.assert_allclose(np.asarray(T), np.asarray(T16), atol=5e-5)


@pytest.mark.slow
def test_tile_shape_gradients_match_16x16():
    cam = make_camera(48, 48)
    scene = random_scene(jax.random.PRNGKey(5), 120)
    bg = jnp.zeros(3)

    def loss(opacities, tx, ty):
        prep = _prep(scene._replace(opacities=opacities), cam,
                     tile_x=tx, tile_y=ty)
        img, _, _, _, _ = render_tiled(
            prep, bg, image_width=48, image_height=48, capacity=4096,
            tile_x=tx, tile_y=ty, interpret=True,
        )
        return jnp.sum(img * img)

    g16 = jax.grad(lambda o: loss(o, 16, 16))(scene.opacities)
    g32 = jax.grad(lambda o: loss(o, 32, 16))(scene.opacities)
    np.testing.assert_allclose(np.asarray(g32), np.asarray(g16),
                               rtol=1e-3, atol=1e-4)


def _raster_settings(cam, mode, k=4):
    from stopthepop_tpu.config import (
        ExtendedSettings,
        GaussianRasterizationSettings,
    )

    ext = ExtendedSettings()
    ext.sort_settings.sort_mode = mode
    ext.sort_settings.queue_sizes.per_pixel = k
    ext.sort_settings.queue_sizes.tile_4x4 = 16
    ext.sort_settings.queue_sizes.tile_2x2 = 8
    return GaussianRasterizationSettings(
        image_height=cam.height, image_width=cam.width,
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        bg=jnp.array([0.2, 0.1, 0.3]), scale_modifier=1.0,
        viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
        inv_viewprojmatrix=cam.inv_viewprojmatrix,
        sh_degree=3, campos=cam.campos, prefiltered=False, settings=ext,
    )


@pytest.mark.parametrize(
    "mode",
    [SortMode.PPX_KBUFFER,
     pytest.param(SortMode.HIER, marks=pytest.mark.slow)],  # quick-tier
    # budget: the KBUFFER cell smoke-covers the shared split/grad-row
    # machinery; the HIER cell is slow-tier config-matrix coverage.
)
def test_tile_shape_resort_modes_match_16x16(mode):
    """32x16 binning for the resort modes: each 16x16 half-tile blends the
    parent segment (pipeline.split_binning_segments); off-half pairs never
    pass the alpha threshold, so with Z_DEPTH order each pixel sees the
    exact same committed sequence as under 16x16 binning — forward AND
    gradient must match. The backward additionally exercises the
    grad-row-split writeback (the halves share a segment)."""
    from stopthepop_tpu.render import rasterize

    cam = make_camera(64, 16)  # bin 2x1 -> blend 4x1: 2 parents
    scene = random_scene(jax.random.PRNGKey(7), 80)
    wts = jax.random.normal(jax.random.PRNGKey(1), (3, 16, 64))
    rs = _raster_settings(cam, mode)

    def loss(opacities, tile_shape):
        img, _ = rasterize.rasterize_gaussians(
            scene.means3d, None, scene.shs, None, opacities,
            scene.scales, scene.rotations, None, rs, interpret=True,
            pair_capacity=4096, tile_shape=tile_shape,
        )
        return jnp.sum(img * wts), img

    (l16, img16), g16 = jax.value_and_grad(
        lambda o: loss(o, None), has_aux=True)(scene.opacities)
    (l32, img32), g32 = jax.value_and_grad(
        lambda o: loss(o, (32, 16)), has_aux=True)(scene.opacities)
    np.testing.assert_allclose(np.asarray(img32), np.asarray(img16),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(g32), np.asarray(g16),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_tile_shape_full_matches_16x16():
    from stopthepop_tpu.render.pipeline import render_tiled_full

    cam = make_camera(64, 32)
    scene = random_scene(jax.random.PRNGKey(3), 120)
    bg = jnp.array([0.1, 0.2, 0.3])

    prep16 = _prep(scene, cam)
    img16, T16, _, p16, _ = render_tiled_full(
        prep16, bg, image_width=64, image_height=32, capacity=4096,
        campos=cam.campos, inverse_vp=cam.inv_viewprojmatrix,
        interpret=True,
    )
    prep32 = _prep(scene, cam, tile_x=32, tile_y=16)
    img32, T32, _, p32, _ = render_tiled_full(
        prep32, bg, image_width=64, image_height=32, capacity=4096,
        campos=cam.campos, inverse_vp=cam.inv_viewprojmatrix,
        tile_x=32, tile_y=16, interpret=True,
    )
    assert not bool(p16.overflow) and not bool(p32.overflow)
    np.testing.assert_allclose(np.asarray(img32), np.asarray(img16),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(T32), np.asarray(T16), atol=5e-5)


def test_tile_shape_unsupported_size_rejected_for_resort_modes():
    """Resort modes accept 16x16 and 32x16 only (GLOBAL also takes 32x32
    etc.); anything else raises instead of silently mis-rendering."""
    from stopthepop_tpu.render.rasterize import GaussianRasterizer

    cam = make_camera(32, 32)
    scene = random_scene(jax.random.PRNGKey(0), 8)
    rs = _raster_settings(cam, SortMode.PPX_KBUFFER)
    r = GaussianRasterizer(rs, tile_shape=(32, 32), interpret=True)
    with pytest.raises(NotImplementedError, match="binning tile"):
        r(scene.means3d, None, scene.opacities, shs=scene.shs,
          scales=scene.scales, rotations=scene.rotations)


@pytest.mark.slow
def test_pack_fwd_matches_unpacked():
    """f16-packed forward payload (duplicate.pack_table_f16): the render
    must match the unpacked path within f16 rounding of the packed features
    (conic/opacity/rgb ~5e-4 relative -> a few 1e-3 absolute on the image),
    and gradients must flow at matching magnitude (they are taken w.r.t.
    the rounded forward values — mixed precision, not a different math)."""
    from stopthepop_tpu.render.pipeline import render_tiled

    cam = make_camera(64, 32)
    scene = random_scene(jax.random.PRNGKey(6), 150)
    bg = jnp.array([0.15, 0.25, 0.35])

    def run(opacities, pack):
        prep = _prep(scene._replace(opacities=opacities), cam)
        img, T, _, pairs, _ = render_tiled(
            prep, bg, image_width=64, image_height=32, capacity=4096,
            pack_fwd=pack, interpret=True,
        )
        return jnp.sum(img * img), (img, pairs.overflow)

    (l0, (img0, ov0)), g0 = jax.value_and_grad(
        lambda o: run(o, False), has_aux=True)(scene.opacities)
    (l1, (img1, ov1)), g1 = jax.value_and_grad(
        lambda o: run(o, True), has_aux=True)(scene.opacities)
    assert not bool(ov0) and not bool(ov1)
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img0), atol=5e-3)
    g0, g1 = np.asarray(g0), np.asarray(g1)
    assert np.isfinite(g1).all() and np.abs(g1).max() > 0
    np.testing.assert_allclose(g1, g0, rtol=0.05, atol=5e-3)
