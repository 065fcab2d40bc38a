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
    cap = int(count_pairs(prep)) + 64
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


def test_tile_shape_rejected_for_resort_modes():
    from stopthepop_tpu.config import (
        ExtendedSettings,
        GaussianRasterizationSettings,
    )
    from stopthepop_tpu.render.rasterize import GaussianRasterizer

    cam = make_camera(32, 32)
    scene = random_scene(jax.random.PRNGKey(0), 8)
    ext = ExtendedSettings()
    ext.sort_settings.sort_mode = SortMode.PPX_KBUFFER
    rs = GaussianRasterizationSettings(
        image_height=32, image_width=32,
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        bg=jnp.zeros(3), scale_modifier=1.0,
        viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
        inv_viewprojmatrix=cam.inv_viewprojmatrix,
        sh_degree=3, campos=cam.campos, prefiltered=False, settings=ext,
    )
    r = GaussianRasterizer(rs, tile_shape=(32, 16), interpret=True)
    with pytest.raises(NotImplementedError, match="tile_shape"):
        r(scene.means3d, None, scene.opacities, shs=scene.shs,
          scales=scene.scales, rotations=scene.rotations)
