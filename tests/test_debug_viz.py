"""Debug visualization modes (reference rasterizer_debug.h:11-20 parity)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from stopthepop_tpu.config import (
    DebugVisualization,
    ExtendedSettings,
    GaussianRasterizationSettings,
    SortMode,
)
from stopthepop_tpu.render.debug_viz import DebugVisualizationData
from stopthepop_tpu.render.rasterize import rasterize_gaussians
from stopthepop_tpu.utils.testing import make_camera, random_scene


def _settings(cam, mode=SortMode.GLOBAL, render_depth=False):
    ext = ExtendedSettings()
    ext.sort_settings.sort_mode = mode
    return GaussianRasterizationSettings(
        image_height=cam.height, image_width=cam.width,
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        bg=jnp.zeros(3), scale_modifier=1.0,
        viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
        inv_viewprojmatrix=cam.inv_viewprojmatrix,
        sh_degree=3, campos=cam.campos, prefiltered=False,
        settings=ext, render_depth=render_depth,
    )


def _render(scene, rs, **kw):
    return rasterize_gaussians(
        scene.means3d, None, scene.shs, None, scene.opacities,
        scene.scales, scene.rotations, None, rs, interpret=True, **kw,
    )


def test_render_depth_orders_correctly():
    # Two Gaussians at different depths: the depth viz must differ between a
    # pixel seeing the near one and a pixel seeing the far one.
    cam = make_camera(48, 48, campos=(0.0, 0.0, -4.0))
    means = jnp.array([[-0.5, 0.0, 0.0], [0.5, 0.0, 1.5]])
    colors = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    rs = _settings(cam, render_depth=True)
    img, _ = rasterize_gaussians(
        means, None, None, colors, jnp.array([[0.95], [0.95]]),
        jnp.full((2, 3), 0.25), jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1)),
        None, rs, interpret=True,
    )
    img = np.asarray(img)
    assert np.isfinite(img).all()
    # Colormapped output: the two lobes get different colors.
    left = img[:, 24, 12]
    right = img[:, 24, 36]
    assert np.abs(left - right).max() > 0.1


@pytest.mark.slow
def test_all_viz_modes_finite():
    cam = make_camera(48, 48)
    scene = random_scene(jax.random.PRNGKey(3), 80)
    data = DebugVisualizationData(debug_pixel=(5, 7))
    seen = set()
    for mode in (
        DebugVisualization.SortErrorOpacity,
        DebugVisualization.SortErrorDistance,
        DebugVisualization.GaussianCountPerTile,
        DebugVisualization.GaussianCountPerPixel,
        DebugVisualization.Depth,
        DebugVisualization.Transmittance,
    ):
        img, _ = _render(
            scene, _settings(cam), debug_visualization=mode, debug_data=data
        )
        img = np.asarray(img)
        assert np.isfinite(img).all(), mode
        assert img.shape == (3, 48, 48)
        seen.add(float(img.sum()))
        assert data.maximum >= data.minimum
    assert len(seen) == 6  # every mode renders something distinct


@pytest.mark.slow
def test_viz_modes_on_resort_kernels():
    cam = make_camera(32, 32)
    scene = random_scene(jax.random.PRNGKey(4), 60)
    for mode in (SortMode.PPX_KBUFFER, SortMode.HIER, SortMode.PPX_FULL):
        img, _ = _render(
            scene, _settings(cam, mode, render_depth=True)
        )
        assert np.isfinite(np.asarray(img)).all(), mode
