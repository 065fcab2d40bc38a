"""API contract checks: prefiltered validation and seg_cap overflow flag.

Reference semantics being mirrored:
  * prefiltered=True with out-of-frustum points __trap()s in the reference
    (cuda_rasterizer/auxiliary.h:228-232); here it raises.
  * resort-mode backward kernels bound per-tile gradient buffers at
    ``seg_cap``; exceeding it must raise the ``grad_overflow`` flag (the
    sibling of the pair-buffer ``overflow`` flag) instead of failing silently.
"""

import jax
import jax.numpy as jnp
import pytest

from stopthepop_tpu.config import (
    ExtendedSettings,
    GaussianRasterizationSettings,
    SortMode,
)
from stopthepop_tpu.render.rasterize import rasterize_gaussians
from stopthepop_tpu.utils.testing import make_camera, random_scene


def _settings(cam, sort_mode=SortMode.GLOBAL, prefiltered=False):
    ext = ExtendedSettings()
    ext.sort_settings.sort_mode = sort_mode
    return GaussianRasterizationSettings(
        image_height=cam.height, image_width=cam.width,
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        bg=jnp.zeros(3), scale_modifier=1.0,
        viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
        inv_viewprojmatrix=cam.inv_viewprojmatrix,
        sh_degree=3, campos=cam.campos, prefiltered=prefiltered,
        settings=ext,
    )


def _render(scene, rs, **kw):
    return rasterize_gaussians(
        scene.means3d, None, scene.shs, None, scene.opacities,
        scene.scales, scene.rotations, None, rs, interpret=True, **kw,
    )


def test_prefiltered_violation_raises():
    cam = make_camera(32, 32)
    scene = random_scene(jax.random.PRNGKey(0), 20)
    # Push one point behind the camera (view z < 0.2 fails the frustum test).
    means = scene.means3d.at[0].set(jnp.array([0.0, 0.0, -50.0]))
    scene = scene._replace(means3d=means)
    rs = _settings(cam, prefiltered=True)
    with pytest.raises(Exception, match="prefiltered"):
        img, _ = _render(scene, rs)
        jax.block_until_ready(img)


def test_prefiltered_ok_when_all_visible():
    cam = make_camera(32, 32)
    scene = random_scene(jax.random.PRNGKey(1), 20)
    rs = _settings(cam, prefiltered=True)
    img, radii = _render(scene, rs)
    assert bool(jnp.all(jnp.isfinite(img)))


@pytest.mark.slow
def test_seg_cap_overflow_flag_fires():
    cam = make_camera(32, 32)
    # Dense cluster -> some tile exceeds a deliberately tiny seg_cap.
    scene = random_scene(jax.random.PRNGKey(2), 300, extent=0.4)
    rs = _settings(cam, sort_mode=SortMode.PPX_KBUFFER)
    out = _render(scene, rs, full_output=True, seg_cap=128)
    assert bool(out.grad_overflow)
    # A generous seg_cap clears the flag on the same scene.
    out2 = _render(scene, rs, full_output=True, seg_cap=16384)
    assert not bool(out2.grad_overflow)


def test_seg_cap_global_mode_never_flags():
    cam = make_camera(32, 32)
    scene = random_scene(jax.random.PRNGKey(3), 300, extent=0.4)
    rs = _settings(cam, sort_mode=SortMode.GLOBAL)
    out = _render(scene, rs, full_output=True, seg_cap=128)
    # GLOBAL backward has no seg_cap truncation.
    assert not bool(out.grad_overflow)
