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
    out2 = _render(scene, rs, full_output=True, seg_cap=2048)
    assert not bool(out2.grad_overflow)


def test_seg_cap_global_mode_never_flags():
    cam = make_camera(32, 32)
    scene = random_scene(jax.random.PRNGKey(3), 300, extent=0.4)
    rs = _settings(cam, sort_mode=SortMode.GLOBAL)
    out = _render(scene, rs, full_output=True, seg_cap=128)
    # GLOBAL backward has no seg_cap truncation.
    assert not bool(out.grad_overflow)


def test_suggest_capacities_sizes_a_clean_render():
    """The public sizing probe: capacities it suggests must render the
    scene without pair/pad/seg overflow, and be materially tighter than
    the 16*P default."""
    import jax
    import jax.numpy as jnp

    from stopthepop_tpu import suggest_capacities
    from stopthepop_tpu.config import (
        ExtendedSettings, GaussianRasterizationSettings,
    )
    from stopthepop_tpu.render.rasterize import (
        default_pair_capacity, rasterize_gaussians,
    )
    from stopthepop_tpu.utils.testing import make_camera, random_scene

    cam = make_camera(64, 64)
    scene = random_scene(jax.random.PRNGKey(5), 80)
    ext = ExtendedSettings()
    ext.culling_settings.rect_bounding = True
    ext.culling_settings.tight_opacity_bounding = True
    rs = GaussianRasterizationSettings(
        image_height=64, image_width=64, tanfovx=cam.tanfovx,
        tanfovy=cam.tanfovy, bg=jnp.zeros(3), scale_modifier=1.0,
        viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
        inv_viewprojmatrix=cam.inv_viewprojmatrix, sh_degree=3,
        campos=cam.campos, prefiltered=False, settings=ext,
    )
    cap, pad, seg = suggest_capacities(
        scene.means3d, scene.opacities, rs,
        scales=scene.scales, rotations=scene.rotations,
    )
    assert cap % 128 == 0 and pad % 128 == 0 and seg % 128 == 0
    assert cap < default_pair_capacity(scene.means3d.shape[0])
    out = rasterize_gaussians(
        scene.means3d, None, scene.shs, None, scene.opacities,
        scene.scales, scene.rotations, None, rs,
        pair_capacity=cap, pad_capacity=pad, seg_cap=seg,
        interpret=True, full_output=True,
    )
    assert not bool(out.overflow)
    assert not bool(out.grad_overflow)
    assert bool(jnp.isfinite(out.color).all())


def test_eager_autosize_beats_default_capacity_overflow():
    """Two wide Gaussians emit more pairs than the 16*P static default; an
    eager call must auto-size from the actual stream (the reference resizes
    dynamically after its device scan, rasterizer_impl.cu:316-321) instead
    of silently truncating the pair buffer. Regression: round-3 verify
    found the default API path returning a corrupt blend here."""
    cam = make_camera(128, 128, campos=(0.0, 0.0, -4.0))
    rs = GaussianRasterizationSettings(
        image_height=128, image_width=128, tanfovx=cam.tanfovx,
        tanfovy=cam.tanfovy, bg=jnp.full((3,), 0.25), scale_modifier=1.0,
        viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
        inv_viewprojmatrix=cam.inv_viewprojmatrix, sh_degree=0,
        campos=cam.campos, prefiltered=False, settings=ExtendedSettings(),
    )
    # red farther (view depth 4.5), green nearer (3.5), both over the center
    m = jnp.array([[0.0, 0.0, 0.5], [0.05, 0.0, -0.5]])
    c = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    o = jnp.array([[0.9], [0.9]])
    sc = jnp.full((2, 3), 0.3)
    q = jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (2, 1))
    out = rasterize_gaussians(
        m, None, None, c, o, sc, q, None, rs,
        interpret=True, full_output=True,
    )
    assert not bool(out.overflow), "eager call must auto-size"
    center = out.color[:, 64, 64]
    # nearer green dominates; the farther red still contributes ~ a*(1-a)
    assert float(center[1]) > 0.8
    assert 0.05 < float(center[0]) < 0.2
    # debug=True + explicit undersized capacity -> loud failure, not garbage
    rs_dbg = rs._replace(debug=True)
    with pytest.raises(Exception, match="pair buffer overflow"):
        jax.block_until_ready(
            rasterize_gaussians(
                m, None, None, c, o, sc, q, None, rs_dbg,
                pair_capacity=128 // 4, interpret=True,
            )[0]
        )


def test_seg_cap_truncated_grads_are_zero_and_finite():
    """Over-seg_cap segments truncate their pair gradients; the kernel now
    zero-fills the truncated tail in-kernel (the VJP wrapper no longer
    carries a per-column segment mask), so gradients must stay finite and
    the loss gradient must be unaffected for the in-cap prefix scene."""
    cam = make_camera(32, 32)
    scene = random_scene(jax.random.PRNGKey(4), 60)
    rs = _settings(cam, sort_mode=SortMode.PPX_KBUFFER)

    def loss(means, seg_cap):
        img, _ = rasterize_gaussians(
            means, None, scene.shs, None, scene.opacities,
            scene.scales, scene.rotations, None, rs, interpret=True,
            pair_capacity=4096, seg_cap=seg_cap,
        )
        return jnp.sum(img ** 2)

    g_small = jax.grad(lambda m: loss(m, 128))(scene.means3d)
    assert bool(jnp.isfinite(g_small).all())
    # Plenty of cap: same scene, full gradients — also finite, and the
    # truncated variant must not contain garbage-scale values.
    g_big = jax.grad(lambda m: loss(m, 2048))(scene.means3d)
    assert bool(jnp.isfinite(g_big).all())
    assert float(jnp.abs(g_small).max()) <= 10 * float(
        jnp.abs(g_big).max()
    ) + 1.0
