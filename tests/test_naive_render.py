"""End-to-end tests of the naive oracle renderers (BASELINE config 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stopthepop_tpu.config import GlobalSortOrder
from stopthepop_tpu.render.preprocess import preprocess
from stopthepop_tpu.render.naive import (
    render_full_sort_naive,
    render_global_naive,
)
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


def test_preprocess_shapes_and_culling():
    cam = make_camera(64, 64)
    scene = random_scene(jax.random.PRNGKey(0), 500)
    prep = _prep(scene, cam)
    assert prep.mean2d.shape == (500, 2)
    assert prep.valid.dtype == bool
    assert int(prep.valid.sum()) > 100  # most random Gaussians visible
    # Behind-camera points must be culled.
    behind = scene.means3d[:, 2] < -3.8
    assert not bool((prep.valid & behind).any())
    # Culled Gaussians have radii == 0 and tiles_touched == 0.
    np.testing.assert_array_equal(
        np.asarray(prep.radii[~prep.valid]), 0
    )
    np.testing.assert_array_equal(
        np.asarray(prep.tiles_touched[~prep.valid]), 0
    )


def test_render_global_naive_basic():
    cam = make_camera(64, 64)
    scene = random_scene(jax.random.PRNGKey(1), 300)
    prep = _prep(scene, cam)
    img, final_T, n_contrib = render_global_naive(
        prep, jnp.zeros(3), cam.width, cam.height
    )
    img = np.asarray(img)
    assert img.shape == (3, 64, 64)
    assert np.isfinite(img).all()
    assert img.max() > 0.05  # something rendered
    assert (np.asarray(final_T) <= 1.0).all() and (np.asarray(final_T) >= 0.0).all()
    assert int(np.asarray(n_contrib).max()) > 0


def test_render_background_only_where_empty():
    cam = make_camera(64, 64)
    # One tiny Gaussian in the center; corners must be pure background.
    scene = random_scene(jax.random.PRNGKey(2), 1, extent=0.0, scale_range=(0.01, 0.011))
    prep = _prep(scene, cam)
    bg = jnp.array([0.25, 0.5, 0.75])
    img, final_T, _ = render_global_naive(prep, bg, 64, 64)
    img = np.asarray(img)
    np.testing.assert_allclose(img[:, 0, 0], [0.25, 0.5, 0.75], atol=1e-5)
    assert np.asarray(final_T)[0] == pytest.approx(1.0)


def test_render_chunk_invariance():
    # The chunked masked-cumprod blend must be exactly chunk-size invariant.
    cam = make_camera(48, 32)
    scene = random_scene(jax.random.PRNGKey(3), 200)
    prep = _prep(scene, cam)
    img1, T1, n1 = render_global_naive(prep, jnp.zeros(3), 48, 32, chunk=64)
    img2, T2, n2 = render_global_naive(prep, jnp.zeros(3), 48, 32, chunk=200)
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(T1), np.asarray(T2), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))


def test_render_distance_vs_zdepth_order_differ_only_slightly():
    cam = make_camera(48, 48)
    scene = random_scene(jax.random.PRNGKey(4), 200)
    img_z, _, _ = render_global_naive(
        _prep(scene, cam, sort_order=GlobalSortOrder.Z_DEPTH),
        jnp.zeros(3), 48, 48,
    )
    img_d, _, _ = render_global_naive(
        _prep(scene, cam, sort_order=GlobalSortOrder.DISTANCE),
        jnp.zeros(3), 48, 48,
    )
    # Different sort orders: images are close but not required identical.
    assert np.abs(np.asarray(img_z) - np.asarray(img_d)).mean() < 0.1


def test_full_sort_close_to_global_for_well_separated_scene():
    # With well-separated small Gaussians, global z-order ≈ per-ray order.
    cam = make_camera(32, 32)
    scene = random_scene(jax.random.PRNGKey(5), 60, scale_range=(0.01, 0.03))
    prep = _prep(scene, cam)
    img_g, _, _ = render_global_naive(prep, jnp.zeros(3), 32, 32)
    img_f, _, _, _ = render_full_sort_naive(
        prep, jnp.zeros(3), 32, 32, cam.campos, cam.inv_viewprojmatrix
    )
    assert np.abs(np.asarray(img_g) - np.asarray(img_f)).mean() < 0.02


def test_gradients_match_finite_differences():
    cam = make_camera(24, 24)
    scene = random_scene(jax.random.PRNGKey(6), 40, scale_range=(0.05, 0.15))

    def loss(means, scales, opac):
        prep = preprocess(
            means,
            opac,
            scales=scales,
            rotations=scene.rotations,
            colors_precomp=scene.colors,
            viewmatrix=cam.viewmatrix,
            projmatrix=cam.projmatrix,
            campos=cam.campos,
            tanfovx=cam.tanfovx,
            tanfovy=cam.tanfovy,
            image_width=24,
            image_height=24,
        )
        img, _, _ = render_global_naive(prep, jnp.zeros(3), 24, 24)
        return jnp.sum(img**2)

    g_means, g_scales, g_opac = jax.grad(loss, argnums=(0, 1, 2))(
        scene.means3d, scene.scales, scene.opacities
    )
    assert np.isfinite(np.asarray(g_means)).all()
    assert np.isfinite(np.asarray(g_scales)).all()
    assert float(jnp.abs(g_means).max()) > 0.0

    # Finite differences on a few coordinates.
    f0 = loss(scene.means3d, scene.scales, scene.opacities)
    rng = np.random.RandomState(0)
    for _ in range(4):
        i = rng.randint(0, 40)
        j = rng.randint(0, 3)
        eps = 3e-4
        m2 = scene.means3d.at[i, j].add(eps)
        f1 = loss(m2, scene.scales, scene.opacities)
        fd = (float(f1) - float(f0)) / eps
        an = float(g_means[i, j])
        assert an == pytest.approx(fd, abs=max(0.05, 0.05 * abs(fd)))

    # Opacity gradient finite difference.
    for _ in range(3):
        i = rng.randint(0, 40)
        eps = 1e-3
        o2 = scene.opacities.at[i].add(eps)
        f1 = loss(scene.means3d, scene.scales, o2)
        fd = (float(f1) - float(f0)) / eps
        an = float(g_opac[i])
        assert an == pytest.approx(fd, abs=max(0.05, 0.05 * abs(fd)))


def test_sh_gradients_flow():
    cam = make_camera(24, 24)
    scene = random_scene(jax.random.PRNGKey(7), 30)

    def loss(shs):
        prep = preprocess(
            scene.means3d,
            scene.opacities,
            scales=scene.scales,
            rotations=scene.rotations,
            shs=shs,
            viewmatrix=cam.viewmatrix,
            projmatrix=cam.projmatrix,
            campos=cam.campos,
            tanfovx=cam.tanfovx,
            tanfovy=cam.tanfovy,
            image_width=24,
            image_height=24,
            sh_degree=2,
        )
        img, _, _ = render_global_naive(prep, jnp.zeros(3), 24, 24)
        return jnp.sum(img)

    g = jax.grad(loss)(scene.shs)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g[:, :9]).max()) > 0.0
    # Degree-3 coefficients are inactive at sh_degree=2.
    assert float(jnp.abs(g[:, 9:]).max()) == 0.0
