"""Unit tests for the core math ops against numpy scalar oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stopthepop_tpu.ops import covariance as cov
from stopthepop_tpu.ops import sh as sh_mod
from stopthepop_tpu.ops import sort as sort_mod
from stopthepop_tpu.ops import stopthepop as stp
from stopthepop_tpu.ops import transforms as tf
from stopthepop_tpu.constants import INVALID_TILE_ID
from stopthepop_tpu.utils.testing import make_camera, random_scene


def test_quat_to_rotmat_orthonormal():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (32, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    R = cov.quat_to_rotmat(q)
    eye = jnp.eye(3)[None].repeat(32, axis=0)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)


def test_cov3d_matches_direct_construction():
    key = jax.random.PRNGKey(1)
    scene = random_scene(key, 16)
    packed = cov.compute_cov3d(scene.scales, 1.0, scene.rotations)
    R = np.asarray(cov.quat_to_rotmat(scene.rotations))
    S2 = np.square(np.asarray(scene.scales))
    for i in range(16):
        sigma = R[i] @ np.diag(S2[i]) @ R[i].T
        np.testing.assert_allclose(
            np.asarray(cov.unpack_sym3(packed[i])), sigma, rtol=1e-5, atol=1e-6
        )


def test_inv_cov3d_is_inverse():
    key = jax.random.PRNGKey(2)
    scene = random_scene(key, 16, scale_range=(0.05, 0.3))
    sigma = cov.unpack_sym3(cov.compute_cov3d(scene.scales, 1.0, scene.rotations))
    inv = cov.unpack_sym3(cov.compute_inv_cov3d(scene.scales, 1.0, scene.rotations))
    prod = np.asarray(sigma @ inv)
    np.testing.assert_allclose(prod, np.eye(3)[None].repeat(16, 0), atol=1e-3)


def test_cov2d_oracle_small_gaussian_projects_to_focal_scaling():
    # An isotropic Gaussian at the view axis: cov2d ≈ (f/z)^2 * s^2 on the
    # diagonal (before dilation).
    cam = make_camera(128, 128, fovx_deg=60.0, campos=(0.0, 0.0, -4.0))
    s = 0.05
    cov3d = cov.compute_cov3d(
        jnp.array([[s, s, s]]), 1.0, jnp.array([[1.0, 0.0, 0.0, 0.0]])
    )
    p_view = jnp.array([[0.0, 0.0, 4.0]])
    focal = 128 / (2 * cam.tanfovx)
    c2d = cov.compute_cov2d(
        p_view, focal, focal, cam.tanfovx, cam.tanfovy, cov3d, cam.viewmatrix
    )
    expected = (focal / 4.0) ** 2 * s**2
    np.testing.assert_allclose(c2d[0, 0], expected, rtol=1e-4)
    np.testing.assert_allclose(c2d[0, 2], expected, rtol=1e-4)
    np.testing.assert_allclose(c2d[0, 1], 0.0, atol=1e-6)


def test_dilate_and_conic():
    c2d = jnp.array([[2.0, 0.5, 1.0]])
    dil, det, factor = cov.dilate_cov2d(c2d, proper_ewa_scaling=False)
    np.testing.assert_allclose(dil[0], [2.3, 0.5, 1.3], rtol=1e-6)
    np.testing.assert_allclose(det[0], 2.3 * 1.3 - 0.25, rtol=1e-6)
    assert factor[0] == 1.0
    co = cov.conic_opacity(dil, jnp.array([0.7]), det, factor)
    m = np.array([[2.3, 0.5], [0.5, 1.3]])
    minv = np.linalg.inv(m)
    np.testing.assert_allclose(
        np.asarray(co[0, :3]), [minv[0, 0], -minv[0, 1] * -1, minv[1, 1]], rtol=1e-5
    )
    # b convention: conic stores (a, b, c) with quadratic a dx^2 + 2b dx dy + c dy^2
    np.testing.assert_allclose(co[0, 1], minv[0, 1], rtol=1e-5)
    assert co[0, 3] == pytest.approx(0.7)


def test_proper_ewa_scaling_factor():
    c2d = jnp.array([[0.01, 0.0, 0.01]])  # tiny gaussian, dilation dominates
    _, det, factor = cov.dilate_cov2d(c2d, proper_ewa_scaling=True)
    expected = np.sqrt((0.01 * 0.01) / ((0.31) * (0.31)))
    np.testing.assert_allclose(factor[0], expected, rtol=1e-5)


def test_sh_degree0_is_dc():
    key = jax.random.PRNGKey(3)
    scene = random_scene(key, 8)
    rgb, clamped = sh_mod.eval_sh(
        scene.shs, scene.means3d, jnp.zeros(3), degree=0
    )
    expected = 0.28209479177387814 * scene.shs[:, 0] + 0.5
    np.testing.assert_allclose(rgb, np.maximum(expected, 0.0), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(clamped), np.asarray(expected < 0))


def test_sh_rotation_invariance_of_dc_only():
    # With only DC, direction must not matter.
    key = jax.random.PRNGKey(4)
    shs = jnp.zeros((4, 16, 3)).at[:, 0].set(jax.random.normal(key, (4, 3)))
    means = jax.random.normal(jax.random.PRNGKey(5), (4, 3))
    rgb1, _ = sh_mod.eval_sh(shs, means, jnp.zeros(3), degree=3)
    rgb2, _ = sh_mod.eval_sh(shs, means, jnp.ones(3) * 2.0, degree=3)
    np.testing.assert_allclose(rgb1, rgb2, rtol=1e-5)


def test_transforms_roundtrip_pix2world_world2ndc():
    cam = make_camera(64, 48, campos=(0.3, -0.2, -5.0))
    p = jnp.array([[0.1, 0.2, 0.5], [-0.4, 0.3, -0.2]])
    ndc = tf.world2ndc(p, cam.projmatrix)
    pix = jnp.stack(
        [tf.ndc2pix(ndc[:, 0], 64), tf.ndc2pix(ndc[:, 1], 48)], axis=-1
    )
    # pix2world follows the reference's convention (pix*2/S - 1), whose exact
    # inverse of ndc2pix needs the half-pixel shift.
    back = tf.pix2world(pix + 0.5, 64, 48, cam.inv_viewprojmatrix)
    # pix2world lands on the same view ray: direction to camera matches.
    d1 = p - cam.campos
    d2 = back - cam.campos
    d1 = d1 / jnp.linalg.norm(d1, axis=-1, keepdims=True)
    d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-4)


def test_in_frustum_near_plane():
    cam = make_camera(64, 64, campos=(0.0, 0.0, -4.0))
    pts = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, -3.9], [0.0, 0.0, -5.0]])
    vis, p_view = tf.in_frustum(pts, cam.viewmatrix)
    np.testing.assert_array_equal(np.asarray(vis), [True, False, False])
    np.testing.assert_allclose(p_view[0], [0.0, 0.0, 4.0], atol=1e-6)


def test_depth_along_ray_isotropic_equals_projection():
    # For an isotropic Gaussian, max-contribution depth along a ray is the
    # projection of (mean - campos) onto the unit ray direction.
    mean = jnp.array([0.3, -0.2, 2.0])
    campos = jnp.array([0.0, 0.0, -1.0])
    s = jnp.array([[0.1, 0.1, 0.1]])
    q = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    packed = stp.pack_inv_cov3d(s, 1.0, q, mean[None], campos)
    d = jnp.array([[0.1, 0.2, 0.97]])
    d = d / jnp.linalg.norm(d)
    t = stp.depth_along_ray(packed, d)
    expected = jnp.dot(mean - campos, d[0])
    np.testing.assert_allclose(t[0], expected, rtol=1e-5)


def test_max_contrib_power_rect_inside_zero():
    co = jnp.array([[1.0, 0.0, 1.0, 0.8]])
    power, pos = stp.max_contrib_power_rect(
        co, jnp.array([[8.0, 8.0]]), jnp.array([[0.0, 0.0]]), jnp.array([[15.0, 15.0]])
    )
    assert power[0] == 0.0
    np.testing.assert_allclose(pos[0], [8.0, 8.0])


def test_max_contrib_power_rect_outside_matches_bruteforce():
    # Brute-force the min power over the rect's pixels and compare.
    key = jax.random.PRNGKey(7)
    for i in range(20):
        k1, k2, k3, key = jax.random.split(key, 4)
        a, c = jax.random.uniform(k1, (2,), minval=0.01, maxval=0.3)
        b = jax.random.uniform(k2, (), minval=-0.9, maxval=0.9) * jnp.sqrt(a * c)
        mean = jax.random.uniform(k3, (2,), minval=-30.0, maxval=45.0)
        co = jnp.array([[a, b, c, 0.9]])
        rect_min = jnp.array([[0.0, 0.0]])
        rect_max = jnp.array([[15.0, 15.0]])
        power, _ = stp.max_contrib_power_rect(co, mean[None], rect_min, rect_max)
        xs, ys = jnp.meshgrid(jnp.arange(16.0), jnp.arange(16.0))
        dx = mean[0] - xs.reshape(-1)
        dy = mean[1] - ys.reshape(-1)
        brute = jnp.min(0.5 * (a * dx**2 + c * dy**2) + b * dx * dy)
        # The closed form bounds from below the pixel-grid brute force (its
        # optimum ranges over the continuous rect).
        assert power[0] <= brute + 1e-4
        # And it should be reasonably tight.
        assert power[0] >= brute - 0.5 * (a + c + 2 * abs(b))


def test_sort_pairs_and_ranges():
    tiles = jnp.array([2, 0, 1, 0, INVALID_TILE_ID, 1], dtype=jnp.int32)
    depths = jnp.array([0.5, 2.0, 1.0, 1.0, np.inf, 0.5], dtype=jnp.float32)
    vals = jnp.arange(6, dtype=jnp.int32)
    st, sd, sv = sort_mod.sort_pairs(tiles, depths, vals)
    np.testing.assert_array_equal(
        np.asarray(st), [0, 0, 1, 1, 2, INVALID_TILE_ID]
    )
    np.testing.assert_array_equal(np.asarray(sv), [3, 1, 5, 2, 0, 4])
    starts, ends = sort_mod.identify_tile_ranges(st, 3)
    np.testing.assert_array_equal(np.asarray(starts), [0, 2, 4])
    np.testing.assert_array_equal(np.asarray(ends), [2, 4, 5])


def test_per_tile_depth_positive_and_biased():
    cam = make_camera(64, 64)
    mean = jnp.array([[0.0, 0.0, 0.0]])
    s = jnp.array([[0.1, 0.1, 0.1]])
    q = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    packed = stp.pack_inv_cov3d(s, 1.0, q, mean, cam.campos)
    center = jnp.array([[31.5, 31.5]])
    d = stp.per_tile_depth(center, packed, cam.campos, 64, 64, cam.inv_viewprojmatrix)
    # Camera 4 units away, bias +8 → about 12.
    np.testing.assert_allclose(d[0], 12.0, atol=0.1)


def test_cumsum_mxu_matches_numpy():
    import numpy as np

    from stopthepop_tpu.ops.scan import cumsum_mxu

    rng = np.random.default_rng(0)
    for shape in [(7,), (128,), (129,), (1000,), (16385,), (3, 5000)]:
        x = rng.standard_normal(shape).astype(np.float32)
        got = np.asarray(cumsum_mxu(jnp.asarray(x)))
        want = np.cumsum(x, axis=-1, dtype=np.float64)
        assert np.abs((got - want) / (1 + np.abs(want))).max() < 1e-4, shape
        # Integer-valued inputs must stay exact (the rank_expand contract).
        m = (rng.random(shape) < 0.3).astype(np.float32)
        gi = np.asarray(cumsum_mxu(jnp.asarray(m)))
        assert (gi == np.cumsum(m, axis=-1)).all(), shape
