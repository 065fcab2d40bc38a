"""COLMAP loader tests: binary/text round-trip, camera convention, KNN init."""

import math
import os

import numpy as np
import pytest

from stopthepop_tpu.io.colmap import (
    CAMERA_MODELS,
    ColmapCamera,
    ColmapImage,
    ColmapPoints,
    camera_from_colmap,
    load_colmap,
    qvec2rotmat,
    read_cameras_binary,
    read_images_binary,
    read_points3d_binary,
    write_cameras_binary,
    write_images_binary,
    write_points3d_binary,
)


def _make_scene(tmp_path, binary=True):
    sparse = tmp_path / "sparse" / "0"
    sparse.mkdir(parents=True)
    cams = {
        1: ColmapCamera(1, "PINHOLE", 640, 480,
                        np.array([500.0, 510.0, 320.0, 240.0])),
    }
    # Camera at origin looking down +z (identity quaternion).
    images = [
        ColmapImage(1, np.array([1.0, 0.0, 0.0, 0.0]),
                    np.array([0.0, 0.0, 0.0]), 1, "frame_000.png"),
        ColmapImage(2, np.array([math.cos(0.2), 0.0, math.sin(0.2), 0.0]),
                    np.array([0.1, -0.2, 0.3]), 1, "frame_001.png"),
    ]
    rng = np.random.default_rng(0)
    pts = ColmapPoints(
        xyz=rng.uniform(-1, 1, (50, 3)).astype(np.float32),
        rgb=rng.uniform(0, 1, (50, 3)).astype(np.float32),
        error=np.ones(50, np.float32),
    )
    write_cameras_binary(str(sparse / "cameras.bin"), cams)
    write_images_binary(str(sparse / "images.bin"), images)
    write_points3d_binary(str(sparse / "points3D.bin"), pts)
    return cams, images, pts


def test_binary_roundtrip(tmp_path):
    cams, images, pts = _make_scene(tmp_path)
    sparse = tmp_path / "sparse" / "0"
    rc = read_cameras_binary(str(sparse / "cameras.bin"))
    assert rc[1].model == "PINHOLE" and rc[1].width == 640
    np.testing.assert_allclose(rc[1].params, cams[1].params)
    ri = read_images_binary(str(sparse / "images.bin"))
    assert [im.name for im in ri] == ["frame_000.png", "frame_001.png"]
    np.testing.assert_allclose(ri[1].qvec, images[1].qvec)
    np.testing.assert_allclose(ri[1].tvec, images[1].tvec)
    rp = read_points3d_binary(str(sparse / "points3D.bin"))
    np.testing.assert_allclose(rp.xyz, pts.xyz, atol=1e-6)
    # rgb quantized to u8
    np.testing.assert_allclose(rp.rgb, pts.rgb, atol=1.0 / 255.0)


def test_load_colmap_scene(tmp_path):
    _make_scene(tmp_path)
    dataset, points = load_colmap(str(tmp_path))
    assert len(dataset) == 2
    assert points.xyz.shape == (50, 3)
    cam = dataset[0]
    assert cam.width == 640 and cam.height == 480
    # PINHOLE fx=500 over width 640: tanfovx = 320/500.
    assert abs(cam.tanfovx - 320.0 / 500.0) < 1e-6
    assert abs(cam.tanfovy - 240.0 / 510.0) < 1e-6


def test_camera_convention(tmp_path):
    """A world point straight ahead of an identity camera must project to the
    image center with positive view-space depth (torch-3DGS p @ M convention)."""
    cams, images, _ = _make_scene(tmp_path)
    cam = camera_from_colmap(images[0], cams[1])
    p = np.array([0.0, 0.0, 5.0, 1.0], np.float32)
    view = p @ cam.viewmatrix
    assert view[2] > 0  # depth along +z
    clip = p @ cam.projmatrix
    ndc = clip[:3] / clip[3]
    assert abs(ndc[0]) < 1e-5 and abs(ndc[1]) < 1e-5
    # campos: identity rotation, zero translation -> origin
    np.testing.assert_allclose(cam.campos, 0.0, atol=1e-7)


def test_qvec2rotmat_orthonormal():
    q = np.array([0.8, 0.1, -0.3, 0.5])
    q = q / np.linalg.norm(q)
    R = qvec2rotmat(q)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
    assert abs(np.linalg.det(R) - 1.0) < 1e-10


def test_knn_scale_init():
    import jax.numpy as jnp

    from stopthepop_tpu.models.gaussians import from_points, mean_knn_distance

    # Regular grid with spacing h: mean 3-NN distance == h exactly.
    h = 0.25
    g = np.stack(np.meshgrid(*[np.arange(6) * h] * 3, indexing="ij"), -1)
    pts = jnp.asarray(g.reshape(-1, 3), jnp.float32)
    d = mean_knn_distance(pts, k=3)
    np.testing.assert_allclose(np.asarray(d), h, rtol=0.25)

    colors = jnp.full((pts.shape[0], 3), 0.5)
    model = from_points(pts, colors)
    scales = np.exp(np.asarray(model.scales_log))
    assert scales.shape == (pts.shape[0], 3)
    np.testing.assert_allclose(scales, h, rtol=0.3)
    # DC color of gray 0.5 is 0 in SH space.
    np.testing.assert_allclose(np.asarray(model.sh_dc), 0.0, atol=1e-6)
