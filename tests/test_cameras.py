"""Dataset camera loading (NeRF-synthetic transforms.json).

Validates that the OpenGL->3DGS convention conversion in io/cameras.py
produces the same matrices as the hand-built test camera, and that the
projection round-trips through inv_viewprojmatrix.
"""

import json
import math

import numpy as np

from stopthepop_tpu.io.cameras import (
    camera_from_c2w,
    focal2fov,
    fov2focal,
    load_nerf_synthetic,
    to_camera_arrays,
)
from stopthepop_tpu.utils.testing import make_camera


def _opengl_c2w(campos):
    """OpenGL camera at ``campos`` looking along world +z (y up)."""
    c2w = np.eye(4)
    c2w[1, 1] = -1.0  # camera y (up) maps to world -y
    c2w[2, 2] = -1.0  # camera -z (forward) maps to world +z
    c2w[:3, 3] = campos
    return c2w


def test_fov_focal_roundtrip():
    fov = math.radians(47.0)
    assert abs(focal2fov(fov2focal(fov, 800), 800) - fov) < 1e-12


def test_camera_from_c2w_matches_test_camera():
    w, h = 64, 48
    ref = make_camera(w, h, fovx_deg=60.0, campos=(0.0, 0.0, -4.0))
    cam = camera_from_c2w(
        _opengl_c2w((0.0, 0.0, -4.0)), math.radians(60.0), w, h
    )
    np.testing.assert_allclose(cam.viewmatrix, np.asarray(ref.viewmatrix),
                               atol=1e-6)
    np.testing.assert_allclose(cam.projmatrix, np.asarray(ref.projmatrix),
                               atol=1e-5)
    np.testing.assert_allclose(cam.campos, np.asarray(ref.campos), atol=1e-6)
    assert abs(cam.tanfovx - ref.tanfovx) < 1e-9
    assert abs(cam.tanfovy - ref.tanfovy) < 1e-9


def test_projection_roundtrip_through_inverse():
    cam = camera_from_c2w(
        _opengl_c2w((0.5, -0.3, -4.0)), math.radians(55.0), 128, 96
    )
    pts = np.random.default_rng(0).uniform(-1, 1, (16, 3))
    hom = np.concatenate([pts, np.ones((16, 1))], axis=1).astype(np.float32)
    clip = hom @ cam.projmatrix          # transposed convention: row-vector
    back = clip @ cam.inv_viewprojmatrix
    back = back[:, :3] / back[:, 3:4]
    np.testing.assert_allclose(back, pts, atol=1e-3)


def test_load_nerf_synthetic(tmp_path):
    meta = {
        "camera_angle_x": math.radians(60.0),
        "frames": [
            {
                "file_path": "./train/r_0",
                "transform_matrix": _opengl_c2w((0.0, 0.0, -4.0)).tolist(),
            },
            {
                "file_path": "./train/r_1",
                "transform_matrix": _opengl_c2w((1.0, 0.0, -4.0)).tolist(),
            },
        ],
    }
    p = tmp_path / "transforms_train.json"
    p.write_text(json.dumps(meta))
    cams = load_nerf_synthetic(str(p), width=64, height=64)
    assert len(cams) == 2
    np.testing.assert_allclose(cams[1].campos, [1.0, 0.0, -4.0], atol=1e-6)
    arrs = to_camera_arrays(cams[0])
    assert arrs.viewmatrix.shape == (4, 4)
    assert arrs.campos.shape == (3,)
