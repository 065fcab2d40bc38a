"""Tests for the procedural structured scene and dataset-size JSON keys."""

import json
import os

import numpy as np
import pytest

from stopthepop_tpu.utils.synthetic import structured_scene


def test_structured_scene_shapes_and_ranges():
    model, extent = structured_scene(2_000, seed=3)
    P = model.num_gaussians
    assert P == 2_000
    assert extent == pytest.approx(1.3)
    m = np.asarray(model.means3d)
    assert np.isfinite(m).all()
    # Everything stays inside the NeRF-synthetic object radius.
    assert np.abs(m).max() < 1.5
    q = np.asarray(model.rotations)
    assert np.allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)
    s = np.asarray(model.scales())
    assert (s > 0).all() and s.max() < 0.5
    # Flat splats: the normal-axis scale is the smallest by construction.
    assert (s[:, 2] <= s[:, :2].min(axis=1) + 1e-7).all()
    rgb = np.asarray(model.sh_dc)[:, 0] * 0.28209479177387814 + 0.5
    assert rgb.min() > 0.0 and rgb.max() < 1.0
    # The checker texture must actually vary (densification needs detail).
    assert rgb.std() > 0.1


def test_structured_scene_deterministic():
    a, _ = structured_scene(500, seed=7)
    b, _ = structured_scene(500, seed=7)
    assert np.array_equal(np.asarray(a.means3d), np.asarray(b.means3d))


def test_transforms_json_size_keys(tmp_path):
    """load_nerf_synthetic honors optional w/h keys (synthetic datasets)."""
    from stopthepop_tpu.io.cameras import load_nerf_synthetic, orbit_camera

    cam = orbit_camera(0.3, 0.7, 128, 96)
    c2w = np.eye(4)  # any OpenGL c2w; orbit matrices are exercised elsewhere
    meta = {
        "camera_angle_x": 0.7,
        "w": 128,
        "h": 96,
        "frames": [{"file_path": "train/r_0",
                    "transform_matrix": c2w.tolist()}],
    }
    p = tmp_path / "transforms_train.json"
    p.write_text(json.dumps(meta))
    cams = load_nerf_synthetic(os.fspath(p))
    assert cams[0].width == 128 and cams[0].height == 96
    assert cams[0].tanfovx == pytest.approx(cam.tanfovx)
    # Default (no w/h) stays the classic Blender 800x800.
    meta.pop("w"), meta.pop("h")
    p.write_text(json.dumps(meta))
    cams = load_nerf_synthetic(os.fspath(p))
    assert cams[0].width == 800 and cams[0].height == 800
