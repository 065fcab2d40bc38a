"""End-to-end trainer CLI: synthetic dataset on disk -> train -> PLY out."""

import json
import math
import os

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from stopthepop_tpu.config import SortMode
from stopthepop_tpu.io.cameras import camera_from_c2w
from stopthepop_tpu.io.images import write_png
from stopthepop_tpu.io.ply import load_gaussian_model
from stopthepop_tpu.models.gaussians import init_random
from stopthepop_tpu.train import cli
from stopthepop_tpu.train.trainer import render_model


def _orbit_c2w(theta: float, radius: float = 4.0, height: float = 0.5):
    """OpenGL camera-to-world orbiting the origin."""
    pos = np.array([radius * math.sin(theta), height,
                    radius * math.cos(theta)])
    forward = -pos / np.linalg.norm(pos)      # look at origin
    z = -forward                              # OpenGL camera looks down -z
    up = np.array([0.0, 1.0, 0.0])
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, pos
    return c2w


def _make_dataset(root, size=32, n_frames=4):
    """Render a GT random scene from orbit cameras into PNG + transforms."""
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    fovx = math.radians(60.0)
    gt = init_random(jax.random.PRNGKey(7), 60, sh_degree=0)
    frames = []
    for i in range(n_frames):
        c2w = _orbit_c2w(2 * math.pi * i / n_frames)
        cam = camera_from_c2w(c2w, fovx, size, size)
        static = cli.make_static_settings(
            cam, np.zeros(3, np.float32), 0, SortMode.GLOBAL)
        img, *_ = render_model(gt, cli.to_arrays(cam), static=static,
                               pair_capacity=4096, interpret=True)
        u8 = np.clip(np.asarray(img).transpose(1, 2, 0) * 255.0,
                     0, 255).astype(np.uint8)
        rel = f"./train/r_{i}"
        write_png(os.path.join(root, rel[2:] + ".png"), u8)
        frames.append({"file_path": rel, "transform_matrix": c2w.tolist()})
    meta = {"camera_angle_x": fovx, "frames": frames}
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump(meta, f)


@pytest.mark.slow
def test_cli_trains_on_disk_dataset(tmp_path):
    root = str(tmp_path / "scene")
    _make_dataset(root)
    out_ply = str(tmp_path / "model.ply")
    state = cli.main([
        "--data", root, "--iters", "25", "--capacity", "64",
        "--init-points", "20", "--sh-degree", "0",
        "--sort-mode", "GLOBAL", "--pair-capacity", "8192",
        "--densify-from", "5", "--densify-every", "10",
        "--eval-every", "20", "--eval-frames", "2",
        "--out", out_ply, "--interpret",
        "--scene-extent", "1.5",
    ])
    assert int(state.step) == 25
    assert os.path.exists(out_ply)
    loaded = load_gaussian_model(out_ply)
    assert loaded.sh_rest.shape[1] == 0  # sh_degree 0
    assert loaded.means3d.shape[0] == 64
    assert np.all(np.isfinite(np.asarray(loaded.means3d)))


def _make_colmap_dataset(root, size=32, n_frames=4):
    """Same GT scene, but laid out as a COLMAP capture (sparse/0 + images)."""
    from stopthepop_tpu.io.colmap import (
        ColmapCamera, ColmapImage, ColmapPoints,
        write_cameras_binary, write_images_binary, write_points3d_binary,
    )

    sparse = os.path.join(root, "sparse", "0")
    os.makedirs(sparse, exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    fovx = math.radians(60.0)
    focal = size / (2.0 * math.tan(fovx / 2.0))
    cams = {1: ColmapCamera(1, "PINHOLE", size, size,
                            np.array([focal, focal, size / 2, size / 2]))}
    gt = init_random(jax.random.PRNGKey(7), 60, sh_degree=0)
    images = []
    for i in range(n_frames):
        c2w_gl = _orbit_c2w(2 * math.pi * i / n_frames)
        cam = camera_from_c2w(c2w_gl, fovx, size, size)
        static = cli.make_static_settings(
            cam, np.zeros(3, np.float32), 0, SortMode.GLOBAL)
        img, *_ = render_model(gt, cli.to_arrays(cam), static=static,
                               pair_capacity=4096, interpret=True)
        u8 = np.clip(np.asarray(img).transpose(1, 2, 0) * 255.0,
                     0, 255).astype(np.uint8)
        name = f"frame_{i:03d}.png"
        write_png(os.path.join(root, "images", name), u8)
        # DatasetCamera.viewmatrix is the transposed w2c; COLMAP stores w2c
        # as quaternion+translation in the same axis convention.
        w2c = np.asarray(cam.viewmatrix, np.float64).T
        R, t = w2c[:3, :3], w2c[:3, 3]
        qw = 0.5 * math.sqrt(max(1.0 + R[0, 0] + R[1, 1] + R[2, 2], 1e-12))
        qvec = np.array([
            qw,
            (R[2, 1] - R[1, 2]) / (4 * qw),
            (R[0, 2] - R[2, 0]) / (4 * qw),
            (R[1, 0] - R[0, 1]) / (4 * qw),
        ])
        images.append(ColmapImage(i + 1, qvec, t.copy(), 1, name))
    rng = np.random.default_rng(3)
    pts = ColmapPoints(
        xyz=rng.uniform(-1.2, 1.2, (40, 3)).astype(np.float32),
        rgb=rng.uniform(0, 1, (40, 3)).astype(np.float32),
        error=np.ones(40, np.float32),
    )
    write_cameras_binary(os.path.join(sparse, "cameras.bin"), cams)
    write_images_binary(os.path.join(sparse, "images.bin"), images)
    write_points3d_binary(os.path.join(sparse, "points3D.bin"), pts)


@pytest.mark.slow
def test_cli_trains_on_colmap_dataset(tmp_path):
    root = str(tmp_path / "colmap_scene")
    _make_colmap_dataset(root)
    state = cli.main([
        "--data", root, "--iters", "10", "--capacity", "64",
        "--sh-degree", "0", "--sort-mode", "GLOBAL",
        "--pair-capacity", "8192",
        "--densify-from", "1000",  # off
        "--eval-every", "10", "--eval-frames", "1",
        "--interpret",
    ])
    assert int(state.step) == 10
    assert np.all(np.isfinite(np.asarray(state.model.means3d)))


@pytest.mark.slow
def test_cli_auto_pair_capacity(tmp_path):
    """No --pair-capacity: the CLI sizes the buffer from measured counts."""
    root = str(tmp_path / "scene2")
    _make_dataset(root, n_frames=2)
    state = cli.main([
        "--data", root, "--iters", "4", "--capacity", "64",
        "--init-points", "20", "--sh-degree", "0",
        "--sort-mode", "GLOBAL",
        "--densify-from", "1000",
        "--eval-every", "10", "--eval-frames", "1",
        "--interpret", "--scene-extent", "1.5",
    ])
    assert int(state.step) == 4
    assert np.all(np.isfinite(np.asarray(state.model.means3d)))
