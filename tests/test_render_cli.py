"""Render CLI: PLY -> orbit frames on disk."""

import os

import numpy as np

from stopthepop_tpu.io.images import read_png
from stopthepop_tpu.io.ply import save_gaussian_model
from stopthepop_tpu.models.gaussians import init_random
from stopthepop_tpu.render import cli as render_cli

import jax


def test_render_cli_orbit(tmp_path):
    model = init_random(jax.random.PRNGKey(3), 80, sh_degree=1)
    ply = str(tmp_path / "m.ply")
    save_gaussian_model(ply, model)
    out = str(tmp_path / "frames")
    render_cli.main([
        "--ply", ply, "--out", out, "--frames", "3", "--size", "64",
        "--sort-mode", "GLOBAL", "--pair-capacity", "8192", "--interpret",
    ])
    files = sorted(os.listdir(out))
    assert files == ["frame_0000.png", "frame_0001.png", "frame_0002.png"]
    img = read_png(os.path.join(out, files[0]))
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()
    # Orbit views differ.
    img2 = read_png(os.path.join(out, files[1]))
    assert not np.array_equal(img, img2)
