"""Native PLY loader: roundtrip + fallback parity + 3DGS model mapping."""

import numpy as np
import jax

from stopthepop_tpu.io import ply
from stopthepop_tpu.models.gaussians import init_random


def test_roundtrip_native_and_fallback(tmp_path):
    rng = np.random.default_rng(0)
    props = {
        "x": rng.normal(size=1000).astype(np.float32),
        "y": rng.normal(size=1000).astype(np.float32),
        "opacity": rng.normal(size=1000).astype(np.float32),
    }
    path = str(tmp_path / "t.ply")
    ply.write_ply(path, props)
    got = ply.read_ply(path)
    got_np = ply._read_ply_numpy(path)
    for k in props:
        np.testing.assert_array_equal(got[k], props[k])
        np.testing.assert_array_equal(got_np[k], props[k])


def test_native_lib_builds():
    assert ply._load_native() is not None, "native ply_io failed to build"


def test_gaussian_model_roundtrip(tmp_path):
    model = init_random(jax.random.PRNGKey(0), 500, sh_degree=3)
    path = str(tmp_path / "model.ply")
    ply.save_gaussian_model(path, model)
    back = ply.load_gaussian_model(path)
    for a, b in zip(model, back):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b), rtol=1e-6
        )


def test_large_model_multithreaded(tmp_path):
    model = init_random(jax.random.PRNGKey(1), 50_000, sh_degree=3)
    path = str(tmp_path / "big.ply")
    ply.save_gaussian_model(path, model)
    back = ply.load_gaussian_model(path, n_threads=8)
    np.testing.assert_allclose(
        np.asarray(model.means3d, np.float32), np.asarray(back.means3d),
        rtol=1e-6,
    )
