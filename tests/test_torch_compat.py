"""Torch front-end (torch_compat): reference-shaped API over the JAX
pipeline — forward equality vs the native JAX render and autograd gradient
equality vs jax.grad."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from stopthepop_tpu import torch_compat as tc  # noqa: E402
from stopthepop_tpu.config import (  # noqa: E402
    ExtendedSettings,
    GaussianRasterizationSettings as JaxSettings,
)
from stopthepop_tpu.render.rasterize import (  # noqa: E402
    rasterize_gaussians as jax_rasterize,
)
from stopthepop_tpu.utils.testing import make_camera, random_scene  # noqa: E402


def _setup(w=48, h=48, n=40):
    cam = make_camera(w, h, campos=(0.0, 0.0, -4.0))
    scene = random_scene(jax.random.PRNGKey(3), n)
    ext = ExtendedSettings()
    common = dict(
        image_height=h, image_width=w, tanfovx=cam.tanfovx,
        tanfovy=cam.tanfovy, scale_modifier=1.0, sh_degree=3,
        prefiltered=False, settings=ext,
    )
    t = lambda x: torch.from_numpy(np.asarray(x))  # noqa: E731
    trs = tc.GaussianRasterizationSettings(
        bg=t(jnp.array([0.1, 0.2, 0.3])), viewmatrix=t(cam.viewmatrix),
        projmatrix=t(cam.projmatrix),
        inv_viewprojmatrix=t(cam.inv_viewprojmatrix), campos=t(cam.campos),
        **common,
    )
    jrs = JaxSettings(
        bg=jnp.array([0.1, 0.2, 0.3]), viewmatrix=cam.viewmatrix,
        projmatrix=cam.projmatrix,
        inv_viewprojmatrix=cam.inv_viewprojmatrix, campos=cam.campos,
        **common,
    )
    return cam, scene, trs, jrs, t


def test_torch_forward_matches_jax():
    cam, scene, trs, jrs, t = _setup()
    r = tc.GaussianRasterizer(trs, interpret=True)
    color_t, radii_t = r(
        t(scene.means3d), None, t(scene.opacities), shs=t(scene.shs),
        scales=t(scene.scales), rotations=t(scene.rotations),
    )
    color_j, radii_j = jax_rasterize(
        scene.means3d, None, scene.shs, None, scene.opacities,
        scene.scales, scene.rotations, None, jrs, interpret=True,
    )
    # jit (torch path) vs eager (native call) XLA fusion differences land
    # within a few ULPs.
    np.testing.assert_allclose(
        color_t.numpy(), np.asarray(color_j), atol=3e-6
    )
    np.testing.assert_array_equal(radii_t.numpy(), np.asarray(radii_j))


@pytest.mark.slow
def test_torch_autograd_matches_jax_grad():
    cam, scene, trs, jrs, t = _setup()
    weights = np.asarray(
        jax.random.normal(jax.random.PRNGKey(7), (3, 48, 48))
    )

    means_t = t(scene.means3d).clone().requires_grad_(True)
    opac_t = t(scene.opacities).clone().requires_grad_(True)
    shs_t = t(scene.shs).clone().requires_grad_(True)
    scales_t = t(scene.scales).clone().requires_grad_(True)
    rots_t = t(scene.rotations).clone().requires_grad_(True)
    means2d_t = torch.zeros(
        (scene.means3d.shape[0], 3), requires_grad=True
    )

    r = tc.GaussianRasterizer(trs, interpret=True)
    color_t, _ = r(means_t, means2d_t, opac_t, shs=shs_t,
                   scales=scales_t, rotations=rots_t)
    (color_t * torch.from_numpy(weights)).sum().backward()

    def loss(means, opac, shs, scales, rots, m2d):
        color, _ = jax_rasterize(
            means, m2d, shs, None, opac, scales, rots, None, jrs,
            interpret=True,
        )
        return jnp.sum(color * jnp.asarray(weights))

    g = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(
        scene.means3d, scene.opacities, scene.shs, scene.scales,
        scene.rotations, jnp.zeros((scene.means3d.shape[0], 3)),
    )
    pairs = [
        ("means3D", means_t.grad, g[0]),
        ("opacities", opac_t.grad, g[1]),
        ("shs", shs_t.grad, g[2]),
        ("scales", scales_t.grad, g[3]),
        ("rotations", rots_t.grad, g[4]),
        ("means2D", means2d_t.grad, g[5]),
    ]
    for name, gt, gj in pairs:
        a = np.asarray(gj)
        scale = np.abs(a).max() + 1e-8
        # jit (torch path) vs eager (jax.grad call) reassociation noise;
        # same tolerances as the kernel-vs-oracle gradient tests.
        np.testing.assert_allclose(
            gt.numpy(), a, atol=3e-4 * scale, rtol=3e-3,
            err_msg=f"torch grad mismatch for {name}",
        )
    # The densification dummy must carry the NDC-scaled screen gradient.
    assert float(np.abs(means2d_t.grad.numpy()).max()) > 0.0


def test_torch_mark_visible_and_validation():
    cam, scene, trs, jrs, t = _setup()
    r = tc.GaussianRasterizer(trs, interpret=True)
    vis = r.markVisible(t(scene.means3d))
    assert vis.dtype == torch.bool and vis.shape[0] == scene.means3d.shape[0]
    with pytest.raises(Exception, match="SHs or precomputed"):
        r(t(scene.means3d), None, t(scene.opacities))
    with pytest.raises(Exception, match="scale/rotation"):
        r(t(scene.means3d), None, t(scene.opacities), shs=t(scene.shs),
          scales=t(scene.scales))


def test_torch_precomp_paths_match_jax():
    """colors_precomp + cov3D_precomp branch (the reference's alternate
    input pairing) through the torch front-end."""
    cam, scene, trs, jrs, t = _setup()
    from stopthepop_tpu.ops.covariance import compute_cov3d

    cov3d = compute_cov3d(scene.scales, 1.0, scene.rotations)
    r = tc.GaussianRasterizer(trs, interpret=True)
    color_t, _ = r(
        t(scene.means3d), None, t(scene.opacities),
        colors_precomp=t(scene.colors), cov3D_precomp=t(cov3d),
    )
    color_j, _ = jax_rasterize(
        scene.means3d, None, None, scene.colors, scene.opacities,
        None, None, cov3d, jrs, interpret=True,
    )
    np.testing.assert_allclose(
        color_t.numpy(), np.asarray(color_j), atol=3e-6
    )


def test_torch_debug_snapshot_on_failure(tmp_path, monkeypatch):
    """debug=True dumps the exact inputs on failure (the reference's
    snapshot_fw.dump contract, __init__.py:96-103) at the torch layer."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("STP_SNAPSHOT_DIR", str(tmp_path))
    cam, scene, trs, jrs, t = _setup()
    trs = trs._replace(debug=True)
    r = tc.GaussianRasterizer(trs, interpret=True)
    bad_means = t(scene.means3d)[:, :2]  # wrong shape -> pipeline raises
    with pytest.raises(Exception):
        r(bad_means, None, t(scene.opacities), shs=t(scene.shs),
          scales=t(scene.scales), rotations=t(scene.rotations))
    dump = tmp_path / "snapshot_fw.dump"
    assert dump.exists()
    payload = torch.load(str(dump), weights_only=False)
    assert "means3D" in payload and "raster_settings" in payload
    assert payload["means3D"].shape == bad_means.shape
