"""PER_PIXEL_KBUFFER: Pallas kernel vs the jnp sequential oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stopthepop_tpu.config import GlobalSortOrder
from stopthepop_tpu.render.duplicate import count_pairs
from stopthepop_tpu.render.naive import (
    render_full_sort_naive,
    render_kbuffer_naive,
)
from stopthepop_tpu.render.pipeline import render_tiled_kbuffer
from stopthepop_tpu.render.preprocess import preprocess
from stopthepop_tpu.utils.testing import make_camera, random_scene
from stopthepop_tpu.utils.testing import bucket_pair_capacity


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


@pytest.mark.parametrize("k", [1, 4, 8])
def test_kbuffer_kernel_matches_oracle(k):
    w = h = 48
    cam = make_camera(w, h)
    scene = random_scene(jax.random.PRNGKey(5), 200)
    prep = _prep(scene, cam)
    bg = jnp.array([0.15, 0.05, 0.3])
    img_o, T_o, n_o = render_kbuffer_naive(
        prep, bg, w, h, cam.campos, cam.inv_viewprojmatrix, k=k
    )
    cap = bucket_pair_capacity(prep)
    img_t, T_t, n_t, pairs, _ = render_tiled_kbuffer(
        prep, bg, image_width=w, image_height=h, capacity=cap,
        campos=cam.campos, inverse_vp=cam.inv_viewprojmatrix, k=k,
        interpret=True,
    )
    assert not bool(pairs.overflow)
    np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_o), atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(T_t).reshape(-1), np.asarray(T_o), atol=3e-5
    )
    # Contribution counts agree except where a near-tie flipped the order.
    mismatched = (
        np.asarray(n_t).reshape(-1) != np.asarray(n_o)
    ).mean()
    assert mismatched < 0.02


def test_kbuffer_large_k_approaches_full_sort():
    # With a window as large as the per-pixel stream, the k-buffer is an
    # exact per-pixel sort, so it must reproduce the FULL oracle.
    w = h = 32
    cam = make_camera(w, h)
    scene = random_scene(jax.random.PRNGKey(6), 60)
    prep = _prep(scene, cam)
    bg = jnp.zeros(3)
    img_full, T_full, _, _ = render_full_sort_naive(
        prep, bg, w, h, cam.campos, cam.inv_viewprojmatrix
    )
    img_kb, T_kb, _ = render_kbuffer_naive(
        prep, bg, w, h, cam.campos, cam.inv_viewprojmatrix, k=60
    )
    np.testing.assert_allclose(
        np.asarray(img_kb), np.asarray(img_full), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(T_kb), np.asarray(T_full), atol=1e-5
    )


@pytest.mark.parametrize(
    "order",
    [GlobalSortOrder.DISTANCE,
     pytest.param(GlobalSortOrder.PTD_CENTER, marks=pytest.mark.slow)],
    # quick tier smokes one order; the second is slow-tier matrix coverage
)
def test_kbuffer_sort_orders_and_culling_run(order):
    w = h = 32
    cam = make_camera(w, h)
    scene = random_scene(jax.random.PRNGKey(7), 100)
    prep = _prep(scene, cam)
    bg = jnp.zeros(3)
    cap = bucket_pair_capacity(prep)
    if True:
        img_o, T_o, _ = render_kbuffer_naive(
            prep, bg, w, h, cam.campos, cam.inv_viewprojmatrix, k=4,
            sort_order=order, tile_based_culling=True,
        )
        img_t, T_t, _, _, _ = render_tiled_kbuffer(
            prep, bg, image_width=w, image_height=h, capacity=cap,
            campos=cam.campos, inverse_vp=cam.inv_viewprojmatrix, k=4,
            sort_order=order, tile_based_culling=True, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(img_t), np.asarray(img_o), atol=5e-5
        )


@pytest.mark.parametrize(
    "group",
    [2, pytest.param(3, marks=pytest.mark.slow)],  # G=2 default quick;
    # the G=3 padding cell is slow-tier config-matrix coverage.
)
def test_kbuffer_grouped_tiles_match_ungrouped(group, monkeypatch):
    """group > 1 blends count-matched tiles per grid step (lane axis
    G x 256); the permutation + shared round loop must be value-exact vs
    the one-tile-per-step kernel, including non-divisible grids (padding
    with zero-count dummy tiles)."""
    w, h = 64, 32  # 4 x 2 = 8 tiles: group=3 exercises padding (8 % 3)
    cam = make_camera(w, h)
    scene = random_scene(jax.random.PRNGKey(11), 60)
    prep = _prep(scene, cam)
    bg = jnp.full((3,), 0.1)
    cap = bucket_pair_capacity(prep)

    def run():
        img, T, nc, _, _ = render_tiled_kbuffer(
            prep, bg, image_width=w, image_height=h, capacity=cap,
            campos=cam.campos, inverse_vp=cam.inv_viewprojmatrix, k=4,
            interpret=True,
        )
        return np.asarray(img), np.asarray(T), np.asarray(nc)

    monkeypatch.setenv("STP_KB_GROUP", "1")
    base = run()
    monkeypatch.setenv("STP_KB_GROUP", str(group))
    out = run()
    for b, o in zip(base, out):
        np.testing.assert_array_equal(b, o)


@pytest.mark.parametrize(
    "group, group_bwd",
    [
        # The shipping default: grouped forward, per-tile backward replay.
        (2, 1),
        # Fully grouped backward (non-default) with grid padding (20 % 3).
        pytest.param(3, 3, marks=pytest.mark.slow),
    ],
)
def test_kbuffer_grouped_backward_matches_ungrouped(group, group_bwd,
                                                    monkeypatch):
    """The grouped replay's per-tile moment routing + writeback must give
    bit-identical gradients to the one-tile-per-step backward."""
    from stopthepop_tpu.config import (ExtendedSettings,
                                       GaussianRasterizationSettings,
                                       SortMode)
    from stopthepop_tpu.render import rasterize

    w, h = 64, 32
    cam = make_camera(w, h)
    scene = random_scene(jax.random.PRNGKey(9), 80)
    ext = ExtendedSettings()
    ext.sort_settings.sort_mode = SortMode.PPX_KBUFFER
    ext.sort_settings.queue_sizes.per_pixel = 4
    rs = GaussianRasterizationSettings(
        image_height=h, image_width=w, tanfovx=cam.tanfovx,
        tanfovy=cam.tanfovy, bg=jnp.full((3,), 0.1), scale_modifier=1.0,
        viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
        inv_viewprojmatrix=cam.inv_viewprojmatrix, sh_degree=3,
        campos=cam.campos, prefiltered=False, settings=ext,
    )
    wts = jax.random.normal(jax.random.PRNGKey(1), (3, h, w))

    def loss(means):
        img, _ = rasterize.rasterize_gaussians(
            means, None, scene.shs, None, scene.opacities,
            scene.scales, scene.rotations, None, rs, interpret=True,
            pair_capacity=4096,
        )
        return jnp.sum(img * wts)

    monkeypatch.setenv("STP_KB_GROUP", "1")
    monkeypatch.setenv("STP_KB_GROUP_BWD", "1")
    g1 = jax.grad(loss)(scene.means3d)
    monkeypatch.setenv("STP_KB_GROUP", str(group))
    monkeypatch.setenv("STP_KB_GROUP_BWD", str(group_bwd))
    g3 = jax.grad(loss)(scene.means3d)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g3))
