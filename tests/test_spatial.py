"""Spatially-sharded (tiles x gaussians) rendering vs single-device (8 CPU).

The band-sharded renderer + halo-exchange loss must match the single-device
pipeline exactly: same image, same loss, allclose gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stopthepop_tpu.config import ExtendedSettings, GaussianRasterizationSettings
from stopthepop_tpu.models.gaussians import init_random
from stopthepop_tpu.parallel.spatial import (
    make_spatial_render,
    make_spatial_train_step,
    plan_bands,
    shard_model,
)
from stopthepop_tpu.train.loss import rgb_loss
from stopthepop_tpu.train.trainer import (
    CameraArrays,
    make_optimizer,
    render_model,
)
from stopthepop_tpu.utils.testing import make_camera

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

SIZE = 128  # 8 tile rows -> 1 tile row per band on 8 devices


def _static(cam):
    return GaussianRasterizationSettings(
        image_height=SIZE, image_width=SIZE,
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        bg=jnp.array([0.1, 0.2, 0.3]), scale_modifier=1.0,
        viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
        inv_viewprojmatrix=cam.inv_viewprojmatrix,
        sh_degree=3, campos=cam.campos, prefiltered=False,
        settings=ExtendedSettings(),
    )


def _setup():
    cam = make_camera(SIZE, SIZE, campos=(0.0, 0.0, -4.0))
    static = _static(cam)
    model = init_random(jax.random.PRNGKey(0), 256)
    cams = CameraArrays(
        cam.viewmatrix, cam.projmatrix, cam.inv_viewprojmatrix, cam.campos
    )
    mesh = Mesh(np.array(jax.devices()[:8]), ("tiles",))
    return cam, static, model, cams, mesh


def test_spatial_render_matches_single_device():
    cam, static, model, cams, mesh = _setup()
    ref, *_ = render_model(model, cams, static=static, pair_capacity=8192,
                           interpret=True)

    render, cfg = make_spatial_render(
        mesh, static=static, band_capacity=4096, interpret=True)
    model_sh = shard_model(model, mesh)
    img = render(model_sh, cams)
    assert img.shape == ref.shape
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_spatial_loss_and_grads_match():
    cam, static, model, cams, mesh = _setup()
    target = jax.random.uniform(jax.random.PRNGKey(5), (3, SIZE, SIZE))

    def ref_loss(m):
        img, *_ = render_model(m, cams, static=static, pair_capacity=8192,
                               interpret=True)
        return rgb_loss(img, target)

    ref_val, ref_grads = jax.value_and_grad(ref_loss)(model)

    optimizer = make_optimizer(0.0)  # lr 0: step returns grads' effect only
    step = make_spatial_train_step(
        mesh, optimizer, static=static, band_capacity=4096, interpret=True)
    model_sh = shard_model(model, mesh)
    opt_sh = jax.tree.map(
        lambda x: x, optimizer.init(model_sh)
    )
    cfg = plan_bands(SIZE, SIZE, 8, 4096)
    band_h = cfg.band_gy * 16
    tgt_pad = jnp.zeros((3, 8 * band_h, SIZE)).at[:, :SIZE, :].set(target)
    tgt_sh = jax.device_put(
        tgt_pad, NamedSharding(mesh, P(None, "tiles", None))
    )
    _, _, loss = step(model_sh, opt_sh, cams, tgt_sh)
    np.testing.assert_allclose(float(loss), float(ref_val), atol=2e-5,
                               rtol=2e-5)


@pytest.mark.slow
def test_spatial_step_trains():
    cam, static, model, cams, mesh = _setup()
    target = jax.random.uniform(jax.random.PRNGKey(5), (3, SIZE, SIZE))
    optimizer = make_optimizer(5e-3)
    step = make_spatial_train_step(
        mesh, optimizer, static=static, band_capacity=4096, interpret=True)
    model_sh = shard_model(model, mesh)
    opt_sh = optimizer.init(model_sh)
    cfg = plan_bands(SIZE, SIZE, 8, 4096)
    tgt_pad = jnp.zeros((3, 8 * cfg.band_gy * 16, SIZE)).at[:, :SIZE, :].set(
        target)
    tgt_sh = jax.device_put(
        tgt_pad, NamedSharding(mesh, P(None, "tiles", None))
    )
    losses = []
    for _ in range(3):
        model_sh, opt_sh, loss = step(model_sh, opt_sh, cams, tgt_sh)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_spatial_resort_modes_match_single_device():
    """PTD_MAX GLOBAL and PER_PIXEL_KBUFFER band-sharded == single-device
    (the per-band inverse-VP remap must reproduce exact full-image rays)."""
    from stopthepop_tpu.config import GlobalSortOrder, SortMode

    cam, static, model, cams, mesh = _setup()
    for sort_mode, order in (
        (SortMode.GLOBAL, GlobalSortOrder.PTD_MAX),
        (SortMode.PPX_KBUFFER, GlobalSortOrder.Z_DEPTH),
        (SortMode.PPX_KBUFFER, GlobalSortOrder.PTD_CENTER),
    ):
        ext = ExtendedSettings()
        ext.sort_settings.sort_mode = sort_mode
        ext.sort_settings.sort_order = order
        st = static._replace(settings=ext)
        ref, *_ = render_model(model, cams, static=st, pair_capacity=8192,
                               interpret=True)
        render, cfg = make_spatial_render(
            mesh, static=st, band_capacity=4096, interpret=True)
        model_sh = shard_model(model, mesh)
        img = render(model_sh, cams)
        np.testing.assert_allclose(
            np.asarray(img), np.asarray(ref), atol=1e-4,
            err_msg=f"sharded mismatch for {sort_mode.name}/{order.name}",
        )
