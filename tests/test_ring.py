"""Ring-streamed Gaussian sharding (parallel/ring.py) vs single-device.

The ring path (Gaussian shards rotating via ppermute while each chip bins
pairs for its band — SURVEY §5.7's bounded-memory scale-out) must match
the single-device pipeline: same image, same loss, gradient flow intact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stopthepop_tpu.config import (
    ExtendedSettings,
    GaussianRasterizationSettings,
    GlobalSortOrder,
    SortMode,
)
from stopthepop_tpu.models.gaussians import init_random
from stopthepop_tpu.parallel.ring import make_ring_render, make_ring_train_step
from stopthepop_tpu.parallel.spatial import plan_bands, shard_model
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

SIZE = 128


def _static(cam, sort_order=GlobalSortOrder.Z_DEPTH,
            sort_mode=SortMode.GLOBAL, queues=None):
    ext = ExtendedSettings()
    ext.sort_settings.sort_order = sort_order
    ext.sort_settings.sort_mode = sort_mode
    if queues is not None:
        qs = ext.sort_settings.queue_sizes
        qs.tile_4x4, qs.tile_2x2, qs.per_pixel = queues
    return GaussianRasterizationSettings(
        image_height=SIZE, image_width=SIZE,
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        bg=jnp.array([0.1, 0.2, 0.3]), scale_modifier=1.0,
        viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
        inv_viewprojmatrix=cam.inv_viewprojmatrix,
        sh_degree=3, campos=cam.campos, prefiltered=False,
        settings=ext,
    )


def _setup(sort_order=GlobalSortOrder.Z_DEPTH,
           sort_mode=SortMode.GLOBAL, queues=None):
    cam = make_camera(SIZE, SIZE, campos=(0.0, 0.0, -4.0))
    static = _static(cam, sort_order, sort_mode, queues)
    model = init_random(jax.random.PRNGKey(0), 256)
    cams = CameraArrays(
        cam.viewmatrix, cam.projmatrix, cam.inv_viewprojmatrix, cam.campos
    )
    mesh = Mesh(np.array(jax.devices()[:8]), ("shards",))
    return cam, static, model, cams, mesh


@pytest.mark.parametrize(
    "sort_order",
    [GlobalSortOrder.Z_DEPTH,
     pytest.param(GlobalSortOrder.PTD_MAX, marks=pytest.mark.slow)],
    # quick-tier budget: Z_DEPTH smoke-covers the ring; the PTD cell is
    # slow-tier config-matrix coverage.
)
def test_ring_render_matches_single_device(sort_order):
    cam, static, model, cams, mesh = _setup(sort_order)
    ref, *_ = render_model(model, cams, static=static, pair_capacity=8192,
                           interpret=True)

    render, cfg = make_ring_render(
        mesh, static=static, per_step_capacity=1024, interpret=True)
    model_sh = shard_model(model, mesh, axis="shards")
    img, overflow = render(model_sh, cams)
    assert img.shape == ref.shape
    assert not bool(overflow)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize(
    "sort_mode,queues",
    [
        pytest.param(SortMode.PPX_KBUFFER, (64, 8, 4),
                     marks=pytest.mark.slow),
        pytest.param(SortMode.HIER, (16, 8, 4), marks=pytest.mark.slow),
    ],
    ids=["kbuffer", "hier"],
)
def test_ring_resort_matches_single_device(sort_mode, queues):
    """The bounded-memory path runs the paper's quality config (PTD +
    resort window) — the k-window survives shard rotation because the ring
    delivers the band stream in global sort order (SURVEY §5.7/§7.6)."""
    cam, static, model, cams, mesh = _setup(
        GlobalSortOrder.PTD_MAX, sort_mode, queues
    )
    ref, *_ = render_model(model, cams, static=static, pair_capacity=8192,
                           interpret=True)

    render, cfg = make_ring_render(
        mesh, static=static, per_step_capacity=1024, interpret=True)
    model_sh = shard_model(model, mesh, axis="shards")
    img, overflow = render(model_sh, cams)
    assert img.shape == ref.shape
    assert not bool(overflow)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ring_overflow_reported():
    cam, static, model, cams, mesh = _setup()
    render, cfg = make_ring_render(
        mesh, static=static, per_step_capacity=8, interpret=True)
    model_sh = shard_model(model, mesh, axis="shards")
    _, overflow = render(model_sh, cams)
    assert bool(overflow)


@pytest.mark.slow
def test_ring_loss_and_grads_match():
    cam, static, model, cams, mesh = _setup()
    target = jax.random.uniform(jax.random.PRNGKey(5), (3, SIZE, SIZE))

    def ref_loss(m):
        img, *_ = render_model(m, cams, static=static, pair_capacity=8192,
                               interpret=True)
        return rgb_loss(img, target)

    ref_val = ref_loss(model)

    optimizer = make_optimizer(0.0)
    step = make_ring_train_step(
        mesh, optimizer, static=static, per_step_capacity=1024,
        interpret=True)
    model_sh = shard_model(model, mesh, axis="shards")
    opt_sh = optimizer.init(model_sh)
    cfg = plan_bands(SIZE, SIZE, 8, 8 * 1024)
    band_h = cfg.band_gy * 16
    tgt_pad = jnp.zeros((3, 8 * band_h, SIZE)).at[:, :SIZE, :].set(target)
    tgt_sh = jax.device_put(
        tgt_pad, NamedSharding(mesh, P(None, "shards", None))
    )
    _, _, loss = step(model_sh, opt_sh, cams, tgt_sh)
    np.testing.assert_allclose(float(loss), float(ref_val), atol=2e-5,
                               rtol=2e-5)


@pytest.mark.slow
def test_ring_step_trains():
    cam, static, model, cams, mesh = _setup()
    target = jax.random.uniform(jax.random.PRNGKey(5), (3, SIZE, SIZE))
    optimizer = make_optimizer(5e-3)
    step = make_ring_train_step(
        mesh, optimizer, static=static, per_step_capacity=1024,
        interpret=True)
    model_sh = shard_model(model, mesh, axis="shards")
    opt_sh = optimizer.init(model_sh)
    cfg = plan_bands(SIZE, SIZE, 8, 8 * 1024)
    tgt_pad = jnp.zeros((3, 8 * cfg.band_gy * 16, SIZE)).at[:, :SIZE, :].set(
        target)
    tgt_sh = jax.device_put(
        tgt_pad, NamedSharding(mesh, P(None, "shards", None))
    )
    losses = []
    for _ in range(3):
        model_sh, opt_sh, loss = step(model_sh, opt_sh, cams, tgt_sh)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
