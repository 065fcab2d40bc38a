"""Multi-device sharded training vs single-device equivalence (8 CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from stopthepop_tpu.config import ExtendedSettings, GaussianRasterizationSettings
from stopthepop_tpu.models.gaussians import init_random
from stopthepop_tpu.parallel.train import (
    make_mesh,
    make_sharded_train_step,
    shard_model,
)
from stopthepop_tpu.train.loss import rgb_loss
from stopthepop_tpu.train.trainer import CameraArrays, make_optimizer, render_model
from stopthepop_tpu.utils.testing import make_camera


def _static(cam, size):
    return GaussianRasterizationSettings(
        image_height=size, image_width=size,
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        bg=jnp.zeros(3), scale_modifier=1.0,
        viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
        inv_viewprojmatrix=cam.inv_viewprojmatrix,
        sh_degree=3, campos=cam.campos, prefiltered=False,
        settings=ExtendedSettings(),
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_sharded_step_matches_single_device():
    size = 32
    P = 64 * 4  # divisible by the gauss axis
    cam = make_camera(size, size)
    static = _static(cam, size)
    mesh = make_mesh(8)
    model = init_random(jax.random.PRNGKey(0), P)
    optimizer = make_optimizer(1e-3)
    step, n_batch = make_sharded_train_step(
        mesh, optimizer, static=static, pair_capacity=16 * P, interpret=True
    )
    assert n_batch == 8

    cam_arrays = CameraArrays(
        cam.viewmatrix, cam.projmatrix, cam.inv_viewprojmatrix, cam.campos
    )
    cams = CameraArrays(
        viewmatrix=jnp.tile(cam.viewmatrix[None], (n_batch, 1, 1)),
        projmatrix=jnp.tile(cam.projmatrix[None], (n_batch, 1, 1)),
        inv_viewprojmatrix=jnp.tile(cam.inv_viewprojmatrix[None], (n_batch, 1, 1)),
        campos=jnp.tile(cam.campos[None], (n_batch, 1)),
    )
    targets = jnp.tile(
        jax.random.uniform(jax.random.PRNGKey(1), (3, size, size))[None],
        (n_batch, 1, 1, 1),
    )

    model_sh = shard_model(mesh, model)
    opt_sh = optimizer.init(model_sh)
    new_model_sh, new_opt_sh, loss_sh = step(model_sh, opt_sh, cams, targets)

    # Single-device reference step (same camera on every device, so the mean
    # gradient equals the single-camera gradient).
    def loss_fn(model):
        color, _ = render_model(
            model, cam_arrays, static=static,
            pair_capacity=16 * P, interpret=True,
        )
        return rgb_loss(color, targets[0])

    loss_ref, grads = jax.value_and_grad(loss_fn)(model)
    opt_ref = optimizer.init(model)
    updates, _ = optimizer.update(grads, opt_ref, model)
    new_model_ref = optax.apply_updates(model, updates)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    for name, a, b in zip(
        model._fields,
        jax.tree.leaves(jax.device_get(new_model_sh)),
        jax.tree.leaves(new_model_ref),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5,
            err_msg=f"sharded parameter mismatch: {name}",
        )


def test_hosts_global_mesh():
    from stopthepop_tpu.parallel import hosts

    hosts.initialize()  # single-process: no-op
    mesh = hosts.global_mesh(("tiles",))
    assert mesh.shape["tiles"] == len(jax.devices())
    mesh2 = hosts.global_mesh(("data", "gauss"))
    assert mesh2.shape["data"] * mesh2.shape["gauss"] == len(jax.devices())
