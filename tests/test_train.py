"""Training-loop smoke tests (BASELINE config 4): loss decreases."""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from stopthepop_tpu.config import ExtendedSettings, GaussianRasterizationSettings
from stopthepop_tpu.models.gaussians import init_random
from stopthepop_tpu.train.loss import l1_loss, psnr, rgb_loss, ssim
from stopthepop_tpu.train.trainer import (
    CameraArrays,
    init_densify_stats,
    init_train_state,
    make_optimizer,
    make_train_step,
    render_model,
)
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


def test_ssim_identity_and_range():
    img = jax.random.uniform(jax.random.PRNGKey(0), (3, 32, 32))
    assert float(ssim(img, img)) > 0.999
    other = jax.random.uniform(jax.random.PRNGKey(1), (3, 32, 32))
    s = float(ssim(img, other))
    assert -1.0 <= s < 0.9
    assert float(rgb_loss(img, img)) < 1e-5
    assert float(psnr(img, img)) > 80


def test_training_decreases_loss():
    size = 32
    cam = make_camera(size, size)
    static = _static(cam, size)
    cam_arrays = CameraArrays(
        cam.viewmatrix, cam.projmatrix, cam.inv_viewprojmatrix, cam.campos
    )
    # Target: a render from a "ground truth" model; start from a perturbed one.
    gt = init_random(jax.random.PRNGKey(0), 60)
    target, _ = render_model(
        gt, cam_arrays, static=static, pair_capacity=4096, interpret=True
    )
    model = gt._replace(
        means3d=gt.means3d + 0.05 * jax.random.normal(jax.random.PRNGKey(2), gt.means3d.shape),
        opacity_logit=gt.opacity_logit - 0.5,
    )
    optimizer = make_optimizer(5e-3)
    step = jax.jit(make_train_step(
        optimizer, static=static, pair_capacity=4096, interpret=True
    ))
    state = init_train_state(model, optimizer)
    stats = init_densify_stats(60)

    losses = []
    for _ in range(25):
        state, stats, aux = step(state, cam_arrays, target, stats)
        losses.append(float(aux["loss"]))
        assert not bool(aux["overflow"])
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses
    # Densification stats accumulate for visible Gaussians.
    assert int(stats.denom.max()) == 25
    assert float(stats.grad2d_accum.max()) > 0.0
    assert int(stats.max_radii.max()) > 0


def test_checkpoint_roundtrip(tmp_path):
    import numpy as np

    from stopthepop_tpu.models.gaussians import init_random
    from stopthepop_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from stopthepop_tpu.train.trainer import init_train_state, make_optimizer

    model = init_random(jax.random.PRNGKey(0), 32)
    opt = make_optimizer(1e-3)
    state = init_train_state(model, opt)
    path = save_checkpoint(str(tmp_path), state, step=7)
    restored = load_checkpoint(path, state)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_batched_train_step_matches_mean_of_grads():
    from stopthepop_tpu.train.trainer import make_batched_train_step

    size = 32
    cam1 = make_camera(size, size, campos=(0.0, 0.0, -4.0))
    cam2 = make_camera(size, size, campos=(0.4, 0.1, -4.0))
    static = _static(cam1, size)
    model = init_random(jax.random.PRNGKey(0), 96)
    optimizer = make_optimizer(1e-3)
    state = init_train_state(model, optimizer)
    stats = init_densify_stats(96)
    cams = CameraArrays(
        jnp.stack([cam1.viewmatrix, cam2.viewmatrix]),
        jnp.stack([cam1.projmatrix, cam2.projmatrix]),
        jnp.stack([cam1.inv_viewprojmatrix, cam2.inv_viewprojmatrix]),
        jnp.stack([cam1.campos, cam2.campos]),
    )
    targets = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, size, size))
    step = jax.jit(make_batched_train_step(
        optimizer, static=static, pair_capacity=4096, interpret=True))
    new_state, new_stats, aux = step(state, cams, targets, stats)
    assert np.isfinite(float(aux["loss"]))
    assert not bool(aux["overflow"])
    # Params moved and stats accumulated over both cameras.
    assert float(jnp.abs(new_state.model.means3d - model.means3d).max()) > 0
    assert int(new_stats.denom.max()) <= 2
    assert int(new_stats.denom.max()) >= 1

    losses = []
    for _ in range(3):
        new_state, new_stats, aux = step(new_state, cams, targets, new_stats)
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_progressive_sh_schedule():
    """sh_ramp_every: bands above the active degree are masked from the
    render and receive zero gradient (the upstream oneupSHdegree schedule);
    once the ramp completes the step matches the unramped one."""
    import jax.numpy as jnp

    from stopthepop_tpu.train.trainer import TrainState, active_sh_mask

    size = 32
    cam = make_camera(size, size)
    static = _static(cam, size)
    cam_arrays = CameraArrays(
        cam.viewmatrix, cam.projmatrix, cam.inv_viewprojmatrix, cam.campos
    )
    model = init_random(jax.random.PRNGKey(0), 60)
    target = jax.random.uniform(jax.random.PRNGKey(1), (3, size, size))
    optimizer = make_optimizer(5e-3)
    ramped = jax.jit(make_train_step(
        optimizer, static=static, pair_capacity=4096, sh_ramp_every=1000,
        interpret=True,
    ))
    plain = jax.jit(make_train_step(
        optimizer, static=static, pair_capacity=4096, interpret=True
    ))
    stats = init_densify_stats(60)

    # Step 0: only the DC band is active -> rest coefficients get zero
    # gradient, so Adam leaves them bit-identical.
    state0 = init_train_state(model, optimizer)
    s1, _, aux = ramped(state0, cam_arrays, target, stats)
    np.testing.assert_array_equal(
        np.asarray(s1.model.sh_rest), np.asarray(model.sh_rest)
    )
    assert float(np.abs(np.asarray(s1.model.sh_dc - model.sh_dc)).max()) > 0

    # Band mask shape/content sanity.
    m = np.asarray(active_sh_mask(jnp.int32(2), 15))[:, 0]
    assert m.tolist() == [1.0] * 3 + [1.0] * 5 + [0.0] * 7

    # Past the ramp (step >= 3000 at degree 3) the masked step IS the
    # plain step.
    state3k = TrainState(model, optimizer.init(model), jnp.int32(3000))
    sr, _, _ = ramped(state3k, cam_arrays, target, stats)
    sp, _, _ = plain(state3k, cam_arrays, target, stats)
    for a, b in zip(jax.tree_util.tree_leaves(sr.model),
                    jax.tree_util.tree_leaves(sp.model)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
