"""Adaptive density control: clone/split/prune with static capacity."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from stopthepop_tpu.models.gaussians import init_random
from stopthepop_tpu.train.density import (
    DensifyConfig,
    densify_and_prune,
    grow_capacity,
    reset_opacity,
    reset_opt_slots,
)
from stopthepop_tpu.train.trainer import DensifyStats


def _stats(P, grads, denom=1, radii=0):
    return DensifyStats(
        grad2d_accum=jnp.asarray(grads, jnp.float32),
        denom=jnp.full((P,), denom, jnp.int32),
        max_radii=jnp.full((P,), radii, jnp.int32),
    )


def test_clone_small_high_grad():
    model = init_random(jax.random.PRNGKey(0), 4)
    model = model._replace(scales_log=jnp.full((4, 3), jnp.log(1e-4)))
    model, active = grow_capacity(model, 16)
    grads = jnp.zeros(16).at[1].set(1.0)  # only #1 has high gradient
    m2, a2, _, info = jax.jit(
        lambda m, a, s: densify_and_prune(
            m, a, s, jax.random.PRNGKey(1), scene_extent=10.0,
            cfg=DensifyConfig(opacity_cull=0.0),
        )
    )(model, active, _stats(16, grads))
    assert int(info["num_cloned"]) == 1
    assert int(info["num_split"]) == 0
    assert int(info["num_active"]) == 5
    # The clone landed in the first free slot with identical parameters.
    np.testing.assert_allclose(
        np.asarray(m2.means3d[4]), np.asarray(model.means3d[1])
    )
    assert bool(a2[4])


def test_split_large_high_grad():
    model = init_random(jax.random.PRNGKey(0), 4)
    model = model._replace(scales_log=jnp.full((4, 3), jnp.log(0.5)))
    model, active = grow_capacity(model, 16)
    grads = jnp.zeros(16).at[2].set(1.0)
    m2, a2, _, info = densify_and_prune(
        model, active, _stats(16, grads), jax.random.PRNGKey(1),
        scene_extent=1.0, cfg=DensifyConfig(opacity_cull=0.0),
    )
    assert int(info["num_split"]) == 1
    # Original deactivated, two children active -> net +1.
    assert int(info["num_active"]) == 5
    assert not bool(a2[2])
    # Children have shrunken scales.
    np.testing.assert_allclose(
        np.asarray(m2.scales_log[4]),
        np.asarray(model.scales_log[2]) - np.log(1.6),
        rtol=1e-6,
    )


def test_prune_low_opacity():
    model = init_random(jax.random.PRNGKey(0), 4)
    model = model._replace(
        opacity_logit=model.opacity_logit.at[3].set(-10.0)
    )
    model, active = grow_capacity(model, 8)
    m2, a2, _, info = densify_and_prune(
        model, active, _stats(8, jnp.zeros(8)), jax.random.PRNGKey(1),
        scene_extent=1.0,
    )
    assert int(info["num_pruned"]) == 1
    assert not bool(a2[3])
    # Deactivated slot renders as nothing (opacity ~ 0, scale ~ 0).
    assert float(jax.nn.sigmoid(m2.opacity_logit[3])) < 1e-6


def test_budget_overflow_reported():
    model = init_random(jax.random.PRNGKey(0), 4)
    model = model._replace(scales_log=jnp.full((4, 3), jnp.log(1e-4)))
    model, active = grow_capacity(model, 5)  # one free slot only
    grads = jnp.ones(5)
    m2, a2, _, info = densify_and_prune(
        model, active, _stats(5, grads), jax.random.PRNGKey(1),
        scene_extent=10.0, cfg=DensifyConfig(opacity_cull=0.0),
    )
    assert int(info["num_cloned"]) == 1
    assert int(info["dropped"]) == 3


def test_reset_opacity_and_opt_slots():
    import optax

    model = init_random(jax.random.PRNGKey(0), 4)
    model, active = grow_capacity(model, 8)
    m2 = reset_opacity(model, active, max_opacity=0.01)
    assert float(jax.nn.sigmoid(m2.opacity_logit[:4]).max()) <= 0.0100001

    opt = optax.adam(1e-3)
    st = opt.init(model)
    g = jax.tree.map(jnp.ones_like, model)
    _, st = opt.update(g, st, model)
    changed = jnp.zeros(8, bool).at[0].set(True)
    st2 = reset_opt_slots(st, changed)
    mu = st2[0].mu.means3d
    assert float(jnp.abs(mu[0]).max()) == 0.0
    assert float(jnp.abs(mu[1]).max()) > 0.0


@pytest.mark.slow
def test_adaptive_training_grows_and_improves():
    """Full 3DGS loop: train + densify rounds improve PSNR and add points."""
    import optax

    from stopthepop_tpu.config import (
        ExtendedSettings,
        GaussianRasterizationSettings,
    )
    from stopthepop_tpu.train.density import reset_opt_slots
    from stopthepop_tpu.train.loss import psnr
    from stopthepop_tpu.train.trainer import (
        CameraArrays,
        init_densify_stats,
        init_train_state,
        make_optimizer,
        make_train_step,
        render_model,
    )
    from stopthepop_tpu.utils.testing import make_camera

    size = 32
    cam = make_camera(size, size)
    static = GaussianRasterizationSettings(
        image_height=size, image_width=size,
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        bg=jnp.zeros(3), scale_modifier=1.0,
        viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
        inv_viewprojmatrix=cam.inv_viewprojmatrix,
        sh_degree=0, campos=cam.campos, prefiltered=False,
        settings=ExtendedSettings(),
    )
    cams = CameraArrays(
        cam.viewmatrix, cam.projmatrix, cam.inv_viewprojmatrix, cam.campos
    )
    gt = init_random(jax.random.PRNGKey(0), 50, sh_degree=0)
    target, _ = render_model(
        gt, cams, static=static, pair_capacity=4096, interpret=True
    )

    # Start from too few Gaussians at capacity 64.
    model = init_random(jax.random.PRNGKey(3), 20, sh_degree=0)
    model, active = grow_capacity(model, 64)
    optimizer = make_optimizer(1e-2)
    step = jax.jit(make_train_step(
        optimizer, static=static, pair_capacity=8192, interpret=True
    ))
    state = init_train_state(model, optimizer)
    stats = init_densify_stats(64)

    p0 = float(psnr(render_model(
        state.model, cams, static=static, pair_capacity=8192, interpret=True
    )[0], target))
    n0 = int(active.sum())
    cfg = DensifyConfig(grad_threshold=1e-5, opacity_cull=0.001)
    for r in range(3):
        for _ in range(10):
            state, stats, aux = step(state, cams, target, stats)
        model2, active, stats, info = densify_and_prune(
            state.model, active, stats, jax.random.PRNGKey(10 + r),
            scene_extent=3.0, cfg=cfg,
        )
        changed = model2.opacity_logit != state.model.opacity_logit
        opt2 = reset_opt_slots(state.opt_state, changed)
        state = state._replace(model=model2, opt_state=opt2)
    for _ in range(10):
        state, stats, aux = step(state, cams, target, stats)

    p1 = float(psnr(render_model(
        state.model, cams, static=static, pair_capacity=8192, interpret=True
    )[0], target))
    n1 = int(active.sum())
    assert n1 > n0, (n0, n1)          # densification actually grew the model
    assert p1 > p0 + 1.0, (p0, p1)    # and training improved quality
