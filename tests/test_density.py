"""Adaptive density control: clone/split/prune with static capacity."""

import jax
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
