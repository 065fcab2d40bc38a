"""Gradient parity: Pallas custom VJP vs jax.grad of the jnp oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stopthepop_tpu.render.duplicate import count_pairs
from stopthepop_tpu.render.naive import render_global_naive
from stopthepop_tpu.render.pipeline import render_tiled
from stopthepop_tpu.render.preprocess import preprocess
from stopthepop_tpu.utils.testing import make_camera, random_scene
from stopthepop_tpu.utils.testing import bucket_pair_capacity


def _make_losses(cam, scene, w, h, cap, use_sh=False):
    bg = jnp.array([0.3, 0.1, 0.2])
    weights = jax.random.normal(jax.random.PRNGKey(99), (3, h, w))

    def prep_of(means, scales, rots, opac, colors_or_shs):
        kw = dict(shs=colors_or_shs) if use_sh else dict(colors_precomp=colors_or_shs)
        return preprocess(
            means, opac, scales=scales, rotations=rots,
            viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
            campos=cam.campos, tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
            image_width=w, image_height=h, sh_degree=3 if use_sh else 0, **kw,
        )

    def loss_oracle(means, scales, rots, opac, col):
        img, final_t, _ = render_global_naive(prep_of(means, scales, rots, opac, col), bg, w, h)
        return jnp.sum(img * weights) + 0.1 * jnp.sum(final_t)

    def loss_tiled(means, scales, rots, opac, col):
        img, final_t, _, _, _ = render_tiled(
            prep_of(means, scales, rots, opac, col), bg,
            image_width=w, image_height=h, capacity=cap, interpret=True,
        )
        return jnp.sum(img * weights) + 0.1 * jnp.sum(final_t)

    return loss_oracle, loss_tiled


@pytest.mark.parametrize("use_sh", [False, True])
def test_grads_match_oracle(use_sh):
    w = h = 48
    cam = make_camera(w, h)
    scene = random_scene(jax.random.PRNGKey(5), 80)
    col = scene.shs if use_sh else scene.colors
    prep = preprocess(
        scene.means3d, scene.opacities, scales=scene.scales,
        rotations=scene.rotations, colors_precomp=scene.colors,
        viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix, campos=cam.campos,
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy, image_width=w, image_height=h,
    )
    cap = bucket_pair_capacity(prep)
    loss_oracle, loss_tiled = _make_losses(cam, scene, w, h, cap, use_sh)

    args = (scene.means3d, scene.scales, scene.rotations, scene.opacities, col)
    v_o, g_o = jax.value_and_grad(loss_oracle, argnums=(0, 1, 2, 3, 4))(*args)
    v_t, g_t = jax.value_and_grad(loss_tiled, argnums=(0, 1, 2, 3, 4))(*args)

    np.testing.assert_allclose(float(v_o), float(v_t), rtol=1e-5)
    names = ["means3d", "scales", "rotations", "opacities", "colors"]
    for name, a, b in zip(names, g_o, g_t):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all(), name
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(
            b, a, atol=2e-4 * scale, rtol=2e-3,
            err_msg=f"gradient mismatch for {name}",
        )


def test_bg_gradient():
    w = h = 32
    cam = make_camera(w, h)
    scene = random_scene(jax.random.PRNGKey(6), 50)
    prep = preprocess(
        scene.means3d, scene.opacities, scales=scene.scales,
        rotations=scene.rotations, colors_precomp=scene.colors,
        viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix, campos=cam.campos,
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy, image_width=w, image_height=h,
    )
    cap = bucket_pair_capacity(prep)

    def loss_t(bg):
        img, _, _, _, _ = render_tiled(
            prep, bg, image_width=w, image_height=h, capacity=cap, interpret=True
        )
        return jnp.sum(img**2)

    def loss_o(bg):
        img, _, _ = render_global_naive(prep, bg, w, h)
        return jnp.sum(img**2)

    bg = jnp.array([0.5, 0.2, 0.8])
    g_t = jax.grad(loss_t)(bg)
    g_o = jax.grad(loss_o)(bg)
    np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_o), rtol=1e-4)


@pytest.mark.slow
def test_kbuffer_grads_match_oracle():
    from stopthepop_tpu.render.naive import render_kbuffer_naive
    from stopthepop_tpu.render.pipeline import render_tiled_kbuffer

    w = h = 48
    k = 4
    cam = make_camera(w, h)
    scene = random_scene(jax.random.PRNGKey(15), 120)
    bg = jnp.array([0.3, 0.1, 0.2])
    weights = jax.random.normal(jax.random.PRNGKey(99), (3, h, w))

    def prep_of(means, scales, rots, opac, colors):
        return preprocess(
            means, opac, scales=scales, rotations=rots,
            colors_precomp=colors,
            viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
            campos=cam.campos, tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
            image_width=w, image_height=h,
        )

    prep0 = prep_of(scene.means3d, scene.scales, scene.rotations,
                    scene.opacities, scene.colors)
    cap = int(count_pairs(prep0)) + 64

    def loss_oracle(means, scales, rots, opac, col):
        img, final_t, _ = render_kbuffer_naive(
            prep_of(means, scales, rots, opac, col), bg, w, h,
            cam.campos, cam.inv_viewprojmatrix, k=k,
        )
        return jnp.sum(img * weights) + 0.1 * jnp.sum(final_t)

    def loss_tiled(means, scales, rots, opac, col):
        img, final_t, _, _, _ = render_tiled_kbuffer(
            prep_of(means, scales, rots, opac, col), bg,
            image_width=w, image_height=h, capacity=cap,
            campos=cam.campos, inverse_vp=cam.inv_viewprojmatrix, k=k,
            interpret=True,
        )
        return jnp.sum(img * weights) + 0.1 * jnp.sum(final_t)

    args = (scene.means3d, scene.scales, scene.rotations, scene.opacities,
            scene.colors)
    v_o, g_o = jax.value_and_grad(loss_oracle, argnums=(0, 1, 2, 3, 4))(*args)
    v_t, g_t = jax.value_and_grad(loss_tiled, argnums=(0, 1, 2, 3, 4))(*args)

    np.testing.assert_allclose(float(v_o), float(v_t), rtol=1e-5)
    names = ["means3d", "scales", "rotations", "opacities", "colors"]
    for name, a, b in zip(names, g_o, g_t):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all(), name
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(
            b, a, atol=3e-4 * scale, rtol=3e-3,
            err_msg=f"kbuffer gradient mismatch for {name}",
        )


def test_grads_match_finite_differences():
    # End-to-end directional-derivative check of the custom VJPs against
    # central finite differences (SURVEY.md §4 test plan).
    w = h = 32
    cam = make_camera(w, h)
    scene = random_scene(jax.random.PRNGKey(21), 40)
    bg = jnp.zeros(3)
    weights = jax.random.normal(jax.random.PRNGKey(22), (3, h, w))

    def loss(means):
        prep = preprocess(
            means, scene.opacities, scales=scene.scales,
            rotations=scene.rotations, colors_precomp=scene.colors,
            viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
            campos=cam.campos, tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
            image_width=w, image_height=h,
        )
        img, _, _, _, _ = render_tiled(
            prep, bg, image_width=w, image_height=h, capacity=4096,
            interpret=True,
        )
        return jnp.sum(img * weights)

    g = jax.grad(loss)(scene.means3d)
    v = jax.random.normal(jax.random.PRNGKey(23), scene.means3d.shape)
    v = v / jnp.linalg.norm(v)
    eps = 3e-4
    fd = (loss(scene.means3d + eps * v) - loss(scene.means3d - eps * v)) / (
        2 * eps
    )
    analytic = jnp.vdot(g, v)
    # f32 + the (intentionally) non-differentiable alpha/transmittance
    # cutoffs put a floor on FD agreement; 4% catches any real VJP bug.
    np.testing.assert_allclose(float(analytic), float(fd), rtol=4e-2)


def test_carry_bf16_grads_close_to_f32():
    """Opt-in mixed-precision carry (bf16-packed cotangent unsort): the
    per-pair cotangents are rounded to bf16, so gradients must track the
    f32 path within bf16 relative noise."""
    w = h = 48
    cam = make_camera(w, h)
    scene = random_scene(jax.random.PRNGKey(7), 120)
    prep0 = preprocess(
        scene.means3d, scene.opacities, scales=scene.scales,
        rotations=scene.rotations, colors_precomp=scene.colors,
        viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix, campos=cam.campos,
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy, image_width=w, image_height=h,
    )
    cap = int(count_pairs(prep0)) + 64
    bg = jnp.array([0.3, 0.1, 0.2])
    weights = jax.random.normal(jax.random.PRNGKey(99), (3, h, w))

    def loss(means, scales, rots, opac, col, carry_bf16):
        prep = preprocess(
            means, opac, scales=scales, rotations=rots, colors_precomp=col,
            viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
            campos=cam.campos, tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
            image_width=w, image_height=h,
        )
        img, final_t, _, _, _ = render_tiled(
            prep, bg, image_width=w, image_height=h, capacity=cap,
            carry_bf16=carry_bf16, interpret=True,
        )
        return jnp.sum(img * weights) + 0.1 * jnp.sum(final_t)

    args = (scene.means3d, scene.scales, scene.rotations, scene.opacities,
            scene.colors)
    g32 = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args, False)
    g16 = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args, True)
    for name, a, b in zip(["means3d", "scales", "rots", "opac", "col"],
                          g32, g16):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all(), name
        scale = np.abs(a).max() + 1e-8
        # bf16 has ~3 decimal digits; the reduction is f32.
        np.testing.assert_allclose(
            b, a, atol=2e-2 * scale, rtol=2e-2,
            err_msg=f"bf16-carry gradient drift for {name}",
        )
