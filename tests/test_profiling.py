"""Stage timer + timed render path."""

import jax
import jax.numpy as jnp
import numpy as np

from stopthepop_tpu.render.duplicate import count_pairs
from stopthepop_tpu.render.pipeline import render_tiled, render_tiled_timed
from stopthepop_tpu.render.preprocess import preprocess
from stopthepop_tpu.utils.profiling import StageTimer
from stopthepop_tpu.utils.testing import make_camera, random_scene


def test_timed_render_matches_untimed():
    w = h = 48
    cam = make_camera(w, h)
    scene = random_scene(jax.random.PRNGKey(2), 100)

    def prep_fn():
        return preprocess(
            scene.means3d, scene.opacities, scales=scene.scales,
            rotations=scene.rotations, shs=scene.shs,
            viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
            campos=cam.campos, tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
            image_width=w, image_height=h, sh_degree=3,
        )

    bg = jnp.zeros(3)
    cap = int(count_pairs(prep_fn())) + 64
    timer = StageTimer(interval=1)
    img_t, *_ = render_tiled_timed(
        prep_fn, timer, bg, image_width=w, image_height=h, capacity=cap,
        interpret=True,
    )
    img_u, *_ = render_tiled(
        prep_fn(), bg, image_width=w, image_height=h, capacity=cap,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_u), atol=1e-6)
    # One frame elapsed at interval=1 -> report text is populated with the
    # reference's stage names.
    for stage in ("Preprocess", "Duplicate", "Sort", "Render"):
        assert stage in timer.timings_text


def test_stage_timer_interval():
    timer = StageTimer(interval=2)
    for _ in range(2):
        timer.time("Render", lambda: jnp.ones(4))
        timer.frame()
    assert "Render" in timer.timings_text
    assert timer.report() == ""  # accumulator reset after the interval
