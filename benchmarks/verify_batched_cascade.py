"""On-chip correctness check for the EXPERIMENTAL batched mid/head cascade.

PARKED (round 4): the batched cascade is ~2x slower than the per-entry
cascade (results_r3/prof_hierb_fwd.log) and its backward kernel no longer
fits the 16 MiB scoped-VMEM stack (28.7M at compile, results_r4 notes), so
it is not a production path. The production gate is verify_hier_onchip.py.

Round-3 post-mortem: this script's original cross-kernel check (batched vs
per-entry at 5e-5) was INVALID — the two cadences pop entries in different
orders and blending is order-dependent, so ~5e-2 scene-level divergence
between them is legitimate. Each cadence must be compared against its OWN
differentiable CPU oracle (render_hierarchical_naive(batched_cascade=...)),
which is what this script now does, forward-only:

  1. batched kernel on chip vs batched-cadence CPU oracle;
  2. per-entry kernel on chip vs sequential-cadence CPU oracle;
both on the IDENTICAL preprocessed arrays (preprocess numerics excluded).

Exit code 0 = both forwards are faithful to their cadence oracles.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from stopthepop_tpu.render.duplicate import count_pairs
from stopthepop_tpu.render.naive import render_hierarchical_naive
from stopthepop_tpu.render.pipeline import render_tiled_hier
from stopthepop_tpu.render.preprocess import preprocess
from stopthepop_tpu.utils.testing import make_camera, random_scene


def _prep(scene, cam):
    return preprocess(
        scene.means3d, scene.opacities, scales=scene.scales,
        rotations=scene.rotations, shs=scene.shs,
        viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
        campos=cam.campos, tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        image_width=cam.width, image_height=cam.height, sh_degree=3,
    )


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    w = h = 48
    cam = make_camera(w, h)
    scene = random_scene(jax.random.PRNGKey(8), 150)
    queues = (16, 8, 4)
    bg = jnp.array([0.15, 0.05, 0.3])

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        prep_c = jax.jit(lambda: _prep(scene, cam))()
        oracle = {}
        for batched in (True, False):
            img, _, _ = jax.jit(
                lambda b=batched: render_hierarchical_naive(
                    prep_c, bg, w, h, cam.campos, cam.inv_viewprojmatrix,
                    queue_sizes=queues, batched_cascade=b,
                )
            )()
            oracle[batched] = np.asarray(img)
    print("cpu oracles done", flush=True)

    prep = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), prep_c)
    cap = int(count_pairs(prep_c)) + 128

    ds = {}
    for batched in (True, False):
        img, T, nc, pairs, _ = render_tiled_hier(
            prep, bg, image_width=w, image_height=h, capacity=cap,
            campos=cam.campos, inverse_vp=cam.inv_viewprojmatrix,
            queue_sizes=queues, batched_cascade=batched,
        )
        assert not bool(pairs.overflow)
        ds[batched] = float(
            np.abs(np.asarray(img) - oracle[batched]).max()
        )
        name = "batched" if batched else "per-entry"
        print(f"fwd {name}: chip-vs-own-oracle max abs={ds[batched]:.3e}",
              flush=True)

    print("bwd: PARKED (batched-cascade backward exceeds scoped VMEM; "
          "production gradients are gated by verify_hier_onchip.py)")
    ok = ds[True] < 5e-4 and ds[False] < 5e-4
    print("VERIFY", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
