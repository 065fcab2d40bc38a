"""On-chip correctness gate for the batched mid/head cascade (run on TPU).

The batched cascade's oracle (render_hierarchical_naive(batched_cascade=True))
is proven equal to the sequential cascade oracle on CPU (exact), but the
Pallas kernel graph is too large for XLA-CPU interpret-mode compilation, so
kernel-vs-oracle runs here, on the real chip:

  1. forward: batched kernel vs per-entry kernel (same chip, same math)
     and vs the CPU-eager batched oracle (cross-backend, loose tol);
  2. backward: VJPs of batched vs per-entry kernels where the forwards
     agree bitwise (identical pop order => identical gradient events).

Exit code 0 = safe to benchmark the batched cascade.
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
    with jax.default_device(cpu), jax.disable_jit():
        prep_c = _prep(scene, cam)
        img_oracle, T_oracle, _ = render_hierarchical_naive(
            prep_c, bg, w, h, cam.campos, cam.inv_viewprojmatrix,
            queue_sizes=queues, batched_cascade=True,
        )
    print("cpu oracle done", flush=True)

    prep = _prep(scene, cam)
    cap = int(count_pairs(prep)) + 128

    def run(batched):
        img, T, nc, pairs, _ = render_tiled_hier(
            prep, bg, image_width=w, image_height=h, capacity=cap,
            campos=cam.campos, inverse_vp=cam.inv_viewprojmatrix,
            queue_sizes=queues, batched_cascade=batched,
        )
        assert not bool(pairs.overflow)
        return img, T

    img_b, T_b = run(True)
    print("batched kernel done", flush=True)
    img_p, T_p = run(False)

    d_bp = float(jnp.abs(img_b - img_p).max())
    d_bo = float(np.abs(np.asarray(img_b) - np.asarray(img_oracle)).max())
    print(f"fwd: batched-vs-perentry={d_bp:.3e} batched-vs-cpu-oracle={d_bo:.3e}")

    # Backward: compare VJPs through the two kernels (expected near-equal
    # when forwards agree; order-coincident pops => same gradient events).
    def loss(mean2d, batched):
        p2 = prep._replace(mean2d=mean2d)
        img, _, _, _, _ = render_tiled_hier(
            p2, bg, image_width=w, image_height=h, capacity=cap,
            campos=cam.campos, inverse_vp=cam.inv_viewprojmatrix,
            queue_sizes=queues, batched_cascade=batched,
        )
        return jnp.sum(img * jnp.cos(jnp.arange(img.size).reshape(img.shape)))

    g_b = jax.grad(lambda m: loss(m, True))(prep.mean2d)
    print("batched bwd done", flush=True)
    g_p = jax.grad(lambda m: loss(m, False))(prep.mean2d)
    scale = float(jnp.abs(g_p).max()) + 1e-12
    d_g = float(jnp.abs(g_b - g_p).max()) / scale
    print(f"bwd: rel max grad diff={d_g:.3e} (scale {scale:.3e})")

    ok = d_bp < 5e-5 and d_bo < 5e-4 and d_g < 5e-3
    print("VERIFY", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
