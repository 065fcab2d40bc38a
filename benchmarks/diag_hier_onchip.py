"""Diagnose the round-3 verify_bcasc on-chip HIER divergence (VERDICT r3 #1).

Bisects the stack by shipping IDENTICAL CPU-preprocessed arrays to the chip:
  A. GLOBAL tiled on chip vs GLOBAL naive oracle (CPU)   -> pair-building sanity
  B. HIER per-entry tiled on chip vs HIER naive oracle   -> hier kernel on chip
  C. HIER per-entry tiled CPU-interpret, same arrays     -> lowering vs numerics
  D. grad wrt mean2d of on-chip hier (nonzero scale?)
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from stopthepop_tpu.render.duplicate import count_pairs
from stopthepop_tpu.render.naive import (
    render_global_naive,
    render_hierarchical_naive,
)
from stopthepop_tpu.render.pipeline import render_tiled, render_tiled_hier
from stopthepop_tpu.render.preprocess import preprocess
from stopthepop_tpu.utils.testing import make_camera, random_scene


def main():
    print("backend:", jax.default_backend(), flush=True)
    w = h = 48
    cam = make_camera(w, h)
    scene = random_scene(jax.random.PRNGKey(8), 150)
    queues = (16, 8, 4)
    bg = jnp.array([0.15, 0.05, 0.3])

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu), jax.disable_jit():
        prep_c = preprocess(
            scene.means3d, scene.opacities, scales=scene.scales,
            rotations=scene.rotations, shs=scene.shs,
            viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
            campos=cam.campos, tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
            image_width=cam.width, image_height=cam.height, sh_degree=3,
        )
        img_hier_o, T_hier_o, _ = render_hierarchical_naive(
            prep_c, bg, w, h, cam.campos, cam.inv_viewprojmatrix,
            queue_sizes=queues,
        )
        img_glob_o, T_glob_o, _ = render_global_naive(prep_c, bg, w, h)
    print("cpu oracles done", flush=True)

    # Ship the IDENTICAL preprocessed arrays to the default backend.
    prep = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), prep_c)
    cap = int(count_pairs(prep_c)) + 128
    print("cap:", cap, "radii>0:", int(np.sum(np.asarray(prep_c.radii) > 0)),
          flush=True)

    # A. GLOBAL on chip, same arrays.
    img_g, T_g, nc_g, pairs_g, _ = render_tiled(
        prep, bg, image_width=w, image_height=h, capacity=cap,
    )
    print(f"A global: max|chip-oracle|={float(jnp.abs(img_g - img_glob_o).max()):.3e}"
          f" overflow={bool(pairs_g.overflow)}", flush=True)

    # B. HIER per-entry on chip, same arrays.
    img_hp, T_hp, nc_hp, pairs_hp, _ = render_tiled_hier(
        prep, bg, image_width=w, image_height=h, capacity=cap,
        campos=cam.campos, inverse_vp=cam.inv_viewprojmatrix,
        queue_sizes=queues, batched_cascade=False,
    )
    d_B = float(jnp.abs(img_hp - img_hier_o).max())
    print(f"B hier-perentry chip: max|chip-oracle|={d_B:.3e}"
          f" overflow={bool(pairs_hp.overflow)}"
          f" n_contrib sum={int(jnp.sum(nc_hp))}", flush=True)

    # C. HIER per-entry CPU interpret, same arrays.
    with jax.default_device(cpu):
        prep_cc = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), prep_c)
        img_hi, T_hi, nc_hi, _, _ = render_tiled_hier(
            prep_cc, bg, image_width=w, image_height=h, capacity=cap,
            campos=np.asarray(cam.campos),
            inverse_vp=np.asarray(cam.inv_viewprojmatrix),
            queue_sizes=queues, batched_cascade=False, interpret=True,
        )
    d_C = float(np.abs(np.asarray(img_hi) - np.asarray(img_hier_o)).max())
    d_BC = float(np.abs(np.asarray(img_hp) - np.asarray(img_hi)).max())
    print(f"C hier-perentry interpret: max|interp-oracle|={d_C:.3e}"
          f" max|chip-interp|={d_BC:.3e}"
          f" n_contrib sum={int(np.sum(np.asarray(nc_hi)))}", flush=True)

    # Locate where the chip image differs from interpret (tile coordinates).
    diff = np.abs(np.asarray(img_hp) - np.asarray(img_hi)).max(axis=0)  # [H,W]
    ys, xs = np.nonzero(diff > 1e-4)
    if len(ys):
        print(f"  differing pixels: {len(ys)}; tiles: "
              f"{sorted(set(zip((ys // 16).tolist(), (xs // 16).tolist())))}",
              flush=True)
        i = int(np.argmax(diff))
        yy, xx = np.unravel_index(i, diff.shape)
        print(f"  worst pixel ({yy},{xx}): chip={np.asarray(img_hp)[:, yy, xx]}"
              f" interp={np.asarray(img_hi)[:, yy, xx]}"
              f" T chip={float(np.asarray(T_hp)[yy, xx]):.4f}"
              f" interp={float(np.asarray(T_hi)[yy, xx]):.4f}", flush=True)

    # D. grad wrt mean2d, on chip per-entry.
    def loss(mean2d):
        p2 = prep._replace(mean2d=mean2d)
        img, _, _, _, _ = render_tiled_hier(
            p2, bg, image_width=w, image_height=h, capacity=cap,
            campos=cam.campos, inverse_vp=cam.inv_viewprojmatrix,
            queue_sizes=queues, batched_cascade=False,
        )
        return jnp.sum(img * jnp.cos(jnp.arange(img.size).reshape(img.shape)))

    g = jax.grad(loss)(prep.mean2d)
    print(f"D chip grad mean2d: max|g|={float(jnp.abs(g).max()):.3e}", flush=True)

    # D2: same grad in CPU interpret.
    with jax.default_device(cpu):
        def loss_i(mean2d):
            p2 = prep_cc._replace(mean2d=mean2d)
            img, _, _, _, _ = render_tiled_hier(
                p2, bg, image_width=w, image_height=h, capacity=cap,
                campos=np.asarray(cam.campos),
                inverse_vp=np.asarray(cam.inv_viewprojmatrix),
                queue_sizes=queues, batched_cascade=False, interpret=True,
            )
            return jnp.sum(img * jnp.cos(jnp.arange(img.size).reshape(img.shape)))

        gi = jax.grad(loss_i)(prep_cc.mean2d)
    print(f"D2 interp grad mean2d: max|g|={float(np.abs(np.asarray(gi)).max()):.3e}",
          flush=True)


if __name__ == "__main__":
    main()
