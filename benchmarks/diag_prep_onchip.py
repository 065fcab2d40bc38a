"""Compare preprocess outputs TPU-vs-CPU on the verify_bcasc scene."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from stopthepop_tpu.render.preprocess import preprocess
from stopthepop_tpu.utils.testing import make_camera, random_scene


def main():
    w = h = 48
    cam = make_camera(w, h)
    scene = random_scene(jax.random.PRNGKey(8), 150)

    def _prep(scene, cam):
        return preprocess(
            scene.means3d, scene.opacities, scales=scene.scales,
            rotations=scene.rotations, shs=scene.shs,
            viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
            campos=cam.campos, tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
            image_width=cam.width, image_height=cam.height, sh_degree=3,
        )

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu), jax.disable_jit():
        prep_c = _prep(scene, cam)
    prep_t = _prep(scene, cam)          # TPU, traced/jitted as in verify
    prep_t2 = jax.jit(lambda: _prep(scene, cam))()

    # also: scene arrays themselves identical across backends?
    with jax.default_device(cpu):
        scene_c = random_scene(jax.random.PRNGKey(8), 150)
    for f in scene._fields:
        a = np.asarray(getattr(scene, f))
        b = np.asarray(getattr(scene_c, f))
        d = np.abs(a.astype(np.float64) - b.astype(np.float64)).max()
        if d > 0:
            print(f"scene.{f}: max|tpu-cpu|={d:.3e}")
    print("scene compared", flush=True)

    for f in prep_c._fields:
        a = getattr(prep_t, f)
        b = getattr(prep_c, f)
        if a is None or b is None:
            print(f"{f}: None ({a is None} vs {b is None})")
            continue
        a = np.asarray(a).astype(np.float64)
        b = np.asarray(b).astype(np.float64)
        d = np.abs(a - b)
        print(f"{f}: shape={a.shape} max|tpu-cpu|={d.max():.3e} "
              f"argmax={np.unravel_index(np.argmax(d), d.shape) if d.max() > 0 else '-'}")
    print("radii>0: tpu", int(np.sum(np.asarray(prep_t.radii) > 0)),
          "cpu", int(np.sum(np.asarray(prep_c.radii) > 0)))
    print("tiles_touched sum: tpu", int(np.sum(np.asarray(prep_t.tiles_touched))),
          "cpu", int(np.sum(np.asarray(prep_c.tiles_touched))))


if __name__ == "__main__":
    main()
