"""Multi-HOST (multi-process) sharded training: 2 real processes, Gloo
collectives, one global ("data", "gauss") mesh — the §5.8 layer the
reference never had, exercised for real (not just an 8-device
single-process emulation).

Each subprocess gets 4 virtual CPU devices (global mesh 2 hosts x 4 =
(2, 4)); both build identical inputs from fixed seeds, globalize them with
jax.device_put onto the multi-host mesh, and run one sharded train step.
The replicated loss and a parameter fingerprint must match the
single-process reference step computed in the parent."""

import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from stopthepop_tpu.train.loss import rgb_loss
from stopthepop_tpu.train.trainer import make_optimizer, render_model

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); coord = sys.argv[2]
sys.path.insert(0, sys.argv[3])  # repo root

from stopthepop_tpu.parallel import hosts
hosts.initialize(coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from stopthepop_tpu.models.gaussians import init_random
from stopthepop_tpu.parallel.train import make_sharded_train_step
from stopthepop_tpu.config import ExtendedSettings, GaussianRasterizationSettings
from stopthepop_tpu.train.trainer import CameraArrays, make_optimizer
from stopthepop_tpu.utils.testing import make_camera

mesh = hosts.global_mesh(("data", "gauss"))
assert dict(mesh.shape) == {"data": 2, "gauss": 4}, mesh.shape

size = 32
NP_ = 64 * 4
cam = make_camera(size, size)
static = GaussianRasterizationSettings(
    image_height=size, image_width=size, tanfovx=cam.tanfovx,
    tanfovy=cam.tanfovy, bg=jnp.zeros(3), scale_modifier=1.0,
    viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
    inv_viewprojmatrix=cam.inv_viewprojmatrix, sh_degree=3,
    campos=cam.campos, prefiltered=False, settings=ExtendedSettings(),
)
model = init_random(jax.random.PRNGKey(0), NP_)
optimizer = make_optimizer(1e-3)
step, n_batch = make_sharded_train_step(
    mesh, optimizer, static=static, pair_capacity=16 * NP_, interpret=True
)
assert n_batch == 8

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

# Globalize host-replicated values onto the multi-host mesh: every process
# holds the identical full array, device_put slices out its addressable
# shards (replicated spec; GSPMD reshards inside the jitted step).
rep = NamedSharding(mesh, P())
gauss_sh = NamedSharding(mesh, P("gauss"))
g = lambda tree, s: jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
model_sh = g(model, gauss_sh)
opt_sh = optimizer.init(model_sh)
new_model, new_opt, loss = step(model_sh, opt_sh, g(cams, rep), g(targets, rep))

fingerprint = jax.jit(
    lambda m: jnp.sum(jnp.abs(m.means3d)) + jnp.sum(jnp.abs(m.scales_log)),
    out_shardings=rep,
)(new_model)
print(f"RESULT {pid} loss={float(loss):.8e} fp={float(fingerprint):.8e}",
     flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_step_matches_single_process(tmp_path):
    # Reference step in THIS process (8 virtual devices, single process).
    from stopthepop_tpu.config import (
        ExtendedSettings, GaussianRasterizationSettings,
    )
    from stopthepop_tpu.models.gaussians import init_random
    from stopthepop_tpu.train.trainer import CameraArrays
    from stopthepop_tpu.utils.testing import make_camera

    size = 32
    NP_ = 64 * 4
    cam = make_camera(size, size)
    static = GaussianRasterizationSettings(
        image_height=size, image_width=size, tanfovx=cam.tanfovx,
        tanfovy=cam.tanfovy, bg=jnp.zeros(3), scale_modifier=1.0,
        viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
        inv_viewprojmatrix=cam.inv_viewprojmatrix, sh_degree=3,
        campos=cam.campos, prefiltered=False, settings=ExtendedSettings(),
    )
    model = init_random(jax.random.PRNGKey(0), NP_)
    cam_arrays = CameraArrays(
        cam.viewmatrix, cam.projmatrix, cam.inv_viewprojmatrix, cam.campos
    )
    target = jax.random.uniform(jax.random.PRNGKey(1), (3, size, size))

    def loss_fn(m):
        color, _ = render_model(
            m, cam_arrays, static=static, pair_capacity=16 * NP_,
            interpret=True,
        )
        return rgb_loss(color, target)

    optimizer = make_optimizer(1e-3)
    loss_ref, grads = jax.value_and_grad(loss_fn)(model)
    updates, _ = optimizer.update(grads, optimizer.init(model), model)
    new_ref = optax.apply_updates(model, updates)
    fp_ref = float(
        jnp.sum(jnp.abs(new_ref.means3d)) + jnp.sum(jnp.abs(new_ref.scales_log))
    )

    # Launch the 2-process run.
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), coord, repo_root],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo_root,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, l, f = line.split()
                results[int(pid)] = (
                    float(l.split("=")[1]), float(f.split("=")[1])
                )
    assert set(results) == {0, 1}, outs
    for pid in (0, 1):
        loss_mh, fp_mh = results[pid]
        np.testing.assert_allclose(loss_mh, float(loss_ref), rtol=1e-5)
        np.testing.assert_allclose(fp_mh, fp_ref, rtol=1e-5)


_SPATIAL_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); coord = sys.argv[2]
sys.path.insert(0, sys.argv[3])

from stopthepop_tpu.parallel import hosts
hosts.initialize(coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2 and jax.device_count() == 8

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from stopthepop_tpu.config import ExtendedSettings, GaussianRasterizationSettings
from stopthepop_tpu.models.gaussians import init_random
from stopthepop_tpu.parallel.spatial import make_spatial_render, shard_model
from stopthepop_tpu.train.trainer import CameraArrays
from stopthepop_tpu.utils.testing import make_camera

SIZE = 128
mesh = hosts.global_mesh(("tiles",))
cam = make_camera(SIZE, SIZE, campos=(0.0, 0.0, -4.0))
static = GaussianRasterizationSettings(
    image_height=SIZE, image_width=SIZE, tanfovx=cam.tanfovx,
    tanfovy=cam.tanfovy, bg=jnp.array([0.1, 0.2, 0.3]), scale_modifier=1.0,
    viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
    inv_viewprojmatrix=cam.inv_viewprojmatrix, sh_degree=3,
    campos=cam.campos, prefiltered=False, settings=ExtendedSettings(),
)
model = init_random(jax.random.PRNGKey(0), 256)
cams = CameraArrays(
    cam.viewmatrix, cam.projmatrix, cam.inv_viewprojmatrix, cam.campos
)
rep = NamedSharding(mesh, P())
g = lambda tree: jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)
render, cfg = make_spatial_render(
    mesh, static=static, band_capacity=4096, interpret=True
)
img = render(shard_model(model, mesh), g(cams))
fp = jax.jit(lambda x: jnp.sum(jnp.abs(x)), out_shardings=rep)(img)
print(f"RESULT {pid} fp={float(fp):.8e}", flush=True)
"""


@pytest.mark.slow
def test_two_process_spatial_render_matches_single_process(tmp_path):
    """Band-sharded rendering over a REAL 2-process ("tiles",) mesh: the
    all_gather of Gaussian features and the band composition cross the
    process boundary (Gloo), and the image must match single-process."""
    from stopthepop_tpu.config import (
        ExtendedSettings, GaussianRasterizationSettings,
    )
    from stopthepop_tpu.models.gaussians import init_random
    from stopthepop_tpu.train.trainer import CameraArrays
    from stopthepop_tpu.utils.testing import make_camera

    SIZE = 128
    cam = make_camera(SIZE, SIZE, campos=(0.0, 0.0, -4.0))
    static = GaussianRasterizationSettings(
        image_height=SIZE, image_width=SIZE, tanfovx=cam.tanfovx,
        tanfovy=cam.tanfovy, bg=jnp.array([0.1, 0.2, 0.3]),
        scale_modifier=1.0, viewmatrix=cam.viewmatrix,
        projmatrix=cam.projmatrix,
        inv_viewprojmatrix=cam.inv_viewprojmatrix, sh_degree=3,
        campos=cam.campos, prefiltered=False, settings=ExtendedSettings(),
    )
    model = init_random(jax.random.PRNGKey(0), 256)
    cams = CameraArrays(
        cam.viewmatrix, cam.projmatrix, cam.inv_viewprojmatrix, cam.campos
    )
    ref, *_ = render_model(model, cams, static=static, pair_capacity=8192,
                           interpret=True)
    fp_ref = float(jnp.sum(jnp.abs(ref)))

    worker = tmp_path / "worker_spatial.py"
    worker.write_text(_SPATIAL_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), coord, repo_root],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo_root,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=1500)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    fps = [
        float(line.split("=")[1])
        for out in outs for line in out.splitlines()
        if line.startswith("RESULT")
    ]
    assert len(fps) == 2, outs
    for fp in fps:
        np.testing.assert_allclose(fp, fp_ref, rtol=1e-5)


_RING_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); coord = sys.argv[2]
sys.path.insert(0, sys.argv[3])

from stopthepop_tpu.parallel import hosts
hosts.initialize(coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2 and jax.device_count() == 8

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from stopthepop_tpu.config import ExtendedSettings, GaussianRasterizationSettings
from stopthepop_tpu.models.gaussians import init_random
from stopthepop_tpu.parallel.ring import make_ring_render
from stopthepop_tpu.parallel.spatial import shard_model
from stopthepop_tpu.train.trainer import CameraArrays
from stopthepop_tpu.utils.testing import make_camera

SIZE = 128
mesh = hosts.global_mesh(("shards",))
cam = make_camera(SIZE, SIZE, campos=(0.0, 0.0, -4.0))
static = GaussianRasterizationSettings(
    image_height=SIZE, image_width=SIZE, tanfovx=cam.tanfovx,
    tanfovy=cam.tanfovy, bg=jnp.array([0.1, 0.2, 0.3]), scale_modifier=1.0,
    viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
    inv_viewprojmatrix=cam.inv_viewprojmatrix, sh_degree=3,
    campos=cam.campos, prefiltered=False, settings=ExtendedSettings(),
)
model = init_random(jax.random.PRNGKey(0), 256)
cams = CameraArrays(
    cam.viewmatrix, cam.projmatrix, cam.inv_viewprojmatrix, cam.campos
)
rep = NamedSharding(mesh, P())
g = lambda tree: jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)
render, cfg = make_ring_render(
    mesh, static=static, per_step_capacity=1024, interpret=True
)
img, overflow = render(shard_model(model, mesh, axis="shards"), g(cams))
assert not bool(overflow)
fp = jax.jit(lambda x: jnp.sum(jnp.abs(x)), out_shardings=rep)(img)
print(f"RESULT {pid} fp={float(fp):.8e}", flush=True)
"""


@pytest.mark.slow
def test_two_process_ring_render_matches_single_process(tmp_path):
    """Ring-streamed Gaussian sharding over a REAL 2-process mesh: the
    ppermute rotations cross the process boundary every ring step."""
    from stopthepop_tpu.config import (
        ExtendedSettings, GaussianRasterizationSettings,
    )
    from stopthepop_tpu.models.gaussians import init_random
    from stopthepop_tpu.train.trainer import CameraArrays
    from stopthepop_tpu.utils.testing import make_camera

    SIZE = 128
    cam = make_camera(SIZE, SIZE, campos=(0.0, 0.0, -4.0))
    static = GaussianRasterizationSettings(
        image_height=SIZE, image_width=SIZE, tanfovx=cam.tanfovx,
        tanfovy=cam.tanfovy, bg=jnp.array([0.1, 0.2, 0.3]),
        scale_modifier=1.0, viewmatrix=cam.viewmatrix,
        projmatrix=cam.projmatrix,
        inv_viewprojmatrix=cam.inv_viewprojmatrix, sh_degree=3,
        campos=cam.campos, prefiltered=False, settings=ExtendedSettings(),
    )
    model = init_random(jax.random.PRNGKey(0), 256)
    cams = CameraArrays(
        cam.viewmatrix, cam.projmatrix, cam.inv_viewprojmatrix, cam.campos
    )
    ref, *_ = render_model(model, cams, static=static, pair_capacity=8192,
                           interpret=True)
    fp_ref = float(jnp.sum(jnp.abs(ref)))

    worker = tmp_path / "worker_ring.py"
    worker.write_text(_RING_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), coord, repo_root],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo_root,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=1500)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    fps = [
        float(line.split("=")[1])
        for out in outs for line in out.splitlines()
        if line.startswith("RESULT")
    ]
    assert len(fps) == 2, outs
    for fp in fps:
        np.testing.assert_allclose(fp, fp_ref, rtol=1e-5)


_CKPT_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); coord = sys.argv[2]
sys.path.insert(0, sys.argv[3])
ckpt_dir = sys.argv[4]

from stopthepop_tpu.parallel import hosts
hosts.initialize(coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2 and jax.device_count() == 8

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from stopthepop_tpu.models.gaussians import init_random
from stopthepop_tpu.train.checkpoint import load_checkpoint, save_checkpoint

mesh = hosts.global_mesh(("gauss",))
model = init_random(jax.random.PRNGKey(0), 256)
sh = NamedSharding(mesh, P("gauss"))
model_sh = jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), model)
rep = NamedSharding(mesh, P())
fp_in = float(jax.jit(
    lambda m: jnp.sum(jnp.abs(m.means3d)), out_shardings=rep)(model_sh))

path = save_checkpoint(ckpt_dir, model_sh, step=7)
print(f"SAVED {pid} {path}", flush=True)

template = jax.tree_util.tree_map(
    lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh), model_sh
)
restored = load_checkpoint(path, template)
fp_out = float(jax.jit(
    lambda m: jnp.sum(jnp.abs(m.means3d)), out_shardings=rep)(restored))
assert abs(fp_in - fp_out) < 1e-6 * (abs(fp_in) + 1), (fp_in, fp_out)
print(f"RESULT {pid} fp={fp_out:.8e} orbax={'ckpt_7' in path and not path.endswith('.npz')}",
      flush=True)
"""


@pytest.mark.slow
def test_two_process_sharded_checkpoint_roundtrip(tmp_path):
    """Orbax checkpoint of a gauss-sharded TrainModel across a REAL
    2-process mesh: save coordinates through jax.distributed, restore onto
    the same sharding, fingerprints match (the §5.4 x §5.8 combination)."""
    worker = tmp_path / "worker_ckpt.py"
    worker.write_text(_CKPT_WORKER)
    ckpt_dir = str(tmp_path / "ckpts")
    coord = f"127.0.0.1:{_free_port()}"
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), coord, repo_root, ckpt_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo_root,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=1500)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    results = [line for out in outs for line in out.splitlines()
               if line.startswith("RESULT")]
    assert len(results) == 2, outs


def test_package_import_leaves_backend_uninitialized():
    """jax.distributed bring-up requires that importing the framework does
    NOT initialize the XLA backend (no module-level jnp.array/jax.devices
    anywhere in the import graph) — the exact regression that once broke
    2-process initialization."""
    prog = (
        "import os\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import sys; sys.path.insert(0, sys.argv[1])\n"
        "import stopthepop_tpu\n"
        "import stopthepop_tpu.parallel.hosts\n"
        "import stopthepop_tpu.parallel.train\n"
        "import stopthepop_tpu.parallel.spatial\n"
        "import stopthepop_tpu.parallel.ring\n"
        "import stopthepop_tpu.train.trainer\n"
        "import stopthepop_tpu.train.cli\n"
        "import jax._src.xla_bridge as xb\n"
        "assert not xb.backends_are_initialized(), "
        "'package import initialized the XLA backend'\n"
        "print('CLEAN')\n"
    )
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    out = subprocess.run(
        [sys.executable, "-c", prog, repo_root], env=env, cwd=repo_root,
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0 and "CLEAN" in out.stdout, (
        out.stdout + out.stderr
    )
