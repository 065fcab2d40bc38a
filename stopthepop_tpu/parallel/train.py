"""Multi-chip sharded training step (shard_map over a 2D device mesh).

The reference is single-GPU (SURVEY.md §2.9) — this layer is new design:

  mesh axes:
    "data"  — camera/batch data parallelism;
    "gauss" — Gaussian-parameter sharding (the FSDP/tensor-parallel analog:
              parameters and optimizer state live sharded, are all-gathered
              for compute, and gradients return via psum_scatter — the
              deterministic collective replacement for the reference's
              atomicAdd gradient accumulation, backward.cu:561-592).

  Every device renders its own camera (the effective batch is
  n_data * n_gauss), so both axes do useful rendering work while "gauss"
  additionally shards memory. Collectives ride ICI: all_gather for the
  parameter blocks, psum_scatter + pmean for gradients.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import GaussianRasterizationSettings
from ..models.gaussians import GaussianModel
from ..train.loss import rgb_loss
from ..train.trainer import CameraArrays, render_model


def make_mesh(n_devices: Optional[int] = None, data: Optional[int] = None):
    """Build a ("data", "gauss") mesh over the available devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if data is None:
        # Squarest factorization, biased toward the gauss axis.
        data = 1
        for d in range(int(n**0.5), 0, -1):
            if n % d == 0:
                data = d
                break
    gauss = n // data
    import numpy as np

    return Mesh(np.array(devices[:n]).reshape(data, gauss), ("data", "gauss"))


def make_sharded_train_step(
    mesh: Mesh,
    optimizer,
    *,
    static: GaussianRasterizationSettings,
    lambda_dssim: float = 0.2,
    pair_capacity: Optional[int] = None,
    interpret: bool = False,
):
    """Returns a jittable sharded step.

    Args (all sharded on their leading axis):
      model_shard:  GaussianModel leaves [P/n_gauss, ...] over "gauss"
      opt_shard:    matching optax state over "gauss"
      cams:         CameraArrays leaves [B, ...] over ("data", "gauss")
      targets:      [B, 3, H, W] over ("data", "gauss")
    Returns (new model shards, new opt shards, mean loss).
    """
    n_batch = mesh.shape["data"] * mesh.shape["gauss"]

    gauss_spec = P("gauss")
    batch_spec = P(("data", "gauss"))

    def step(model_shard, opt_shard, cams, targets):
        # ZeRO-3 style: gather full parameters for compute.
        model = jax.tree.map(
            lambda x: jax.lax.all_gather(x, "gauss", axis=0, tiled=True),
            model_shard,
        )
        cam = jax.tree.map(lambda x: x[0], cams)  # one camera per device
        target = targets[0]

        def loss_fn(model_full):
            color, _ = render_model(
                model_full, cam, static=static,
                pair_capacity=pair_capacity, interpret=interpret,
            )
            return rgb_loss(color, target, lambda_dssim)

        loss, grads = jax.value_and_grad(loss_fn)(model)
        # Mean over the whole device batch: psum_scatter over "gauss" both
        # reduces across gauss-group cameras and re-shards the parameters;
        # pmean over "data" averages the data-parallel replicas.
        grads = jax.tree.map(
            lambda g: jax.lax.psum_scatter(g, "gauss", scatter_dimension=0, tiled=True)
            / mesh.shape["gauss"],
            grads,
        )
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(jax.lax.pmean(loss, "gauss"), "data")

        updates, new_opt = optimizer.update(grads, opt_shard, model_shard)
        new_model = optax.apply_updates(model_shard, updates)
        return new_model, new_opt, loss

    def leaf_specs(tree, spec):
        # Rank-0 leaves (e.g. the Adam step counter) stay replicated.
        return jax.tree.map(lambda x: spec if jnp.ndim(x) > 0 else P(), tree)

    _cache = {}

    def sharded(model_shard, opt_shard, cams, targets):
        key = jax.tree.structure((model_shard, opt_shard, cams, targets))
        if key not in _cache:
            in_specs = (
                leaf_specs(model_shard, gauss_spec),
                leaf_specs(opt_shard, gauss_spec),
                leaf_specs(cams, batch_spec),
                batch_spec,
            )
            out_specs = (
                leaf_specs(model_shard, gauss_spec),
                leaf_specs(opt_shard, gauss_spec),
                P(),
            )
            _cache[key] = jax.jit(
                shard_map(
                    step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                    check_vma=False,  # pallas_call out_shapes carry no vma
                )
            )
        return _cache[key](model_shard, opt_shard, cams, targets)

    return sharded, n_batch


def shard_model(mesh: Mesh, model: GaussianModel):
    """Place a replicated model as gauss-sharded arrays."""
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, P("gauss"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), model)
