"""Adaptive density control (densify / clone / split / prune), TPU-native.

The reference repo exposes the densification *signals* (radii and the
NDC-scaled dL/dmean2D on the means2D dummy, diff_gaussian_rasterization/
__init__.py:32-53 + backward.cu ddelx_dx=0.5*W); the controller itself lives
in the upstream 3DGS trainer. This module supplies that controller,
re-designed for XLA's static shapes:

  * the model is allocated at a fixed *capacity* P_cap with an ``active``
    mask; inactive slots carry opacity logit -30 and log-scale -30, so the
    renderer culls them in preprocess (alpha < 1/255, radius 0) at zero
    pair-expansion cost;
  * clone/split/prune are pure scatter/mask ops — fully jittable, no host
    sync, no reallocation. New entries claim free slots by cumsum ranking;
    requests beyond the free-slot budget are dropped (reported back).

Semantics follow the standard 3DGS controller: Gaussians whose averaged
screen-space positional gradient exceeds ``grad_threshold`` are densified —
cloned if small (max scale <= percent_dense * scene_extent), split into
``n_split`` samples with scales / 1.6 if large; Gaussians with opacity below
``opacity_cull`` (or excessive screen/world size) are pruned.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.gaussians import GaussianModel
from ..ops.covariance import quat_to_rotmat
from .trainer import DensifyStats

INACTIVE_LOGIT = -30.0
INACTIVE_LOG_SCALE = -30.0


class DensifyConfig(NamedTuple):
    grad_threshold: float = 2e-4
    percent_dense: float = 0.01
    opacity_cull: float = 0.005
    split_scale_factor: float = 1.6
    n_split: int = 2
    max_screen_size: Optional[float] = None   # prune if max radius exceeds
    max_world_size_frac: float = 0.1          # of scene_extent, with ^^


def grow_capacity(model: GaussianModel, capacity: int):
    """Pad a dense model to ``capacity`` slots; returns (model, active)."""
    p = model.num_gaussians
    assert capacity >= p
    pad = capacity - p

    def pad_leaf(x, fill=0.0):
        cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    model = GaussianModel(
        means3d=pad_leaf(model.means3d),
        scales_log=pad_leaf(model.scales_log, INACTIVE_LOG_SCALE),
        rotations=pad_leaf(model.rotations).at[p:, 0].set(1.0),
        opacity_logit=pad_leaf(model.opacity_logit, INACTIVE_LOGIT),
        sh_dc=pad_leaf(model.sh_dc),
        sh_rest=pad_leaf(model.sh_rest),
    )
    active = jnp.arange(capacity) < p
    return model, active


def _deactivate(model: GaussianModel, kill: jnp.ndarray) -> GaussianModel:
    return model._replace(
        opacity_logit=jnp.where(kill, INACTIVE_LOGIT, model.opacity_logit),
        scales_log=jnp.where(
            kill[:, None], INACTIVE_LOG_SCALE, model.scales_log
        ),
    )


def _scatter_from(model: GaussianModel, dst: jnp.ndarray, src: jnp.ndarray,
                  ok: jnp.ndarray, overrides: dict) -> GaussianModel:
    """Copy rows ``src`` -> slots ``dst`` (both [K]) where ``ok``.

    ``overrides`` maps field name -> [K, ...] replacement values.
    """
    dst = jnp.where(ok, dst, model.num_gaussians)  # drop -> out-of-bounds

    def scat(field, x):
        vals = overrides.get(field, x[src])
        return x.at[dst].set(vals, mode="drop")

    return GaussianModel(
        **{f: scat(f, getattr(model, f)) for f in model._fields}
    )


def densify_and_prune(
    model: GaussianModel,
    active: jnp.ndarray,
    stats: DensifyStats,
    key: jax.Array,
    scene_extent: float,
    cfg: DensifyConfig = DensifyConfig(),
):
    """One densification round. Returns (model, active, stats, info).

    Fully jittable; stats are reset. ``info['dropped']`` counts densification
    requests that did not fit in the free-slot budget.
    """
    P = model.num_gaussians
    avg_grad = stats.grad2d_accum / jnp.maximum(stats.denom, 1)
    max_scale = jnp.exp(jnp.max(model.scales_log, axis=-1))
    opacity = jax.nn.sigmoid(model.opacity_logit)

    # -- prune --
    prune = active & (opacity < cfg.opacity_cull)
    if cfg.max_screen_size is not None:
        prune = prune | (
            active
            & (
                (stats.max_radii > cfg.max_screen_size)
                | (max_scale > cfg.max_world_size_frac * scene_extent)
            )
        )
    active = active & ~prune
    model = _deactivate(model, prune)

    # -- select densification candidates --
    sel = active & (avg_grad >= cfg.grad_threshold)
    small = max_scale <= cfg.percent_dense * scene_extent
    clone = sel & small
    split = sel & ~small

    # -- allocate free slots: clones need 1, splits need n_split --
    free = ~active
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1     # rank among free
    n_free = jnp.sum(free.astype(jnp.int32))
    free_slots = jnp.where(free, free_rank, P)
    # slot_of_rank[r] = index of the r-th free slot
    slot_of_rank = jnp.full((P,), P, jnp.int32).at[free_slots].set(
        jnp.arange(P, dtype=jnp.int32), mode="drop"
    )

    n_clone_req = jnp.cumsum(clone.astype(jnp.int32))        # inclusive
    total_clone = n_clone_req[-1]
    clone_rank = n_clone_req - 1                              # per-source rank

    split_base = jnp.cumsum(split.astype(jnp.int32)) - 1     # per-source rank

    def take_slot(rank):
        ok = rank < n_free
        return jnp.where(ok, slot_of_rank[jnp.clip(rank, 0, P - 1)], P), ok

    src = jnp.arange(P, dtype=jnp.int32)

    # clones: copy as-is
    c_slot, c_fit = take_slot(clone_rank)
    ok_c = clone & c_fit
    model = _scatter_from(model, c_slot, src, ok_c, {})
    active = active.at[jnp.where(ok_c, c_slot, P)].set(True, mode="drop")

    # splits: n_split new samples, scales shrunk; original deactivated
    scales = jnp.exp(model.scales_log)
    R = quat_to_rotmat(
        model.rotations
        / jnp.linalg.norm(model.rotations, axis=-1, keepdims=True)
    )
    new_scales_log = model.scales_log - jnp.log(cfg.split_scale_factor)
    keys = jax.random.split(key, cfg.n_split)
    any_split_placed = jnp.zeros((P,), bool)
    for i in range(cfg.n_split):
        noise = jax.random.normal(keys[i], (P, 3)) * scales
        offset = jnp.einsum("pij,pj->pi", R, noise)
        rank = total_clone + split_base * cfg.n_split + i
        s_slot, s_fit = take_slot(rank)
        ok_s = split & s_fit
        model = _scatter_from(
            model, s_slot, src, ok_s,
            {
                "means3d": model.means3d + offset,
                "scales_log": new_scales_log,
            },
        )
        active = active.at[jnp.where(ok_s, s_slot, P)].set(True, mode="drop")
        any_split_placed = any_split_placed | ok_s

    # deactivate split originals (only those actually split)
    active = active & ~any_split_placed
    model = _deactivate(model, any_split_placed)

    dropped = (
        jnp.sum(clone & ~c_fit)
        + jnp.sum(split.astype(jnp.int32)) * cfg.n_split
        - jnp.sum(any_split_placed.astype(jnp.int32)) * cfg.n_split
    )
    stats = DensifyStats(
        grad2d_accum=jnp.zeros_like(stats.grad2d_accum),
        denom=jnp.zeros_like(stats.denom),
        max_radii=jnp.zeros_like(stats.max_radii),
    )
    info = {
        "num_active": jnp.sum(active.astype(jnp.int32)),
        "num_cloned": jnp.sum(ok_c.astype(jnp.int32)),
        "num_split": jnp.sum(any_split_placed.astype(jnp.int32)),
        "num_pruned": jnp.sum(prune.astype(jnp.int32)),
        "dropped": dropped,
    }
    return model, active, stats, info


def reset_opacity(model: GaussianModel, active: jnp.ndarray,
                  max_opacity: float = 0.01) -> GaussianModel:
    """Periodic opacity clamp (3DGS resets opacities below a ceiling)."""
    ceil_logit = jnp.log(max_opacity / (1.0 - max_opacity))
    new_logit = jnp.minimum(model.opacity_logit, ceil_logit)
    return model._replace(
        opacity_logit=jnp.where(active, new_logit, model.opacity_logit)
    )


def reset_opt_slots(opt_state, changed: jnp.ndarray):
    """Zero optimizer moments for slots whose parameters were rewritten.

    3DGS resets Adam state for cloned/split Gaussians; ``changed`` is a [P]
    mask. Works on any optax state whose leaves are [P, ...] arrays.
    """
    def zero(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == changed.shape[0]:
            mask = changed.reshape((-1,) + (1,) * (x.ndim - 1))
            return jnp.where(mask, 0.0, x)
        return x

    return jax.tree.map(zero, opt_state)
