"""Single-device 3DGS training step (BASELINE config 4).

Minimal but real: renders through the production pipeline, L1+D-SSIM loss,
optax Adam, plus the densification statistics the upstream trainer reads
(radii and the NDC-scaled means2D gradient norm — reference
__init__.py means2D dummy / backward.cu ddelx_dx).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import GaussianRasterizationSettings
from ..models.gaussians import GaussianModel
from ..render.rasterize import rasterize_gaussians
from .loss import rgb_loss


class CameraArrays(NamedTuple):
    """The traced (per-camera) half of GaussianRasterizationSettings."""

    viewmatrix: jnp.ndarray         # [4, 4]
    projmatrix: jnp.ndarray         # [4, 4]
    inv_viewprojmatrix: jnp.ndarray  # [4, 4]
    campos: jnp.ndarray             # [3]


def render_model(
    model: GaussianModel,
    cam: CameraArrays,
    *,
    static: GaussianRasterizationSettings,
    means2d_dummy: Optional[jnp.ndarray] = None,
    **kw,
):
    """Render a GaussianModel through the public API."""
    rs = static._replace(
        viewmatrix=cam.viewmatrix,
        projmatrix=cam.projmatrix,
        inv_viewprojmatrix=cam.inv_viewprojmatrix,
        campos=cam.campos,
    )
    return rasterize_gaussians(
        model.means3d,
        means2d_dummy,
        model.shs(),
        None,
        model.opacities(),
        model.scales(),
        model.rotations_normalized(),
        None,
        rs,
        **kw,
    )


class TrainState(NamedTuple):
    model: GaussianModel
    opt_state: optax.OptState
    step: jnp.ndarray


class DensifyStats(NamedTuple):
    """Running stats the densification controller consumes."""

    grad2d_accum: jnp.ndarray  # [P] sum of ||dL/dmean2D_ndc|| over steps
    denom: jnp.ndarray         # [P] number of steps the Gaussian was visible
    max_radii: jnp.ndarray     # [P] max screen radius seen


def make_optimizer(lr: float = 1e-3):
    return optax.adam(lr, eps=1e-15)


def position_lr_schedule(
    lr_init: float = 1.6e-4,
    lr_final: float = 1.6e-6,
    lr_delay_mult: float = 0.01,
    lr_delay_steps: int = 0,
    max_steps: int = 30_000,
    spatial_lr_scale: float = 1.0,
):
    """The upstream 3DGS exponential position-LR schedule (log-lerp)."""

    def schedule(step):
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(
            jnp.log(lr_init * spatial_lr_scale) * (1 - t)
            + jnp.log(lr_final * spatial_lr_scale) * t
        )
        if lr_delay_steps > 0:
            delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
            )
        else:
            delay = 1.0
        return delay * log_lerp

    return schedule


def make_3dgs_optimizer(
    spatial_lr_scale: float = 1.0,
    *,
    position_lr_init: float = 1.6e-4,
    position_lr_final: float = 1.6e-6,
    position_lr_max_steps: int = 30_000,
    feature_lr: float = 2.5e-3,
    opacity_lr: float = 0.025,
    scaling_lr: float = 5e-3,
    rotation_lr: float = 1e-3,
):
    """Per-parameter-group Adam matching the upstream 3DGS trainer defaults
    (means: exp-decayed LR scaled by scene extent; SH rest at feature_lr/20)."""
    pos_sched = position_lr_schedule(
        position_lr_init, position_lr_final,
        max_steps=position_lr_max_steps, spatial_lr_scale=spatial_lr_scale,
    )
    adam = partial(optax.adam, eps=1e-15)
    return optax.multi_transform(
        {
            "means": adam(pos_sched),
            "scales": adam(scaling_lr),
            "rot": adam(rotation_lr),
            "opacity": adam(opacity_lr),
            "dc": adam(feature_lr),
            "rest": adam(feature_lr / 20.0),
        },
        GaussianModel(
            means3d="means", scales_log="scales", rotations="rot",
            opacity_logit="opacity", sh_dc="dc", sh_rest="rest",
        ),
    )


# SH band of each rest-coefficient (coeffs 1..15): degree l covers indices
# [l^2, (l+1)^2). Plain Python — a module-level jnp.array would initialize
# the XLA backend at import and break jax.distributed bring-up.
_SH_REST_BAND = (1,) * 3 + (2,) * 5 + (3,) * 7


def active_sh_mask(active_degree, n_rest: int = 15):
    """[n_rest, 1] mask over sh_rest coefficients for a (traced) active
    degree — the upstream trainer's progressive oneupSHdegree schedule,
    jit-friendly: inactive bands render as zero and receive zero gradient."""
    bands = jnp.asarray(_SH_REST_BAND[:n_rest], jnp.int32)
    return (bands <= active_degree).astype(jnp.float32)[:, None]


def make_train_step(
    optimizer,
    *,
    static: GaussianRasterizationSettings,
    lambda_dssim: float = 0.2,
    pair_capacity: Optional[int] = None,
    pad_capacity: Optional[int] = None,
    seg_cap: int = 16384,
    sh_ramp_every: int = 0,
    interpret: bool = False,
    render_kwargs: Optional[dict] = None,
):
    """Returns jittable (state, cam, target, stats) -> (state, stats, aux).

    ``sh_ramp_every > 0`` enables the upstream trainer's progressive SH
    schedule (one more band every N steps, up to ``static.sh_degree``):
    higher bands are masked out of the render — and therefore out of the
    gradients — until active. The step counter lives in TrainState, so the
    ramp costs no retracing.

    ``render_kwargs`` passes extra rasterize knobs through (tile_shape,
    carry_bf16, rank_key — the measured, quality-gated winners the CLI
    defaults to for GLOBAL-mode training)."""
    render_kwargs = render_kwargs or {}

    def train_step(state: TrainState, cam: CameraArrays, target, stats):
        P = state.model.num_gaussians
        means2d_dummy = jnp.zeros((P, 2), jnp.float32)

        if sh_ramp_every:
            active = jnp.minimum(
                (state.step // sh_ramp_every).astype(jnp.int32),
                int(static.sh_degree),
            )
            mask = active_sh_mask(active, state.model.sh_rest.shape[1])
        else:
            mask = None

        def loss_fn(model, m2d):
            if mask is not None:
                model = model._replace(sh_rest=model.sh_rest * mask)
            out = render_model(
                model, cam, static=static, means2d_dummy=m2d,
                pair_capacity=pair_capacity, pad_capacity=pad_capacity,
                seg_cap=seg_cap, interpret=interpret, full_output=True,
                **render_kwargs,
            )
            loss = rgb_loss(out.color, target, lambda_dssim)
            return loss, (out.radii, out.overflow, out.grad_overflow)

        (loss, (radii, overflow, grad_overflow)), (grads, g2d) = (
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
            (state.model, means2d_dummy)
        )

        updates, new_opt = optimizer.update(grads, state.opt_state, state.model)
        new_model = optax.apply_updates(state.model, updates)
        new_state = TrainState(new_model, new_opt, state.step + 1)

        visible = radii > 0
        g2d_norm = jnp.linalg.norm(g2d, axis=-1)
        new_stats = DensifyStats(
            grad2d_accum=stats.grad2d_accum + jnp.where(visible, g2d_norm, 0.0),
            denom=stats.denom + visible.astype(jnp.int32),
            max_radii=jnp.maximum(stats.max_radii, radii),
        )
        return new_state, new_stats, {
            "loss": loss, "overflow": overflow,
            "grad_overflow": grad_overflow,
        }

    return train_step


def make_batched_train_step(
    optimizer,
    *,
    static: GaussianRasterizationSettings,
    lambda_dssim: float = 0.2,
    pair_capacity: Optional[int] = None,
    pad_capacity: Optional[int] = None,
    seg_cap: int = 16384,
    interpret: bool = False,
):
    """Like make_train_step, but over a BATCH of cameras per step.

    ``cams`` leaves and ``targets`` carry a leading batch axis; the loss is
    the mean over cameras (gradients are the exact mean of per-camera
    gradients — jax.vmap maps the whole pipeline, Pallas kernels included,
    by fronting the batch onto the kernel grids). Densify stats accumulate
    per-camera visibility/gradients summed over the batch, scaled like B
    single-camera steps.

    Use this for the multi-view OBJECTIVE (lower-variance gradients), not
    for throughput: measured on v5e at lego scale, the vmapped pipeline
    runs ~0.6x the sequential per-camera rate (batched lax.sort and
    batched kernel grids do not amortize). One camera per step remains the
    fastest schedule on one chip; parallel.train batches across chips.
    """

    def train_step(state: TrainState, cams: CameraArrays, targets, stats):
        P = state.model.num_gaussians
        means2d_dummy = jnp.zeros((P, 2), jnp.float32)

        def one(model, m2d, cam, target):
            out = render_model(
                model, cam, static=static, means2d_dummy=m2d,
                pair_capacity=pair_capacity, pad_capacity=pad_capacity,
                seg_cap=seg_cap, interpret=interpret, full_output=True,
            )
            loss = rgb_loss(out.color, target, lambda_dssim)
            return loss, (out.radii, out.overflow)

        def loss_fn(model, m2d):
            losses, (radii, overflow) = jax.vmap(
                lambda c, t: one(model, m2d, c, t)
            )(cams, targets)
            return jnp.mean(losses), (radii, overflow)

        (loss, (radii, overflow)), (grads, g2d) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.model, means2d_dummy)

        updates, new_opt = optimizer.update(grads, state.opt_state, state.model)
        new_model = optax.apply_updates(state.model, updates)
        new_state = TrainState(new_model, new_opt, state.step + 1)

        visible = radii > 0                      # [B, P]
        g2d_norm = jnp.linalg.norm(g2d, axis=-1)  # [P] (mean over batch)
        n_vis = jnp.sum(visible, axis=0)
        B = radii.shape[0]
        new_stats = DensifyStats(
            # g2d is the batch MEAN gradient; accumulate it scaled back to
            # per-camera magnitude so thresholds match the unbatched path.
            grad2d_accum=stats.grad2d_accum
            + jnp.where(n_vis > 0, g2d_norm * B, 0.0),
            denom=stats.denom + n_vis.astype(jnp.int32),
            max_radii=jnp.maximum(stats.max_radii, jnp.max(radii, axis=0)),
        )
        return new_state, new_stats, {
            "loss": loss, "overflow": jnp.any(overflow)
        }

    return train_step


def init_train_state(model: GaussianModel, optimizer) -> TrainState:
    return TrainState(model, optimizer.init(model), jnp.int32(0))


def init_densify_stats(num_gaussians: int) -> DensifyStats:
    return DensifyStats(
        grad2d_accum=jnp.zeros((num_gaussians,), jnp.float32),
        denom=jnp.zeros((num_gaussians,), jnp.int32),
        max_radii=jnp.zeros((num_gaussians,), jnp.int32),
    )
