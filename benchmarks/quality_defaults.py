"""Training-quality gate for the headline performance knobs (VERDICT r2 #5).

The round-2 sweep measured 32x16 binning tiles, bf16 cotangent carriers and
the packed rank-key sort as individually-winning levers on the headline
train step (+21%..+26% combined). Before they become defaults they must not
cost training quality: this harness runs the SAME synthetic fit twice —
baseline (f32 carriers, 16x16 tiles, slot sort) vs winners — and reports
the fitted PSNR of each. The knobs only change scheduling/precision of the
gradient path, so the fits must land within noise of each other.

    PYTHONPATH=/root/repo python benchmarks/quality_defaults.py

Prints one JSON line per config plus a verdict line
  {"gate": "PASS"|"FAIL", "delta_db": ...}  (PASS: winners >= base - 0.15).
"""

from __future__ import annotations

import argparse
import json

import jax

from stopthepop_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
import jax.numpy as jnp
import optax

from stopthepop_tpu.config import ExtendedSettings, GaussianRasterizationSettings
from stopthepop_tpu.models.gaussians import init_random
from stopthepop_tpu.train.loss import psnr, rgb_loss
from stopthepop_tpu.train.trainer import CameraArrays, render_model
from stopthepop_tpu.utils.testing import make_camera

W = H = 512
NOISE_DB = 0.15


def _scene(num_gaussians):
    cam = make_camera(W, H, campos=(0.0, 0.0, -4.0))
    cams = CameraArrays(
        cam.viewmatrix, cam.projmatrix, cam.inv_viewprojmatrix, cam.campos
    )
    true_model = init_random(jax.random.PRNGKey(7), num_gaussians, extent=1.5)
    true_model = true_model._replace(scales_log=true_model.scales_log - 1.8)
    settings = ExtendedSettings()
    settings.culling_settings.rect_bounding = True
    settings.culling_settings.tight_opacity_bounding = True
    static = GaussianRasterizationSettings(
        image_height=H, image_width=W,
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        bg=jnp.zeros(3), scale_modifier=1.0,
        viewmatrix=cam.viewmatrix, projmatrix=cam.projmatrix,
        inv_viewprojmatrix=cam.inv_viewprojmatrix,
        sh_degree=3, campos=cam.campos, prefiltered=False, settings=settings,
    )
    return cams, static, true_model


def fit(cams, static, target, start, capacity, steps, interpret, **knobs):
    optimizer = optax.adam(2e-3)

    def loss_fn(model):
        color, _ = render_model(
            model, cams, static=static, pair_capacity=capacity,
            interpret=interpret, **knobs,
        )
        return rgb_loss(color, target)

    @jax.jit
    def run(model, opt_state):
        def step(carry, _):
            m, o = carry
            loss, grads = jax.value_and_grad(loss_fn)(m)
            updates, o = optimizer.update(grads, o, m)
            m = optax.apply_updates(m, updates)
            return (m, o), loss

        (m, o), losses = jax.lax.scan(step, (model, opt_state), None,
                                      length=steps)
        return m, losses

    model, losses = run(start, optimizer.init(start))
    color, _ = render_model(model, cams, static=static,
                            pair_capacity=capacity, interpret=interpret,
                            **knobs)
    return (
        float(psnr(jnp.clip(color, 0, 1), target)),
        float(losses[0]), float(losses[-1]),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gaussians", type=int, default=20_000)
    ap.add_argument("--steps", type=int, default=150)
    args = ap.parse_args()
    interpret = jax.default_backend() != "tpu"

    cams, static, true_model = _scene(args.gaussians)
    capacity = 524_288
    target, _ = render_model(true_model, cams, static=static,
                             pair_capacity=capacity, interpret=interpret)
    target = jnp.clip(jax.lax.stop_gradient(target), 0.0, 1.0)

    start = init_random(jax.random.PRNGKey(8), args.gaussians, extent=1.5)
    start = start._replace(scales_log=start.scales_log - 1.8)

    configs = {
        "baseline f32/16x16/slot": {},
        "winners bf16+32x16+rankkey": dict(
            carry_bf16=True, tile_shape=(32, 16), rank_key=True,
        ),
        "bf16 only": dict(carry_bf16=True),
        "32x16 only": dict(tile_shape=(32, 16)),
        # Round-5 candidates: the f16-packed forward payload (pack_fwd)
        # alone and stacked on the winners — it rounds the FORWARD conic/
        # opacity/rgb to f16 (~5e-4 relative), so this fit gate is its
        # primary quality evidence.
        "packfwd only": dict(pack_fwd=True),
        "winners+packfwd": dict(
            carry_bf16=True, tile_shape=(32, 16), rank_key=True,
            pack_fwd=True,
        ),
    }
    scores = {}
    for name, knobs in configs.items():
        p, l0, l1 = fit(cams, static, target, start, capacity, args.steps,
                        interpret, **knobs)
        scores[name] = p
        print(json.dumps({
            "config": name, "psnr_db": round(p, 3),
            "loss_first": round(l0, 5), "loss_last": round(l1, 5),
        }), flush=True)
    delta = scores["winners bf16+32x16+rankkey"] - scores[
        "baseline f32/16x16/slot"]
    delta_pf = scores["winners+packfwd"] - scores["baseline f32/16x16/slot"]
    print(json.dumps({
        "gate": "PASS" if delta >= -NOISE_DB else "FAIL",
        "delta_db": round(delta, 3),
        "gate_packfwd": "PASS" if delta_pf >= -NOISE_DB else "FAIL",
        "delta_packfwd_db": round(delta_pf, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
