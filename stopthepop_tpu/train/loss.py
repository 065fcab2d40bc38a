"""3DGS training losses: L1 + D-SSIM (the upstream trainer's objective).

loss = (1 - lambda_dssim) * L1 + lambda_dssim * (1 - SSIM), lambda_dssim=0.2.
SSIM uses the standard 11x11 Gaussian window (sigma=1.5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def _gaussian_window(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(pred, target, window_size: int = 11):
    """SSIM over [C, H, W] images (mean over channels and pixels)."""
    c1, c2 = 0.01**2, 0.03**2
    w = _gaussian_window(window_size)
    kernel = w[None, None, :, :]  # [1, 1, K, K]

    def conv(x):
        # depthwise: treat channels as batch
        x4 = x[:, None, :, :]  # [C, 1, H, W]
        return jax.lax.conv_general_dilated(
            x4, kernel, (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )[:, 0]

    mu_p = conv(pred)
    mu_t = conv(target)
    mu_pp = mu_p * mu_p
    mu_tt = mu_t * mu_t
    mu_pt = mu_p * mu_t
    sigma_p = conv(pred * pred) - mu_pp
    sigma_t = conv(target * target) - mu_tt
    sigma_pt = conv(pred * target) - mu_pt
    ssim_map = ((2 * mu_pt + c1) * (2 * sigma_pt + c2)) / (
        (mu_pp + mu_tt + c1) * (sigma_p + sigma_t + c2)
    )
    return jnp.mean(ssim_map)


def rgb_loss(pred, target, lambda_dssim: float = 0.2):
    return (1.0 - lambda_dssim) * l1_loss(pred, target) + lambda_dssim * (
        1.0 - ssim(pred, target)
    )


def psnr(pred, target):
    mse = jnp.mean((pred - target) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
