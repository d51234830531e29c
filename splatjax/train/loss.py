"""Training losses: L1 + SSIM (the standard 3DGS objective).

The reference is a viewer with no training loop (SURVEY.md §2 "components
the reference does NOT have"); this supplies the fit-from-scratch capability
required by BASELINE.json config 4.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> Array:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2.0 * sigma**2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(img1: Array, img2: Array, *, window_size: int = 11) -> Array:
    """Mean SSIM over an (H, W, C) pair, NVS-standard constants."""
    c1, c2 = 0.01**2, 0.03**2
    win = _gaussian_window(window_size)[:, :, None, None]  # (k, k, 1, 1)

    def conv(x):
        # (H, W, C) -> depthwise gaussian blur, 'valid' to avoid edge bias
        x = jnp.transpose(x, (2, 0, 1))[:, None]           # (C, 1, H, W)
        k = jnp.transpose(win, (2, 3, 0, 1))               # (1, 1, k, k)
        with jax.default_matmul_precision("highest"):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW")
            )
        return jnp.transpose(y[:, 0], (1, 2, 0))           # (H', W', C)

    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = conv(img1 * img1) - mu1_sq
    s2 = conv(img2 * img2) - mu2_sq
    s12 = conv(img1 * img2) - mu12
    num = (2 * mu12 + c1) * (2 * s12 + c2)
    den = (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    return jnp.mean(num / den)


def l1(img1: Array, img2: Array) -> Array:
    return jnp.mean(jnp.abs(img1 - img2))


def combined_loss(
    pred: Array, target: Array, *, ssim_weight: float = 0.2
) -> Array:
    """(1 - w) * L1 + w * (1 - SSIM), on RGB channels."""
    p, t = pred[..., :3], target[..., :3]
    return (1.0 - ssim_weight) * l1(p, t) + ssim_weight * (1.0 - ssim(p, t))


def psnr(pred: Array, target: Array) -> Array:
    mse = jnp.mean((pred[..., :3] - target[..., :3]) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
