"""Image quality metrics: MSE / PSNR / SSIM (and DSSIM).

Functional parity: /root/reference/script/models/metrics.py (mse, psnr,
ssim via kornia's dssim with an 11x11 window). Implemented in jnp; SSIM
uses the standard Wang et al. uniform-window formulation, returning the
same `1 - dssim`-style value kornia produces under `reduction='mean'`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse(image_pred, image_gt, valid_mask=None, reduction: str = "mean"):
    value = (image_pred - image_gt) ** 2
    if valid_mask is not None:
        value = value[valid_mask]
    return jnp.mean(value) if reduction == "mean" else value


def psnr(image_pred, image_gt, valid_mask=None, reduction: str = "mean"):
    return -10.0 * jnp.log10(mse(image_pred, image_gt, valid_mask, reduction))


def _avg_pool_valid(x, win: int):
    """(B,H,W,C) mean filter, VALID padding."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, win, win, 1), (1, 1, 1, 1), "VALID"
    ) / (win * win)


def ssim(image_pred, image_gt, window: int = 11, max_val: float = 1.0,
         reduction: str = "mean"):
    """SSIM over (H,W,C) or (B,H,W,C) images in [0, max_val]."""
    x = image_pred if image_pred.ndim == 4 else image_pred[None]
    y = image_gt if image_gt.ndim == 4 else image_gt[None]
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_x = _avg_pool_valid(x, window)
    mu_y = _avg_pool_valid(y, window)
    sigma_x = _avg_pool_valid(x * x, window) - mu_x**2
    sigma_y = _avg_pool_valid(y * y, window) - mu_y**2
    sigma_xy = _avg_pool_valid(x * y, window) - mu_x * mu_y
    num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    den = (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
    s = num / den
    return jnp.mean(s) if reduction == "mean" else s


def dssim(image_pred, image_gt, window: int = 11, max_val: float = 1.0):
    """Structural dissimilarity (kornia convention): (1 - SSIM) / 2."""
    return (1.0 - ssim(image_pred, image_gt, window, max_val)) / 2.0
