"""Evaluation metrics: MSE / PSNR / SSIM (pure JAX) + LPIPS hook.

Counterpart of the reference Evaluator (evaluator.py:12-118): MSE/PSNR on the
full image (natural log formula, evaluator.py:21-24), SSIM on the bbox crop of
``mask_at_box`` (evaluator.py:26-46, skimage defaults: 7x7 uniform window,
gaussian_weights=False, data_range inferred as 1.0 here). LPIPS uses a JAX
AlexNet with ported weights when available (see train/lpips.py); the reference
round-trips PNGs through disk which quantizes to uint8 — we operate on floats.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    return ((pred - target) ** 2).mean()


def psnr(pred: jax.Array, target: jax.Array) -> jax.Array:
    """-10 log10(mse), images in [0, 1] (evaluator.py:20-24)."""
    m = mse(pred, target)
    return -10.0 * jnp.log(m) / jnp.log(10.0)


def _uniform_filter(img: jax.Array, size: int = 7) -> jax.Array:
    """Separable mean filter with skimage 'reflect' padding. img: (H, W, C)."""
    pad = size // 2
    x = jnp.pad(img, ((pad, pad), (0, 0), (0, 0)), mode="symmetric")
    kernel = jnp.ones((size,), img.dtype) / size
    x = jax.vmap(jax.vmap(lambda col: jnp.convolve(col, kernel, mode="valid"),
                          in_axes=1, out_axes=1),
                 in_axes=2, out_axes=2)(x)
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="symmetric")
    x = jax.vmap(jax.vmap(lambda row: jnp.convolve(row, kernel, mode="valid"),
                          in_axes=0, out_axes=0),
                 in_axes=2, out_axes=2)(x)
    return x


def ssim(pred: jax.Array, target: jax.Array, data_range: float = 1.0,
         win_size: int = 7) -> jax.Array:
    """Mean SSIM over an (H, W, C) pair, skimage-compatible (uniform window,
    K1=0.01, K2=0.03, sample covariance normalization)."""
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    np_ = win_size ** 2
    cov_norm = np_ / (np_ - 1.0)

    ux = _uniform_filter(pred, win_size)
    uy = _uniform_filter(target, win_size)
    uxx = _uniform_filter(pred * pred, win_size)
    uyy = _uniform_filter(target * target, win_size)
    uxy = _uniform_filter(pred * target, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    a1 = 2 * ux * uy + c1
    a2 = 2 * vxy + c2
    b1 = ux ** 2 + uy ** 2 + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)
    # skimage crops the filter's edge effect before averaging
    pad = (win_size - 1) // 2
    return s[pad:-pad, pad:-pad].mean()


def bbox_crop(img: jax.Array, mask_at_box) -> jax.Array:
    """Crop to the bounding rect of a boolean mask (host-side helper, matches
    cv2.boundingRect usage at evaluator.py:27-29). Not jittable (dynamic
    shape) — used in eval scripts."""
    import numpy as np

    m = np.asarray(mask_at_box).astype(bool)
    ys, xs = np.where(m)
    if ys.size == 0:
        return img
    return img[ys.min():ys.max() + 1, xs.min():xs.max() + 1]
