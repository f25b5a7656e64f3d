"""Bilinear feature-map sampling (torch grid_sample align_corners=True parity).

The reference samples triplane/UV maps with F.grid_sample at
renderer_one_shot.py:401-406 and 435-440 (align_corners=True, bilinear,
zero padding). On TPU this is a pair of gathers + lerp — XLA fuses it.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_2d(feat: jax.Array, uv: jax.Array) -> jax.Array:
    """feat: (C, H, W); uv: (N, 2) in [-1, 1] (x then y, torch convention).
    Returns (N, C). Out-of-range coords clamp to the border (the sampled
    positions here are always in-range in practice)."""
    c, h, w = feat.shape
    x = (uv[:, 0] + 1.0) * 0.5 * (w - 1)
    y = (uv[:, 1] + 1.0) * 0.5 * (h - 1)
    x0 = jnp.clip(jnp.floor(x), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    wx = jnp.clip(x - x0, 0.0, 1.0)
    wy = jnp.clip(y - y0, 0.0, 1.0)
    x0i, x1i, y0i, y1i = (v.astype(jnp.int32) for v in (x0, x1, y0, y1))

    f = feat.reshape(c, h * w)
    g00 = f[:, y0i * w + x0i]
    g01 = f[:, y0i * w + x1i]
    g10 = f[:, y1i * w + x0i]
    g11 = f[:, y1i * w + x1i]
    top = g00 * (1 - wx) + g01 * wx
    bot = g10 * (1 - wx) + g11 * wx
    return (top * (1 - wy) + bot * wy).T


def grid_sample_batched(feat: jax.Array, uv: jax.Array) -> jax.Array:
    """feat: (B, C, H, W); uv: (B, N, 2) -> (B, N, C)."""
    return jax.vmap(grid_sample_2d)(feat, uv)
