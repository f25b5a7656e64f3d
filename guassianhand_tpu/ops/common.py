"""Shared constants/helpers for the rasterizer implementations.

The acceptance semantics replicated here are those of the standard 3DGS tile
rasterizer the reference calls (renderer_one_shot.py:336-346):

- per-pixel skip if power > 0
- alpha = min(0.99, opacity * exp(power)); skip if alpha < 1/255
- stop compositing once T * (1 - alpha) < 1e-4 (the crossing Gaussian excluded)
- the 0.99 clamp is NOT gated in the backward (straight-through), matching the
  CUDA backward which differentiates through the pre-clamp value.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def straight_through_alpha(alpha_raw: jax.Array) -> jax.Array:
    """min(ALPHA_MAX, alpha) in value, identity in gradient (CUDA parity)."""
    clipped = jnp.minimum(alpha_raw, ALPHA_MAX)
    return alpha_raw + jax.lax.stop_gradient(clipped - alpha_raw)


def tile_rect(mean2d: jax.Array, radius: jax.Array, n_tiles_x: int, n_tiles_y: int,
              tile_size: int, y_band=None):
    """Tile-space bounding rect [min, max) per Gaussian, CUDA getRect semantics.

    mean2d: (N, 2) pixel coords; radius: (N,). Returns int32 (N,) x0, x1, y0, y1.
    y_band: optional per-Gaussian (y_lo, y_hi) tile-row clamp — used by the
    stacked multi-view canvas so a view's Gaussians never bleed into the
    vertically adjacent view's tiles.
    """
    x, y = mean2d[:, 0], mean2d[:, 1]
    ts = float(tile_size)
    y_lo, y_hi = (0, n_tiles_y) if y_band is None else y_band
    x0 = jnp.clip(((x - radius) / ts).astype(jnp.int32), 0, n_tiles_x)
    y0 = jnp.clip(((y - radius) / ts).astype(jnp.int32), y_lo, y_hi)
    x1 = jnp.clip(((x + radius + ts - 1) / ts).astype(jnp.int32), 0, n_tiles_x)
    y1 = jnp.clip(((y + radius + ts - 1) / ts).astype(jnp.int32), y_lo, y_hi)
    return x0, x1, y0, y1
