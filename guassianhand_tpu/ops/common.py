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

# Safety margin on the opacity-cull distance bound: the bound itself is
# conservative in exact arithmetic; the margin additionally covers fp32
# rounding differences between the bound and the kernels' actual conic
# quadratic so a pair is only culled when alpha < ALPHA_MIN with room.
CULL_MARGIN = 1.001


def opacity_cull_r2(radius: jax.Array, opacity: jax.Array) -> jax.Array:
    """Squared pixel distance beyond which a Gaussian's alpha is provably
    < ALPHA_MIN (so the compositors' acceptance gate rejects it everywhere).

    For any pixel p: q(p) = (p-mu)^T conic (p-mu) >= |p-mu|^2 / lambda_max,
    and radius = ceil(3 sqrt(lambda_max)) gives lambda_max <= (radius/3)^2.
    Hence alpha = opacity * exp(-q/2) < ALPHA_MIN whenever
    |p-mu|^2 > 2 (radius/3)^2 ln(opacity/ALPHA_MIN). Culling a (gaussian,
    tile) pair whose min distance to the tile exceeds this is EXACT — every
    pixel of the tile fails the alpha >= ALPHA_MIN gate, contributing zero
    to both the forward value and every gradient. Index computation only
    (callers stop_gradient the inputs).
    """
    op = jax.lax.stop_gradient(opacity)
    lam_ub = (radius / 3.0) ** 2
    r2 = 2.0 * lam_ub * jnp.log(jnp.maximum(op, 1e-12) * (1.0 / ALPHA_MIN))
    return jnp.where(op > ALPHA_MIN, r2 * CULL_MARGIN + 1e-2, 0.0)


def tile_min_dist2(mx, my, tx, ty, tile_size: int):
    """Min squared distance from point (mx, my) to tile (tx, ty)'s pixel rect
    [tx*ts, tx*ts + ts - 1] x [ty*ts, ty*ts + ts - 1] (pixel centers at
    integer coordinates). Broadcasts over any compatible shapes."""
    ts = float(tile_size)
    x0 = tx.astype(jnp.float32) * ts
    y0 = ty.astype(jnp.float32) * ts
    dx = jnp.maximum(jnp.maximum(x0 - mx, mx - (x0 + (ts - 1.0))), 0.0)
    dy = jnp.maximum(jnp.maximum(y0 - my, my - (y0 + (ts - 1.0))), 0.0)
    return dx * dx + dy * dy


def opacity_cull_keep(mx, my, radius, opacity, tx, ty, tile_size: int):
    """THE opacity-cull decision, shared by every site that makes it (binner,
    sharded-rasterizer enumeration, reference oracle) so the three stay
    bit-identical by construction: keep (gaussian, tile) iff the tile's min
    pixel distance from the center does not exceed the provable sub-1/255
    radius. All arguments broadcast (callers orient their axes)."""
    return (tile_min_dist2(mx, my, tx, ty, tile_size)
            <= opacity_cull_r2(radius, opacity))


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
