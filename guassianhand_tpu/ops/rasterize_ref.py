"""Oracle compositor: dense O(N * P) pure-XLA front-to-back alpha compositing.

This is the slow-but-obviously-correct reference implementation used to
grad-check the Pallas tile kernels (SURVEY.md §7.2 "correctness oracle"). It is
fully differentiable via autodiff and replicates the acceptance semantics of
the CUDA rasterizer the reference uses (see ops/common.py), including the
tile-granularity inclusion test (a Gaussian is evaluated at a pixel iff the
pixel's tile intersects the Gaussian's 3-sigma rect — the same rule the tile
binner uses), so oracle and Pallas outputs agree exactly, not just closely.

Use for <= a few thousand Gaussians at <= 256^2 only.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from guassianhand_tpu.ops.common import (ALPHA_MIN, T_EPS, opacity_cull_keep,
                                         straight_through_alpha, tile_rect)


def composite_reference(
    mean2d: jax.Array,    # (N, 2)
    conic: jax.Array,     # (N, 3)
    color: jax.Array,     # (N, 3)
    opacity: jax.Array,   # (N,)
    depth: jax.Array,     # (N,)
    radius: jax.Array,    # (N,)
    visible: jax.Array,   # (N,) bool
    height: int,
    width: int,
    background: jax.Array,  # (3,)
    tile_size: int = 16,
    opacity_cull: bool = True,
):
    """Returns (image (H, W, 3), alpha (H, W), final_T (H, W))."""
    n = mean2d.shape[0]
    # Stable global depth order (invisible last). Matches the CUDA radix sort
    # on float depth bits restricted to each tile's members.
    sort_depth = jnp.where(visible, depth, jnp.inf)
    order = jnp.argsort(sort_depth, stable=True)
    mean2d = mean2d[order]
    conic = conic[order]
    color = color[order]
    opacity = opacity[order]
    radius = radius[order]
    visible = visible[order]

    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=mean2d.dtype),
                          jnp.arange(width, dtype=mean2d.dtype), indexing="ij")
    px = xs.reshape(-1)  # (P,)
    py = ys.reshape(-1)

    dx = mean2d[None, :, 0] - px[:, None]  # (P, N)
    dy = mean2d[None, :, 1] - py[:, None]
    A, B, C = conic[:, 0], conic[:, 1], conic[:, 2]
    power = -0.5 * (A[None] * dx * dx + C[None] * dy * dy) - B[None] * dx * dy
    alpha_raw = opacity[None, :] * jnp.exp(power)
    alpha = straight_through_alpha(alpha_raw)

    # Tile-granularity inclusion: pixel's tile must lie in the Gaussian's rect.
    ntx = -(-width // tile_size)
    nty = -(-height // tile_size)
    x0, x1, y0, y1 = tile_rect(mean2d, radius, ntx, nty, tile_size)
    ptx = (px[:, None] // tile_size).astype(jnp.int32)
    pty = (py[:, None] // tile_size).astype(jnp.int32)
    in_tile = (ptx >= x0[None]) & (ptx < x1[None]) & (pty >= y0[None]) & (pty < y1[None])

    keep = (visible[None, :] & in_tile & (power <= 0.0)
            & (jax.lax.stop_gradient(alpha) >= ALPHA_MIN))
    if opacity_cull:
        # THE shared cull decision (ops/common.opacity_cull_keep) — same
        # helper as the binner, so the two sites are bit-identical by
        # construction.
        keep = keep & jax.lax.stop_gradient(opacity_cull_keep(
            mean2d[None, :, 0], mean2d[None, :, 1], radius[None, :],
            opacity[None, :], ptx, pty, tile_size))  # (P, N)
    alpha_eff = alpha * keep.astype(alpha.dtype)

    g = 1.0 - alpha_eff
    cp_incl = jnp.cumprod(g, axis=1)
    cp_excl = jnp.concatenate([jnp.ones((cp_incl.shape[0], 1), g.dtype),
                               cp_incl[:, :-1]], axis=1)
    accept = jax.lax.stop_gradient(cp_incl >= T_EPS)
    w = alpha_eff * cp_excl * accept.astype(alpha.dtype)

    # HIGHEST: TPU fp32 matmul default truncates inputs to bf16 — the oracle
    # must be exact or kernel-parity checks chase phantom errors.
    img = jnp.matmul(w, color, precision=jax.lax.Precision.HIGHEST)  # (P, 3)
    final_t = jnp.min(jnp.where(accept, cp_incl, 1.0), axis=1)
    img = img + final_t[:, None] * background[None, :]
    alpha_out = 1.0 - final_t
    return (img.reshape(height, width, 3),
            alpha_out.reshape(height, width),
            final_t.reshape(height, width))
