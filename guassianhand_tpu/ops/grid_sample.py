"""Bilinear feature-map sampling (torch grid_sample align_corners=True parity).

The reference samples triplane/UV maps with F.grid_sample at
renderer_one_shot.py:401-406 and 435-440 (align_corners=True, bilinear,
zero padding). On TPU this is a pair of gathers + lerp — XLA fuses it.

Backward: autodiff of the gathers produces four scatter-adds with DUPLICATE
random-order indices into the (C, H*W) map — the same XLA-primitive wall the
rasterizer's per-gaussian gradient reduction hit (RasterizeConfig.
grad_segsort, docs/TRACE_BENCH_STEP.md rank 1). GH_GRIDSAMPLE_SEGSORT=1
(checked at trace time) swaps in a custom VJP whose feature-map gradient is
a sort-by-tap-index + ``indices_are_sorted`` segment_sum — values differ
from the scatter path only by fp32 summation ORDER within each texel's tap
sum; the uv gradient is computed by autodiff of the feature-detached
sampler (gathers only, no scatter) and is bit-identical.

MEASURED AND REJECTED as the default (r5, scripts/ab_fit_knobs.py on the
real v5e, full fit step): 85.50 ms vs the scatter path's 80.55 — unlike the
rasterizer's 278k-row reduction, these maps' scatters are not on the
critical path and the added argsorts + dense (H*W, C) segment-sum
materializations (2M texels for the residual maps) cost more than the
scatter they replace. Default OFF; the knob remains for future shapes.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _sample_core(feat: jax.Array, uv: jax.Array) -> jax.Array:
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


def _taps(feat_shape, uv):
    """Tap indices (4N,) into the flat (H*W) map and weights (4N,)."""
    _, h, w = feat_shape
    x = (uv[:, 0] + 1.0) * 0.5 * (w - 1)
    y = (uv[:, 1] + 1.0) * 0.5 * (h - 1)
    x0 = jnp.clip(jnp.floor(x), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    wx = jnp.clip(x - x0, 0.0, 1.0)
    wy = jnp.clip(y - y0, 0.0, 1.0)
    x0i, x1i, y0i, y1i = (v.astype(jnp.int32) for v in (x0, x1, y0, y1))
    idx = jnp.concatenate([y0i * w + x0i, y0i * w + x1i,
                           y1i * w + x0i, y1i * w + x1i])
    wts = jnp.concatenate([(1 - wx) * (1 - wy), wx * (1 - wy),
                           (1 - wx) * wy, wx * wy])
    return idx, wts


@jax.custom_vjp
def _sample_segsort(feat: jax.Array, uv: jax.Array) -> jax.Array:
    return _sample_core(feat, uv)


def _sample_segsort_fwd(feat, uv):
    return _sample_core(feat, uv), (feat, uv)


def _sample_segsort_bwd(res, g):
    feat, uv = res
    c, h, w = feat.shape
    # dfeat: sort the 4N weighted cotangent rows by tap index, reduce with
    # a sorted segment_sum (XLA lowers it to a cheap expansion instead of
    # the serial scatter-add the autodiff path emits)
    idx, wts = _taps(feat.shape, uv)
    rows = jnp.tile(g, (4, 1)) * wts[:, None]            # (4N, C)
    order = jnp.argsort(idx)
    dflat = jax.ops.segment_sum(rows[order], idx[order],
                                num_segments=h * w, indices_are_sorted=True)
    dfeat = dflat.T.reshape(c, h, w)
    # duv: autodiff of the feature-detached sampler — gathers only, and
    # bit-identical to the plain autodiff uv gradient
    _, vjp_uv = jax.vjp(
        lambda u: _sample_core(jax.lax.stop_gradient(feat), u), uv)
    duv, = vjp_uv(g)
    return dfeat, duv


_sample_segsort.defvjp(_sample_segsort_fwd, _sample_segsort_bwd)


def grid_sample_2d(feat: jax.Array, uv: jax.Array) -> jax.Array:
    """feat: (C, H, W); uv: (N, 2) in [-1, 1] (x then y, torch convention).
    Returns (N, C). Out-of-range coords clamp to the border (the sampled
    positions here are always in-range in practice)."""
    if os.environ.get("GH_GRIDSAMPLE_SEGSORT", "0") == "1":
        return _sample_segsort(feat, uv)
    return _sample_core(feat, uv)


def grid_sample_batched(feat: jax.Array, uv: jax.Array) -> jax.Array:
    """feat: (B, C, H, W); uv: (B, N, 2) -> (B, N, C)."""
    return jax.vmap(grid_sample_2d)(feat, uv)
