"""Farthest point sampling + grouping in pure XLA.

TPU-native replacement for the vendored CUDA ``pointnet2_ops``
(tgs/models/snowflake/pointnet2_ops_lib, SURVEY.md §2.6): FPS becomes a
min-distance scan (lax.fori_loop over samples), ball-query/grouping become
masked kNN gathers. These feed the snowflake point upsampler — not the render
hot path — so a clean O(S*N) scan is the right trade.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from guassianhand_tpu.ops.knn import knn


@functools.partial(jax.jit, static_argnames=("n_samples",))
def farthest_point_sample(points: jax.Array, n_samples: int) -> jax.Array:
    """points: (N, 3) -> (n_samples,) int32 indices, starting from point 0
    (same convention as the CUDA kernel)."""
    n = points.shape[0]

    def body(i, state):
        idxs, mind = state
        last = points[idxs[i - 1]]
        d = jnp.sum((points - last[None]) ** 2, axis=-1)
        mind = jnp.minimum(mind, d)
        idxs = idxs.at[i].set(jnp.argmax(mind).astype(jnp.int32))
        return idxs, mind

    idxs = jnp.zeros((n_samples,), jnp.int32)
    mind = jnp.full((n,), jnp.inf)
    idxs, _ = jax.lax.fori_loop(1, n_samples, body, (idxs, mind))
    return idxs


def fps_subsample(points: jax.Array, n_samples: int) -> jax.Array:
    """(N, C) -> (n_samples, C), xyz in the first 3 channels."""
    idx = farthest_point_sample(points[:, :3], n_samples)
    return points[idx]


def ball_query(query: jax.Array, points: jax.Array, radius: float, k: int):
    """Indices of up to k points within radius per query; out-of-ball slots
    repeat the nearest neighbor (CUDA ball_query convention repeats the first
    found). Returns (idx (Q, k), mask (Q, k))."""
    d, idx = knn(query, points, k)
    inside = d <= radius * radius
    first = idx[:, :1]
    idx = jnp.where(inside, idx, first)
    return idx, inside


def group_points(features: jax.Array, idx: jax.Array) -> jax.Array:
    """features: (N, C), idx: (Q, K) -> (Q, K, C) gather."""
    return features[idx]
