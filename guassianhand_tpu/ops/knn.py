"""Brute-force k-nearest-neighbors on TPU.

Replaces PyTorch3D ``knn_points`` (used for the K=100 interaction mask at
infer_one_shot.py:247-251). A tiled distance matrix + ``lax.top_k`` keeps the
MXU busy (the distance matrix is a matmul); ~25k x 25k once per frame is cheap
on TPU (SURVEY.md §2.6).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "query_chunk"))
def knn(query: jax.Array, points: jax.Array, k: int, query_chunk: int = 4096):
    """Returns (dists (Q, k), idx (Q, k)) of the k nearest points per query.

    Squared L2 distances, ascending. Ties broken by index (stable), matching
    typical GPU knn behavior closely enough for the interaction-mask use.
    """
    q, _ = query.shape
    pad = (-q) % query_chunk
    qpad = jnp.pad(query, ((0, pad), (0, 0)))
    p_sq = jnp.sum(points * points, axis=-1)

    def chunk_fn(qc):
        d = (jnp.sum(qc * qc, axis=-1, keepdims=True)
             - 2.0 * qc @ points.T + p_sq[None, :])
        neg_d, idx = jax.lax.top_k(-d, k)
        return -neg_d, idx

    chunks = qpad.reshape(-1, query_chunk, query.shape[-1])
    dists, idx = jax.lax.map(chunk_fn, chunks)
    dists = dists.reshape(-1, k)[:q]
    idx = idx.reshape(-1, k)[:q]
    return dists, idx


def interaction_mask(points_posed: jax.Array, points_tpose: jax.Array,
                     k: int = 100, threshold: int = 10) -> jax.Array:
    """Interaction detector (infer_one_shot.py:247-250): a point is
    'interacting' when fewer than ``threshold`` of its k nearest-neighbor
    indices agree between posed space and canonical T-pose space.

    points_*: (N, 3). Returns (N,) bool.
    """
    _, idx_world = knn(points_posed, points_posed, k)
    _, idx_canon = knn(points_tpose, points_tpose, k)
    agree = jnp.sum(idx_world == idx_canon, axis=-1)
    return agree < threshold
