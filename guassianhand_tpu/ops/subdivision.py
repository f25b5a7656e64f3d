"""Edge-midpoint mesh subdivision with precomputed static topology.

The reference subdivides the MANO mesh per sample on the CPU inside dataloader
workers (mis_utils.py:45-122, called from dataset_one_shot.py:321-325). Since
the topology is fixed, we precompute the edge list once (numpy, at dataset
setup) and the per-step subdivision becomes a pair of gathers — it runs jitted
on TPU inside the training step (SURVEY.md §7.1).

Matches the reference layout exactly: new vertices are appended after the
originals in edge order; only the 4*F child faces are returned, in the same
(a,ab,ca),(ab,b,bc),(ca,ab,bc),(ca,bc,c) order (mis_utils.py:102-120).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class SubdivisionPlan(NamedTuple):
    """Static topology for one subdivision level."""

    edges: np.ndarray       # (E, 2) int32 vertex pairs (midpoint sources)
    faces_out: np.ndarray   # (4F, 3) int32 child faces over V+E vertices
    n_vertices_in: int
    n_vertices_out: int


def build_subdivision_plan(faces: np.ndarray, n_vertices: int) -> SubdivisionPlan:
    faces = np.asarray(faces, np.int64)
    nf = faces.shape[0]
    edge_map = {}
    edges = []

    def edge_id(a, b):
        key = (min(a, b), max(a, b))
        if key not in edge_map:
            edge_map[key] = len(edges)
            edges.append(key)
        return edge_map[key]

    child = np.zeros((4 * nf, 3), np.int64)
    for i in range(nf):
        a, b, c = (int(v) for v in faces[i])
        ab = n_vertices + edge_id(a, b)
        bc = n_vertices + edge_id(b, c)
        ca = n_vertices + edge_id(c, a)
        child[4 * i + 0] = (a, ab, ca)
        child[4 * i + 1] = (ab, b, bc)
        child[4 * i + 2] = (ca, ab, bc)
        child[4 * i + 3] = (ca, bc, c)

    edges_np = np.asarray(edges, np.int32)
    return SubdivisionPlan(
        edges=edges_np,
        faces_out=child.astype(np.int32),
        n_vertices_in=n_vertices,
        n_vertices_out=n_vertices + len(edges),
    )


def build_subdivision_plans(faces: np.ndarray, n_vertices: int,
                            levels: int) -> Tuple[SubdivisionPlan, ...]:
    plans = []
    for _ in range(levels):
        plan = build_subdivision_plan(faces, n_vertices)
        plans.append(plan)
        faces = plan.faces_out
        n_vertices = plan.n_vertices_out
    return tuple(plans)


def subdivide_vertices(vertices: jax.Array, plan: SubdivisionPlan) -> jax.Array:
    """(V, D) -> (V+E, D): append edge midpoints. Jit-friendly (gather + mean)."""
    e = jnp.asarray(plan.edges)
    mid = 0.5 * (vertices[e[:, 0]] + vertices[e[:, 1]])
    return jnp.concatenate([vertices, mid], axis=0)


def subdivide_n(vertices: jax.Array, plans) -> jax.Array:
    for plan in plans:
        vertices = subdivide_vertices(vertices, plan)
    return vertices
