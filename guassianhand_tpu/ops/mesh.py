"""Mesh utilities: wrist sealing, vertex normals, mesh concatenation.

Counterparts of the reference helpers:
- ``seal``: cap the MANO wrist opening with a center-vertex fan
  (mis_utils.py:247-260; same 16-vertex boundary ring)
- ``vertex_normals``: area-weighted vertex normals (mis_utils.py:153-203)
- ``concat_meshes``: offset-concat of vertex/face lists (dataset_one_shot.py:49-63)
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# MANO wrist boundary ring (mis_utils.py:248)
WRIST_RING = np.array([108, 79, 78, 121, 214, 215, 279, 239, 234, 92, 38,
                       122, 118, 117, 119, 120], np.int32)


def seal(verts: np.ndarray, faces: np.ndarray, left: bool = False):
    """Append a wrist-center vertex and the closing fan. numpy, setup-time."""
    center = verts[WRIST_RING].mean(0, keepdims=True)
    out_v = np.concatenate([verts, center], axis=0)
    cid = out_v.shape[0] - 1
    fan = []
    for i in range(len(WRIST_RING)):
        if left:
            fan.append([WRIST_RING[i - 1], cid, WRIST_RING[i]])
        else:
            fan.append([WRIST_RING[i - 1], WRIST_RING[i], cid])
    return out_v, np.concatenate([faces, np.asarray(fan, faces.dtype)], axis=0)


def vertex_normals(verts: jax.Array, faces: jax.Array) -> jax.Array:
    """Area-weighted vertex normals, jit-friendly. verts (V,3), faces (F,3)."""
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)  # area-weighted face normal
    n = jnp.zeros_like(verts)
    n = n.at[faces[:, 0]].add(fn)
    n = n.at[faces[:, 1]].add(fn)
    n = n.at[faces[:, 2]].add(fn)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-6)


def concat_meshes(meshes: Sequence[Tuple[np.ndarray, np.ndarray]]):
    """[(verts, faces), ...] -> (verts, faces) with face offsets."""
    vs: List[np.ndarray] = []
    fs: List[np.ndarray] = []
    off = 0
    for v, f in meshes:
        vs.append(np.asarray(v))
        fs.append(np.asarray(f) + off)
        off += v.shape[0]
    return np.concatenate(vs, axis=0), np.concatenate(fs, axis=0)
