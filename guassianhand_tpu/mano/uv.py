"""UV atlas: per-vertex UVs and differentiable point -> (uv, signed distance).

Replaces the reference's external ``livehand.input_encoder.get_uvd`` (imported
at infer_one_shot.py:33 and renderer_one_shot.py:19; pip-installed, not in the
repo) which projects arbitrary query points onto the subdivided MANO UV mesh.

TPU-first split (SURVEY.md §7.1):
- query points that *are* mesh vertices (the standard path) use a precomputed
  static per-vertex UV table — a single gather;
- off-mesh points (after the learned position refinement) use a chunked
  brute-force closest-point-on-triangle with barycentric UV interpolation —
  fully differentiable, vectorized, no CPU round-trip.

Atlas layout matches the reference packing (dataset_one_shot.py:141-152):
right-hand UVs scaled into [0, .5] x [0, .5], left-hand shifted to
[.5, 1] x [0, .5]; model code then normalizes u by 1 and v by 0.5 into [-1, 1]
(infer_one_shot.py:238-239).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def read_obj_uv(filename: str):
    """Parse vt/ft/f from an obj (hand template). Returns (vt, ft, f) with
    0-based indices and the v axis flipped, as the reference does
    (mis_utils.py:12-32)."""
    vt, ft, f = [], [], []
    with open(filename) as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            parts = line.strip().split(" ")
            if not parts:
                continue
            if parts[0] == "vt":
                vt.append([float(a) for a in parts[1:]])
            elif parts[0] == "f":
                ft.append([int(a.split("/")[1]) for a in parts[1:] if a])
                f.append([int(a.split("/")[0]) for a in parts[1:] if a])
    vt = np.asarray(vt, np.float64)
    ft = np.asarray(ft, np.int32) - 1
    f = np.asarray(f, np.int64) - 1
    vt[:, 1] = 1.0 - vt[:, 1]
    return vt, ft, f


def vertex_uv_table(n_vertices: int, faces: np.ndarray, face_uv: np.ndarray,
                    vt: np.ndarray) -> np.ndarray:
    """Static per-vertex UV: for each mesh vertex pick the UV of (any) one of
    its face corners. (V, 2) float32. Seam vertices take the first occurrence —
    identical to sampling the UV mesh at a vertex."""
    out = np.zeros((n_vertices, 2), np.float32)
    seen = np.zeros(n_vertices, bool)
    fv = np.asarray(faces).reshape(-1)
    fuv = np.asarray(face_uv).reshape(-1)
    # first occurrence wins
    order = np.arange(fv.shape[0])[::-1]
    out[fv[order]] = vt[fuv[order]].astype(np.float32)
    seen[fv] = True
    assert seen.all(), "some vertices not referenced by any face"
    return out


def synthetic_uv_atlas(vertices: np.ndarray, right: bool = True) -> np.ndarray:
    """Fallback per-vertex UV when the MANO atlas assets are unavailable:
    planar xz projection into the hand's half of the packed atlas."""
    v = np.asarray(vertices)
    mn = v.min(0)
    ext = np.maximum(v.max(0) - mn, 1e-6)
    u = (v[:, 0] - mn[0]) / ext[0] * 0.5
    w = (v[:, 1] - mn[1]) / ext[1] * 0.5
    if not right:
        u = u + 0.5
    return np.stack([u, w], axis=1).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class UVAtlas:
    """Packed two-hand UV atlas over the (possibly subdivided) mesh."""

    vert_uv: np.ndarray   # (V, 2) per-vertex UV in the packed layout
    faces: np.ndarray     # (F, 3) mesh faces
    face_uv: np.ndarray   # (F, 3, 2) per-corner UVs

    @property
    def n_vertices(self) -> int:
        return self.vert_uv.shape[0]


def normalize_uv(uv: jax.Array) -> jax.Array:
    """Packed-atlas uv -> [-1, 1]^2 (infer_one_shot.py:238-239)."""
    u = 2.0 * uv[..., 0] - 1.0
    v = 2.0 * (uv[..., 1] / 0.5) - 1.0
    return jnp.stack([u, v], axis=-1)


def _closest_point_on_tri(p, a, b, c):
    """Ericson real-time collision closest point; all inputs (..., 3).
    Returns (closest point, barycentric (..., 3))."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    denom_in = va + vb + vc
    v_in = vb / jnp.where(denom_in != 0, denom_in, 1.0)
    w_in = vc / jnp.where(denom_in != 0, denom_in, 1.0)

    # Edge/vertex regions
    v_ab = jnp.clip(d1 / jnp.where(d1 - d3 != 0, d1 - d3, 1.0), 0.0, 1.0)
    w_ac = jnp.clip(d2 / jnp.where(d2 - d6 != 0, d2 - d6, 1.0), 0.0, 1.0)
    t_bc = jnp.clip((d4 - d3) / jnp.where((d4 - d3) + (d5 - d6) != 0,
                                          (d4 - d3) + (d5 - d6), 1.0), 0.0, 1.0)

    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (~in_a) & (~in_b) & (~in_c) & (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = (~in_a) & (~in_b) & (~in_c) & (~on_ab) & (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    on_bc = ((~in_a) & (~in_b) & (~in_c) & (~on_ab) & (~on_ac)
             & (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0))
    interior = (~in_a) & (~in_b) & (~in_c) & (~on_ab) & (~on_ac) & (~on_bc)

    u = jnp.where(in_a, 1.0, 0.0)
    v = jnp.zeros_like(d1)
    w = jnp.zeros_like(d1)
    v = jnp.where(in_b, 1.0, v)
    w = jnp.where(in_c, 1.0, w)
    v = jnp.where(on_ab, v_ab, v)
    w = jnp.where(on_ac, w_ac, w)
    v = jnp.where(on_bc, 1.0 - t_bc, v)
    w = jnp.where(on_bc, t_bc, w)
    v = jnp.where(interior, v_in, v)
    w = jnp.where(interior, w_in, w)
    u = jnp.where(in_a | in_b | in_c | on_ab | on_ac | on_bc | interior,
                  1.0 - v - w, u)
    bary = jnp.stack([u, v, w], axis=-1)
    point = (a * u[..., None] + b * v[..., None] + c * w[..., None])
    return point, bary


def get_uvd(points: jax.Array, tri_xyz: jax.Array, tri_uv: jax.Array,
            chunk: int = 1024):
    """Project points onto the mesh: returns (uv (N, 2), signed d (N,)).

    points: (N, 3); tri_xyz: (F, 3, 3) triangle vertex positions;
    tri_uv: (F, 3, 2) triangle corner UVs. Differentiable (argmin face index
    is a hard selection, as in the reference's nearest-face search).
    """
    f = tri_xyz.shape[0]
    a, b, c = tri_xyz[:, 0], tri_xyz[:, 1], tri_xyz[:, 2]
    normal = jnp.cross(b - a, c - a)
    normal = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12)

    n = points.shape[0]
    pad = (-n) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))

    def per_chunk(pc):
        # (chunk, F, 3)
        cp, bary = _closest_point_on_tri(
            pc[:, None, :], a[None], b[None], c[None])
        d2 = jnp.sum((pc[:, None, :] - cp) ** 2, axis=-1)  # (chunk, F)
        fi = jnp.argmin(d2, axis=1)  # (chunk,)
        rows = jnp.arange(pc.shape[0])
        bary_best = bary[rows, fi]  # (chunk, 3)
        uv = jnp.einsum("nk,nkd->nd", bary_best, tri_uv[fi])
        cp_best = cp[rows, fi]
        diff = pc - cp_best
        dist = jnp.linalg.norm(diff, axis=-1)
        sign = jnp.sign(jnp.sum(diff * normal[fi], axis=-1))
        return uv, dist * jnp.where(sign == 0, 1.0, sign)

    uvs, ds = jax.lax.map(per_chunk, pts.reshape(-1, chunk, 3))
    return uvs.reshape(-1, 2)[:n], ds.reshape(-1)[:n]


def project_to_faces(points, tri_xyz, chunk: int = 1024):
    """Closest-face projection: returns (face_idx (N,), bary (N, 3)).

    Used once at dataset setup to precompute static barycentric coordinates of
    subdivided rest-pose vertices w.r.t. the coarse UV mesh. Because midpoint
    subdivision is linear and LBS poses the coarse vertices, these barycentric
    coordinates are pose-invariant — the runtime UV lookup becomes a static
    gather, replacing the per-frame nearest-face search of the reference's
    get_uvd (SURVEY.md §7.1).
    """
    a, b, c = tri_xyz[:, 0], tri_xyz[:, 1], tri_xyz[:, 2]
    n = points.shape[0]
    pad = (-n) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))

    def per_chunk(pc):
        cp, bary = _closest_point_on_tri(
            pc[:, None, :], a[None], b[None], c[None])
        d2 = jnp.sum((pc[:, None, :] - cp) ** 2, axis=-1)
        fi = jnp.argmin(d2, axis=1)
        rows = jnp.arange(pc.shape[0])
        return fi, bary[rows, fi]

    fis, barys = jax.lax.map(per_chunk, pts.reshape(-1, chunk, 3))
    return (np.asarray(fis.reshape(-1)[:n]),
            np.asarray(barys.reshape(-1, 3)[:n]))


def static_vertex_uv(rest_verts_sub: np.ndarray, coarse_tri_xyz: np.ndarray,
                     coarse_tri_uv: np.ndarray) -> np.ndarray:
    """Per-subdivided-vertex UV via static barycentric projection (see
    project_to_faces). All inputs/outputs numpy; runs once at setup."""
    fi, bary = project_to_faces(jnp.asarray(rest_verts_sub, jnp.float32),
                                jnp.asarray(coarse_tri_xyz, jnp.float32))
    return np.einsum("nk,nkd->nd", bary,
                     np.asarray(coarse_tri_uv)[fi]).astype(np.float32)


def load_uv_atlas(asset_dir: Optional[str] = None) -> Optional[dict]:
    """Load the packed two-hand UV assets if available.

    Expects hand.obj (+ change_r.npy / change_l.npy / face_left.npy as in the
    reference's mano_uv/change, dataset_one_shot.py:141-152). Returns a dict
    with vt (packed), ft_r, ft_l, f, change_r, change_l — or None.
    """
    bases = [asset_dir, os.environ.get("GH_MANO_UV_PATH"), "./assets/mano_uv"]
    base = next((b for b in bases if b and os.path.exists(
        os.path.join(b, "hand.obj"))), None)
    if base is None:
        return None
    vt_r, ft_r, f = read_obj_uv(os.path.join(base, "hand.obj"))
    vt_l = vt_r.copy()
    vt_r = vt_r / 2.0
    vt_l[:, 0] = 0.5 + vt_l[:, 0] / 2.0
    vt_l[:, 1] = vt_l[:, 1] / 2.0
    vt = np.concatenate([vt_r, vt_l]).astype(np.float32)
    out = {"vt": vt, "ft_r": ft_r, "f": f}
    for name in ("change_r", "change_l", "face_left"):
        p = os.path.join(base, f"{name}.npy")
        if os.path.exists(p):
            out[name] = np.load(p, allow_pickle=True)
    return out
