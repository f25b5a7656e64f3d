"""Per-Gaussian projection: world -> screen means, EWA 2D covariance, conics, radii.

Pure XLA, fully vectorized over N, autodiff-friendly. Semantics mirror the
standard 3DGS preprocess used by the reference's external CUDA rasterizer
(diff-gaussian-rasterization, called at tgs/models/renderer_one_shot.py:336-346):

- near-plane cull at z <= 0.2
- Jacobian clamp limits 1.3 * tan(fov/2)
- +0.3 px covariance dilation
- radius = ceil(3 * sqrt(max eigenvalue))
- pixel center convention: pix = (ndc + 1) * 0.5 * size - 0.5
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from guassianhand_tpu.core.camera import Camera
from guassianhand_tpu.core.transforms import normalize_quat

NEAR_CULL_Z = 0.2
COV_DILATION = 0.3


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Projected:
    """Screen-space per-Gaussian quantities (all shape (N, ...))."""

    mean2d: jax.Array   # (N, 2) pixel coords
    depth: jax.Array    # (N,) camera-space z
    conic: jax.Array    # (N, 3) inverse 2D covariance (A, B, C); power =
                        # -0.5 (A dx^2 + C dy^2) - B dx dy
    radius: jax.Array   # (N,) float, 3-sigma pixel radius (0 for culled)
    visible: jax.Array  # (N,) bool


def project_gaussians(
    xyz: jax.Array,
    scaling: jax.Array,
    rotation: jax.Array,
    camera: Camera,
    *,
    scale_modifier: float = 1.0,
    znear: float = 0.01,
    zfar: float = 1000.0,
) -> Projected:
    n = xyz.shape[0]
    w2c = camera.w2c
    R = w2c[:3, :3]
    t = w2c[:3, 3]

    p_cam = xyz @ R.T + t  # (N, 3)
    tz = p_cam[:, 2]
    in_front = tz > NEAR_CULL_Z
    tz_safe = jnp.where(in_front, tz, 1.0)

    # Screen-space mean via the K-aware projection matrix (matches the
    # reference full_proj_transform path, renderer_one_shot.py:104-106).
    full_proj = camera.full_projection(znear, zfar)
    p_hom = jnp.concatenate([xyz, jnp.ones((n, 1), xyz.dtype)], axis=1) @ full_proj.T
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    ndc = p_hom[:, :2] * p_w[:, None]
    W = camera.width.astype(xyz.dtype)
    H = camera.height.astype(xyz.dtype)
    mean2d = jnp.stack(
        [(ndc[:, 0] + 1.0) * 0.5 * W - 0.5, (ndc[:, 1] + 1.0) * 0.5 * H - 0.5], axis=1
    )

    # EWA 2D covariance: J W Sigma W^T J^T with clamped view-space x/y.
    # Written in scalar-component form — no (N, k, k) batched matmuls and no
    # .at[].set constructions, both of which autodiff into scatter/gather
    # chains that dominate the backward pass on TPU (measured 33 ms at 49k
    # Gaussians vs ~1 ms for this formulation).
    fx, fy = camera.fx, camera.fy
    tan_x, tan_y = camera.tan_half_fov(W, H)
    lim_x = 1.3 * tan_x
    lim_y = 1.3 * tan_y
    txtz = jnp.clip(p_cam[:, 0] / tz_safe, -lim_x, lim_x)
    tytz = jnp.clip(p_cam[:, 1] / tz_safe, -lim_y, lim_y)
    tx = txtz * tz_safe
    ty = tytz * tz_safe

    inv_z = 1.0 / tz_safe
    inv_z2 = inv_z * inv_z
    # JW rows (N, 3): linear combinations of the constant camera-rotation rows
    c0 = (fx * inv_z)[:, None] * R[0][None, :] \
        - (fx * tx * inv_z2)[:, None] * R[2][None, :]
    c1 = (fy * inv_z)[:, None] * R[1][None, :] \
        - (fy * ty * inv_z2)[:, None] * R[2][None, :]

    # M = R(q) diag(s): u = M^T c0, v = M^T c1; then
    # cov2d = [[u.u, u.v], [u.v, v.v]] (Sigma = M M^T never formed).
    qn = normalize_quat(rotation)
    r, x, y, z = qn[:, 0], qn[:, 1], qn[:, 2], qn[:, 3]
    s = scaling * scale_modifier
    # rotation-matrix entries (rows i, cols j)
    m00 = 1 - 2 * (y * y + z * z)
    m01 = 2 * (x * y - r * z)
    m02 = 2 * (x * z + r * y)
    m10 = 2 * (x * y + r * z)
    m11 = 1 - 2 * (x * x + z * z)
    m12 = 2 * (y * z - r * x)
    m20 = 2 * (x * z - r * y)
    m21 = 2 * (y * z + r * x)
    m22 = 1 - 2 * (x * x + y * y)

    def mt_dot(cv):
        # (M^T cv)_j = s_j * sum_i Rq[i, j] * cv_i
        u0 = s[:, 0] * (m00 * cv[:, 0] + m10 * cv[:, 1] + m20 * cv[:, 2])
        u1 = s[:, 1] * (m01 * cv[:, 0] + m11 * cv[:, 1] + m21 * cv[:, 2])
        u2 = s[:, 2] * (m02 * cv[:, 0] + m12 * cv[:, 1] + m22 * cv[:, 2])
        return u0, u1, u2

    u0, u1, u2 = mt_dot(c0)
    v0, v1, v2 = mt_dot(c1)
    a = u0 * u0 + u1 * u1 + u2 * u2 + COV_DILATION
    b = u0 * v0 + u1 * v1 + u2 * v2
    c = v0 * v0 + v1 * v1 + v2 * v2 + COV_DILATION

    det = a * c - b * b
    det_ok = det > 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=1)

    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda_max = mid + disc
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda_max, 0.0)))

    visible = in_front & det_ok & (radius > 0.0)
    radius = jnp.where(visible, radius, 0.0)
    return Projected(
        mean2d=mean2d, depth=tz, conic=conic,
        radius=jax.lax.stop_gradient(radius), visible=visible,
    )
