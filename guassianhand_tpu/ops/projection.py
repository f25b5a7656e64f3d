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
from guassianhand_tpu.core.transforms import build_covariance

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
    fx, fy = camera.fx, camera.fy
    tan_x, tan_y = camera.tan_half_fov(W, H)
    lim_x = 1.3 * tan_x
    lim_y = 1.3 * tan_y
    txtz = jnp.clip(p_cam[:, 0] / tz_safe, -lim_x, lim_x)
    tytz = jnp.clip(p_cam[:, 1] / tz_safe, -lim_y, lim_y)
    tx = txtz * tz_safe
    ty = tytz * tz_safe

    cov3d = build_covariance(scaling * scale_modifier, rotation)  # (N, 3, 3)
    # J rows (only first two matter): [fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]
    inv_z = 1.0 / tz_safe
    inv_z2 = inv_z * inv_z
    J = jnp.zeros((n, 2, 3), xyz.dtype)
    J = J.at[:, 0, 0].set(fx * inv_z)
    J = J.at[:, 0, 2].set(-fx * tx * inv_z2)
    J = J.at[:, 1, 1].set(fy * inv_z)
    J = J.at[:, 1, 2].set(-fy * ty * inv_z2)
    JW = J @ R  # (N, 2, 3)
    cov2d = JW @ cov3d @ jnp.swapaxes(JW, -1, -2)  # (N, 2, 2)
    a = cov2d[:, 0, 0] + COV_DILATION
    b = cov2d[:, 0, 1]
    c = cov2d[:, 1, 1] + COV_DILATION

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
