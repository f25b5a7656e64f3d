"""Quaternion / covariance / rotation utilities (pure XLA, autodiff-friendly)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_quat(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    return q / jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + eps)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """(..., 4) wxyz unit quaternion -> (..., 3, 3) rotation matrix.

    Same convention as the INRIA 3DGS rasterizer (r, x, y, z)."""
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
            2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
            2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(*q.shape[:-1], 3, 3)


def build_covariance(scaling: jax.Array, quat: jax.Array) -> jax.Array:
    """3D covariance Sigma = R S S^T R^T from scales and (unnormalized) quats.

    scaling: (..., 3) positive scales. quat: (..., 4) wxyz.
    Returns (..., 3, 3).
    """
    q = normalize_quat(quat)
    R = quat_to_rotmat(q)
    M = R * scaling[..., None, :]  # R @ diag(s)
    return M @ jnp.swapaxes(M, -1, -2)


def rodrigues(rvec: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3). jit/vmap friendly."""
    theta = jnp.linalg.norm(rvec, axis=-1, keepdims=True)
    axis = rvec / jnp.maximum(theta, eps)
    kx, ky, kz = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(kx)
    K = jnp.stack(
        [zero, -kz, ky, kz, zero, -kx, -ky, kx, zero], axis=-1
    ).reshape(*rvec.shape[:-1], 3, 3)
    th = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    return eye + jnp.sin(th) * K + (1.0 - jnp.cos(th)) * (K @ K)


def world2view(R: jax.Array, t: jax.Array) -> jax.Array:
    """Build a (4,4) w2c from camera rotation R (world->cam) and translation t.

    Matches getWorld2View2 (ref renderer_one_shot.py:26-37) with zero
    translate/unit scale: rows are [R | t].
    """
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), (*R.shape[:-2], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)
