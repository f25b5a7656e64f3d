"""Camera math.

Replicates the reference camera conventions (ref: tgs/models/renderer_one_shot.py:26-112)
in functional JAX form:

- world-to-camera ``w2c`` is a (4, 4) row-major matrix applied as ``p_cam = w2c @ p_h``.
- OpenCV intrinsics ``K`` with principal point; the GL-style projection matrix is the
  K-aware variant (``getProjectionMatrix_refine``, renderer_one_shot.py:61-81).
- znear/zfar are hard-coded 0.01/1000 in the reference Camera (renderer_one_shot.py:99-100);
  we default to those but keep them as fields.

A ``Camera`` is a pytree of arrays, so it can be vmapped over views and traced
under jit (the reference builds python objects per view in a loop,
renderer_one_shot.py:494-503).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def intrinsic_to_fov(K: jax.Array, w, h):
    """FoV from intrinsics; tan(fov/2) == w / (2 fx) exactly.

    Ref: renderer_one_shot.py:83-87 (arctan2 followed by tan in the rasterizer
    settings cancels, so we carry tan_half_fov directly).
    """
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    tan_half_x = w / (2.0 * fx)
    tan_half_y = h / (2.0 * fy)
    return tan_half_x, tan_half_y


def projection_matrix_from_fov(fov_x, fov_y, znear=0.01, zfar=1000.0) -> jax.Array:
    """Symmetric-frustum GL projection from FoVs (ref: getProjectionMatrix,
    renderer_one_shot.py:39-59). The K-aware variant below is what the
    one-shot pipeline uses; this exists for API parity."""
    tan_x = jnp.tan(fov_x / 2.0)
    tan_y = jnp.tan(fov_y / 2.0)
    zero = jnp.zeros_like(tan_x)
    one = jnp.ones_like(tan_x)
    row0 = jnp.stack([1.0 / tan_x, zero, zero, zero])
    row1 = jnp.stack([zero, 1.0 / tan_y, zero, zero])
    row2 = jnp.stack([zero, zero, zfar / (zfar - znear) * one,
                      -(zfar * znear) / (zfar - znear) * one])
    row3 = jnp.stack([zero, zero, one, zero])
    return jnp.stack([row0, row1, row2, row3])


def projection_matrix_from_K(K: jax.Array, h, w, znear=0.01, zfar=1000.0) -> jax.Array:
    """GL-style projection from OpenCV K (ref: getProjectionMatrix_refine)."""
    fx = K[0, 0]
    fy = K[1, 1]
    cx = K[0, 2]
    cy = K[1, 2]
    s = K[0, 1]
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    row0 = jnp.stack([2 * fx / w, 2 * s / w, -1 + 2 * cx / w, zero])
    row1 = jnp.stack([zero, 2 * fy / h, -1 + 2 * cy / h, zero])
    row2 = jnp.stack(
        [zero, zero, (zfar + znear) / (zfar - znear) * one, -2 * zfar * znear / (zfar - znear) * one]
    )
    row3 = jnp.stack([zero, zero, one, zero])
    return jnp.stack([row0, row1, row2, row3])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Single-view camera as a pytree. All fields are arrays (possibly 0-d)."""

    w2c: jax.Array        # (4, 4) world -> camera, row-major (p_cam = w2c @ p)
    K: jax.Array          # (3, 3) or (4, 4) OpenCV intrinsics in pixels
    height: jax.Array     # 0-d int32 — static in practice (pass python ints)
    width: jax.Array

    @staticmethod
    def from_w2c(w2c, K, height, width) -> "Camera":
        return Camera(
            w2c=jnp.asarray(w2c, jnp.float32),
            K=jnp.asarray(K, jnp.float32)[..., :3, :3],
            height=jnp.asarray(height, jnp.int32),
            width=jnp.asarray(width, jnp.int32),
        )

    @property
    def fx(self):
        return self.K[..., 0, 0]

    @property
    def fy(self):
        return self.K[..., 1, 1]

    def tan_half_fov(self, w, h):
        return intrinsic_to_fov(self.K, w, h)

    def camera_center(self) -> jax.Array:
        """Camera position in world coords: -R^T t."""
        R = self.w2c[..., :3, :3]
        t = self.w2c[..., :3, 3]
        return -jnp.einsum("...ji,...j->...i", R, t)

    def full_projection(self, znear=0.01, zfar=1000.0) -> jax.Array:
        """(4,4) world -> clip matrix: proj @ w2c."""
        P = projection_matrix_from_K(self.K, self.height.astype(jnp.float32),
                                     self.width.astype(jnp.float32), znear, zfar)
        return P @ self.w2c
