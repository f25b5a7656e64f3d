"""Point z-buffer rasterization (PyTorch3D PointsRasterizer equivalent).

The reference uses PyTorch3D's point rasterizer to project points to pixels
and fetch image features (tgs/utils/ops.py:235-442, snowflake
model_spdpp_my.py:9-97 — instantiated but unused in the one-shot forward,
SURVEY.md §2.6). TPU-native: a segment-min depth test over pixel ids (XLA
scatter-min with unique winners), plus the inverse feature-fetch gather.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from guassianhand_tpu.core.camera import Camera


def project_points(points: jax.Array, camera: Camera):
    """(N, 3) world -> (pix_xy (N, 2) float, depth (N,), in_front (N,) bool)."""
    R = camera.w2c[:3, :3]
    t = camera.w2c[:3, 3]
    p_cam = points @ R.T + t
    z = p_cam[:, 2]
    in_front = z > 1e-6
    z_safe = jnp.where(in_front, z, 1.0)
    K = camera.K
    x = K[0, 0] * p_cam[:, 0] / z_safe + K[0, 2]
    y = K[1, 1] * p_cam[:, 1] / z_safe + K[1, 2]
    return jnp.stack([x, y], axis=1), z, in_front


def rasterize_points(points: jax.Array, camera: Camera, height: int,
                     width: int):
    """Nearest-point-per-pixel z-buffer.

    Returns (point_idx (H, W) int32 with -1 for empty, depth (H, W))."""
    xy, z, in_front = project_points(points, camera)
    xi = jnp.round(xy[:, 0]).astype(jnp.int32)
    yi = jnp.round(xy[:, 1]).astype(jnp.int32)
    ok = in_front & (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height)
    pix = jnp.where(ok, yi * width + xi, height * width)  # OOB sentinel

    inf = jnp.float32(jnp.inf)
    depth = jnp.full((height * width + 1,), inf).at[pix].min(
        jnp.where(ok, z, inf))
    # winner index: scatter idx where its depth equals the winning depth
    n = points.shape[0]
    won = ok & (z <= depth[pix] + 0.0)
    idx = jnp.full((height * width + 1,), -1, jnp.int32).at[
        jnp.where(won, pix, height * width)].max(
        jnp.arange(n, dtype=jnp.int32))
    return (idx[:-1].reshape(height, width),
            jnp.where(jnp.isinf(depth[:-1]), 0.0, depth[:-1]).reshape(
                height, width))


def fetch_image_features(points: jax.Array, camera: Camera,
                         feature_map: jax.Array):
    """Bilinear per-point feature fetch from an image-aligned map
    (points_projection equivalent). feature_map: (H, W, C) -> (N, C)."""
    h, w, c = feature_map.shape
    xy, _, in_front = project_points(points, camera)
    from guassianhand_tpu.ops.grid_sample import grid_sample_2d

    uv = jnp.stack([xy[:, 0] / (w - 1) * 2 - 1, xy[:, 1] / (h - 1) * 2 - 1],
                   axis=1)
    feats = grid_sample_2d(feature_map.transpose(2, 0, 1), uv)
    return feats * in_front[:, None]
