"""LocalPoolPointnet: point encoder with grid-pooled local features.

Counterpart of the reference module (tgs/models/pointclouds/pointnet_texture.py:11-114),
with ``torch_scatter`` scatter_max/mean replaced by XLA ``segment_max/segment_sum``
(native TPU scatter; SURVEY.md §2.6). The first two input channels are plane
coordinates in [-radius, radius]; features are pooled onto a plane_size^2 grid
and gathered back per point, 5 ResNet blocks, then scattered (mean) into the
final (C, plane_size, plane_size) feature plane.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from guassianhand_tpu.nn.mlp import ResnetBlockFC


def _coord_index(p_xy: jax.Array, plane_size: int, radius: float) -> jax.Array:
    """(B, T, 2) coords in [-radius, radius] -> (B, T) int cell index."""
    pos = jnp.clip(p_xy, -radius + 1e-6, radius - 1e-6)
    pos01 = (pos + radius) / (2.0 * radius)
    ij = (pos01 * plane_size).astype(jnp.int32)
    return ij[..., 0] + plane_size * ij[..., 1]


def _scatter_max_gather(c: jax.Array, index: jax.Array, n_cells: int):
    """Per-batch segment max then gather back: (T, C), (T,) -> (T, C)."""
    pooled = jax.ops.segment_max(c, index, num_segments=n_cells)
    pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
    return pooled[index]


def _scatter_mean(c: jax.Array, index: jax.Array, n_cells: int):
    s = jax.ops.segment_sum(c, index, num_segments=n_cells)
    cnt = jax.ops.segment_sum(jnp.ones((c.shape[0], 1), c.dtype), index,
                              num_segments=n_cells)
    return s / jnp.maximum(cnt, 1.0)


class LocalPoolPointnet(nn.Module):
    c_dim: int = 512
    hidden_dim: int = 128
    plane_size: int = 32
    n_blocks: int = 5
    radius: float = 1.0
    scatter_type: str = "max"  # pooling for the per-block local features
    dtype: Optional[Any] = None  # compute dtype for the Dense/ResNet matmuls
    # (params stay fp32); the final plane scatter-mean always accumulates in
    # fp32 — a bf16 sum over ~15k points/cell loses ~7 bits of mantissa.

    @nn.compact
    def __call__(self, p: jax.Array) -> jax.Array:
        """p: (B, T, D) with p[..., :2] the plane coords. Returns
        (B, c_dim, plane_size, plane_size)."""
        n_cells = self.plane_size ** 2
        index = _coord_index(p[..., :2], self.plane_size, self.radius)  # (B, T)

        net = nn.Dense(2 * self.hidden_dim, dtype=self.dtype)(p)
        net = ResnetBlockFC(self.hidden_dim, name="block_0",
                            dtype=self.dtype)(net)
        for i in range(1, self.n_blocks):
            if self.scatter_type == "max":
                pooled = jax.vmap(_scatter_max_gather, in_axes=(0, 0, None))(
                    net, index, n_cells)
            else:
                pooled = jax.vmap(
                    lambda cc, ii: _scatter_mean(cc, ii, n_cells)[ii]
                )(net, index)
            net = jnp.concatenate([net, pooled], axis=-1)
            net = ResnetBlockFC(self.hidden_dim, name=f"block_{i}",
                                dtype=self.dtype)(net)

        c = nn.Dense(self.c_dim, dtype=self.dtype)(net)  # (B, T, C)
        plane = jax.vmap(_scatter_mean, in_axes=(0, 0, None))(
            c.astype(jnp.float32), index, n_cells)
        plane = plane.transpose(0, 2, 1)  # (B, C, cells)
        return plane.reshape(-1, self.c_dim, self.plane_size, self.plane_size)
