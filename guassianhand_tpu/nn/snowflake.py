"""Snowflake point-deconvolution upsampler (SPD) stack.

TPU-native counterparts of the reference's snowflake modules
(tgs/models/snowflake/): ``SkipTransformer`` (kNN-16 local vector attention
with relative-position MLP, skip_transformer.py:9-69), ``SPD`` point splitting
(MLP_CONV -> SkipTransformer -> feature-duplication split -> tanh-bounded
delta, SPD.py:10-68) and the ``SnowflakeModelSPDPP`` driver
(model_spdpp_my.py:100-216) with up_factors [2, 4]. 1D convs with kernel 1
become Dense layers; per-point kNN gathers replace the CUDA grouping ops.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from guassianhand_tpu.ops.knn import knn


class MLPConv(nn.Module):
    """Stack of kernel-1 convs over points == per-point Dense stack."""

    channels: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for i, c in enumerate(self.channels):
            x = nn.Dense(c)(x)
            if i + 1 < len(self.channels):
                x = nn.relu(x)
        return x


class SkipTransformer(nn.Module):
    """Local vector attention over k nearest neighbors.

    pos: (N, 3); key/query features: (N, C). Returns (N, C).
    """

    dim: int = 64
    k: int = 16

    @nn.compact
    def __call__(self, pos, key_feat, query_feat):
        c = key_feat.shape[-1]
        value = nn.Dense(c)(key_feat + query_feat)  # identity branch
        q = nn.Dense(self.dim)(query_feat)
        kf = nn.Dense(self.dim)(key_feat)

        _, idx = knn(pos, pos, self.k)          # (N, K)
        k_nbr = kf[idx]                          # (N, K, D)
        v_nbr = value[idx]                       # (N, K, C)
        rel_pos = pos[:, None, :] - pos[idx]     # (N, K, 3)
        pos_emb_attn = MLPConv([self.dim, self.dim])(rel_pos)
        pos_emb_val = MLPConv([self.dim, c])(rel_pos)

        attn = q[:, None, :] - k_nbr + pos_emb_attn  # vector attention logits
        attn = MLPConv([self.dim, c])(attn)
        attn = jax.nn.softmax(attn, axis=1)      # over neighbors
        agg = jnp.sum(attn * (v_nbr + pos_emb_val), axis=1)
        return nn.Dense(c)(agg) + value


class SPD(nn.Module):
    """One point-splitting stage: N points -> N * up_factor points."""

    up_factor: int = 2
    dim_feat: int = 128   # global feature channels
    hidden: int = 128
    bounding: bool = True
    radius: float = 1.0

    @nn.compact
    def __call__(self, points, feat_global, feat_prev: Optional[jax.Array] = None):
        """points: (N, 3); feat_global: (Cg,); feat_prev: (N, H) from the
        previous stage (or None). Returns (new_points (N*up, 3), feat (N*up, H))."""
        n = points.shape[0]
        gf = jnp.broadcast_to(feat_global[None, :], (n, feat_global.shape[0]))
        h = MLPConv([64, self.hidden])(jnp.concatenate([points, gf], axis=-1))
        kprev = h if feat_prev is None else feat_prev
        h = SkipTransformer(dim=64)(points, kprev, h)

        # split: duplicate each point's features up_factor times with a
        # learned per-child offset code (the ConvTranspose1d duplication)
        child_code = self.param(
            "child_code", nn.initializers.normal(0.02),
            (self.up_factor, self.hidden))
        h_child = (h[:, None, :] + child_code[None]).reshape(
            n * self.up_factor, self.hidden)
        pts_child = jnp.repeat(points, self.up_factor, axis=0)

        delta = MLPConv([self.hidden, 64, 3])(nn.relu(h_child))
        if self.bounding:
            delta = jnp.tanh(delta) / (self.radius ** 1)
        return pts_child + delta, h_child


class SnowflakeDecoder(nn.Module):
    """Multi-stage SPD upsampling (model_spdpp driver equivalent)."""

    up_factors: Sequence[int] = (2, 4)
    dim_feat: int = 128

    @nn.compact
    def __call__(self, points, feat_global):
        feat_prev = None
        all_levels = [points]
        for i, f in enumerate(self.up_factors):
            points, feat_prev = SPD(
                up_factor=f, dim_feat=self.dim_feat, name=f"spd_{i}")(
                    points, feat_global, feat_prev)
            all_levels.append(points)
        return points, all_levels
