"""Snowflake point-deconvolution upsampler (SPD) stack.

TPU-native counterparts of the reference's snowflake modules
(tgs/models/snowflake/): ``SkipTransformer`` (kNN-16 local vector attention
with relative-position MLP, skip_transformer.py:9-69), the ``SPD`` family —
``SPD`` (SPD.py:10-68), ``SPD_pp`` (SPD_pp.py:6-70, the flagship's variant:
global max-pool + conditioning features concatenated before the query MLP),
``SPD_crossattn`` (SPD_crossattn.py:24-32, conditioning via a cross-attention
block instead of concatenation) — and the ``SnowflakeModelSPDPP`` decoder
driver (model_spdpp_my.py:100-216) with up_factors [2, 4].

Parameter layout mirrors the reference checkpoint tree exactly (submodule
names mlp_1/mlp_2/skip_transformer/mlp_ps/ps/mlp_delta_feature/mlp_delta,
MLP_CONV's mlp.{0,2} convs -> Dense_{0,1}) so compat/torch_port.py can map
``pointcloud_generator.pointcloud_upsampling.*`` one-to-one. Kernel-1 Conv1d
-> Dense; the stride=k ConvTranspose1d point-split -> einsum over a (in, out,
k) kernel; CUDA grouping ops -> gathers over ops/knn indices. All modules are
single-sample (N, C) point-major; batch via vmap.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from guassianhand_tpu.ops.knn import knn


class MLPConv(nn.Module):
    """Reference MLP_CONV (snowflake/utils.py): kernel-1 conv stack == Dense
    stack with ReLU between (not after) layers. Dense_i maps conv mlp.{2i}."""

    channels: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for i, c in enumerate(self.channels):
            x = nn.Dense(c)(x)
            if i + 1 < len(self.channels):
                x = nn.relu(x)
        return x


class MLPRes(nn.Module):
    """Reference MLP_Res: conv_2(relu(conv_1(x))) + conv_shortcut(x)."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden, name="conv_1")(x)
        h = nn.Dense(self.out, name="conv_2")(nn.relu(h))
        s = nn.Dense(self.out, name="conv_shortcut")(x)
        return h + s


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm with running stats held as params.

    The snowflake stack is part of the frozen pretrained backbone (the
    reference freezes everything but the per-identity params during fitting,
    infer_one_shot.py:340-343), so eval-mode semantics with ported
    running_mean/var are exact. Keeping the stats in the params collection
    keeps the checkpoint port a single-tree merge.
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


class ConvBNConv(nn.Module):
    """Conv2d(k=1) -> BatchNorm -> ReLU -> Conv2d(k=1) (pos_mlp / attn_mlp)."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = FrozenBatchNorm(self.hidden, name="bn")(x)
        x = nn.relu(x)
        return nn.Dense(self.out, name="fc2")(x)


class SkipTransformer(nn.Module):
    """kNN local vector attention (skip_transformer.py:9-69).

    pos: (N, 3); key/query: (N, C). Returns (N, C).
    """

    in_channel: int = 128
    dim: int = 64
    n_knn: int = 16
    pos_hidden: int = 64
    attn_hidden_multiplier: int = 4

    @nn.compact
    def __call__(self, pos, key, query):
        value = MLPRes(self.in_channel, self.in_channel, name="mlp_v")(
            jnp.concatenate([key, query], axis=-1))
        identity = value
        k = nn.Dense(self.dim, name="conv_key")(key)
        q = nn.Dense(self.dim, name="conv_query")(query)
        v = nn.Dense(self.dim, name="conv_value")(value)

        _, idx = knn(pos, pos, self.n_knn)       # (N, K) incl. self
        qk_rel = q[:, None, :] - k[idx]          # (N, K, D)
        pos_rel = pos[:, None, :] - pos[idx]     # (N, K, 3)
        pos_emb = ConvBNConv(self.pos_hidden, self.dim, name="pos_mlp")(pos_rel)
        attn = ConvBNConv(self.dim * self.attn_hidden_multiplier, self.dim,
                          name="attn_mlp")(qk_rel + pos_emb)
        attn = jax.nn.softmax(attn, axis=1)      # over neighbors
        agg = jnp.sum(attn * (v[:, None, :] + pos_emb), axis=1)  # (N, D)
        return nn.Dense(self.in_channel, name="conv_end")(agg) + identity


class PointSplit(nn.Module):
    """ConvTranspose1d(ps_dim, 128, k=up, stride=up, bias=False): each input
    point emits up_factor children, child j = x @ kernel[:, :, j]."""

    ps_dim: int
    out: int
    up_factor: int

    @nn.compact
    def __call__(self, x):
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.ps_dim, self.out, self.up_factor))
        y = jnp.einsum("ni,iok->nko", x, w)
        return y.reshape(x.shape[0] * self.up_factor, self.out)


class SPDpp(nn.Module):
    """SPD_pp point-splitting stage (SPD_pp.py:6-70): N -> N * up_factor.

    points: (N, 3); feat_cond: (N, dim_feat) per-point conditioning;
    k_prev: (N, 128) previous stage's displacement feature or None.
    """

    dim_feat: int = 128
    up_factor: int = 2
    i: int = 0
    radius: float = 1.0
    bounding: bool = True
    global_feat: bool = True

    @nn.compact
    def __call__(self, points, feat_cond=None,
                 k_prev: Optional[jax.Array] = None):
        n = points.shape[0]
        ps_dim = 32 if self.global_feat else 64
        feat_1 = MLPConv([64, 128], name="mlp_1")(points)
        if self.global_feat:
            gmax = jnp.broadcast_to(feat_1.max(axis=0, keepdims=True),
                                    feat_1.shape)
            feat_1 = jnp.concatenate([feat_1, gmax, feat_cond], axis=-1)
        q = MLPConv([256, 128], name="mlp_2")(feat_1)
        h = SkipTransformer(in_channel=128, dim=64, name="skip_transformer")(
            points, q if k_prev is None else k_prev, q)

        feat_child = MLPConv([64, ps_dim], name="mlp_ps")(h)
        feat_child = PointSplit(ps_dim, 128, self.up_factor, name="ps")(
            feat_child)                           # (N*up, 128)
        h_up = jnp.repeat(h, self.up_factor, axis=0)
        k_curr = MLPRes(128, 128, name="mlp_delta_feature")(
            jnp.concatenate([feat_child, h_up], axis=-1))
        delta = MLPConv([64, 3], name="mlp_delta")(nn.relu(k_curr))
        if self.bounding:
            delta = jnp.tanh(delta) / (self.radius ** self.i)
        return jnp.repeat(points, self.up_factor, axis=0) + delta, k_curr


class SPD(nn.Module):
    """Plain SPD (SPD.py:10-68): like SPD_pp but conditions on a single
    global feature vector instead of per-point features."""

    dim_feat: int = 512
    up_factor: int = 2
    i: int = 0
    radius: float = 1.0
    bounding: bool = True

    @nn.compact
    def __call__(self, points, feat_global, k_prev=None):
        n = points.shape[0]
        feat_1 = MLPConv([64, 128], name="mlp_1")(points)
        gmax = jnp.broadcast_to(feat_1.max(axis=0, keepdims=True),
                                feat_1.shape)
        gcond = jnp.broadcast_to(feat_global[None, :],
                                 (n, feat_global.shape[-1]))
        feat_1 = jnp.concatenate([feat_1, gmax, gcond], axis=-1)
        q = MLPConv([256, 128], name="mlp_2")(feat_1)
        h = SkipTransformer(in_channel=128, dim=64, name="skip_transformer")(
            points, q if k_prev is None else k_prev, q)
        feat_child = MLPConv([64, 32], name="mlp_ps")(h)
        feat_child = PointSplit(32, 128, self.up_factor, name="ps")(feat_child)
        h_up = jnp.repeat(h, self.up_factor, axis=0)
        k_curr = MLPRes(128, 128, name="mlp_delta_feature")(
            jnp.concatenate([feat_child, h_up], axis=-1))
        delta = MLPConv([64, 3], name="mlp_delta")(nn.relu(k_curr))
        if self.bounding:
            delta = jnp.tanh(delta) / (self.radius ** self.i)
        return jnp.repeat(points, self.up_factor, axis=0) + delta, k_curr


class ResidualCrossAttn(nn.Module):
    """Pre-norm residual cross-attention block (snowflake/attention.py
    ResidualTransformerBlock equivalent, used by SPD_crossattn)."""

    dim: int = 128
    heads: int = 4

    @nn.compact
    def __call__(self, x, cond):
        h = nn.LayerNorm(name="norm")(x)
        hd = self.dim // self.heads
        q = nn.Dense(self.dim, name="to_q")(h).reshape(-1, self.heads, hd)
        k = nn.Dense(self.dim, name="to_k")(cond).reshape(-1, self.heads, hd)
        v = nn.Dense(self.dim, name="to_v")(cond).reshape(-1, self.heads, hd)
        a = jnp.einsum("qhd,khd->hqk", q, k) / (hd ** 0.5)
        a = jax.nn.softmax(a, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", a, v).reshape(-1, self.dim)
        x = x + nn.Dense(self.dim, name="to_out")(o)
        ff = nn.Dense(self.dim * 4, name="ff1")(nn.LayerNorm(name="norm2")(x))
        # exact (erf) gelu: the reference's snowflake attention MLP uses
        # torch nn.GELU() default (attention.py:75)
        return x + nn.Dense(self.dim, name="ff2")(nn.gelu(ff, approximate=False))


class SPDCrossAttn(nn.Module):
    """SPD_crossattn (SPD_crossattn.py:24-32): conditioning enters through a
    cross-attention block over the cond tokens instead of concatenation."""

    dim_feat: int = 128
    up_factor: int = 2
    i: int = 0
    radius: float = 1.0
    bounding: bool = True

    @nn.compact
    def __call__(self, points, cond_tokens, k_prev=None):
        feat_1 = MLPConv([64, 128], name="mlp_1")(points)
        feat_1 = ResidualCrossAttn(128, name="cross_attn")(feat_1, cond_tokens)
        q = MLPConv([256, 128], name="mlp_2")(feat_1)
        h = SkipTransformer(in_channel=128, dim=64, name="skip_transformer")(
            points, q if k_prev is None else k_prev, q)
        feat_child = MLPConv([64, 32], name="mlp_ps")(h)
        feat_child = PointSplit(32, 128, self.up_factor, name="ps")(feat_child)
        h_up = jnp.repeat(h, self.up_factor, axis=0)
        k_curr = MLPRes(128, 128, name="mlp_delta_feature")(
            jnp.concatenate([feat_child, h_up], axis=-1))
        delta = MLPConv([64, 3], name="mlp_delta")(nn.relu(k_curr))
        if self.bounding:
            delta = jnp.tanh(delta) / (self.radius ** self.i)
        return jnp.repeat(points, self.up_factor, axis=0) + delta, k_curr


class SnowflakeDecoder(nn.Module):
    """Decoder driver (model_spdpp_my.py:100-186): mlp_feat_cond compresses
    the conditioning tokens, then SPD stages upsample.

    points: (N, 3); feat_cond: (N, input_channels) per-point conditioning
    (the reference's 'image_token' mode projects DINOv2 tokens onto points
    before this call; 'pcl_token' mode nearest-upsamples point tokens).
    """

    up_factors: Sequence[int] = (2, 4)
    input_channels: int = 512
    dim_feat: int = 128
    radius: float = 1.0
    bounding: bool = True
    spd_type: str = "SPD_PP"

    @nn.compact
    def __call__(self, points, feat_cond):
        cond = MLPConv([self.dim_feat * 2, self.dim_feat],
                       name="mlp_feat_cond")(feat_cond)
        k_prev = None
        all_levels = [points]
        for i, f in enumerate(self.up_factors):
            # nearest-resample cond rows to the current point count (the
            # reference's pcl_token mode nearest-upsamples per stage)
            if cond.shape[0] != points.shape[0]:
                src = (jnp.arange(points.shape[0]) * cond.shape[0]
                       // points.shape[0])
                cond_i = cond[src]
            else:
                cond_i = cond
            if self.spd_type == "SPD_PP":
                points, k_prev = SPDpp(
                    dim_feat=self.dim_feat, up_factor=f, i=i,
                    radius=self.radius, bounding=self.bounding,
                    name=f"uppers_{i}")(points, cond_i, k_prev)
            elif self.spd_type == "SPD_crossattn":
                points, k_prev = SPDCrossAttn(
                    dim_feat=self.dim_feat, up_factor=f, i=i,
                    radius=self.radius, bounding=self.bounding,
                    name=f"uppers_{i}")(points, cond, k_prev)
            else:
                points, k_prev = SPD(
                    dim_feat=self.dim_feat, up_factor=f, i=i,
                    radius=self.radius, bounding=self.bounding,
                    name=f"uppers_{i}")(points, cond.mean(axis=0), k_prev)
            all_levels.append(points)
        return points, all_levels


class PointNetSAModuleKNN(nn.Module):
    """PointNet++ set abstraction, kNN grouping (utils.py:334-384).

    Single-sample: xyz (N, 3), feats (N, C) or None -> (new_xyz (npoint, 3),
    new_feats (npoint, mlp[-1])). Matches the reference semantics: FPS centers
    (``furthest_point_sample``), ``query_knn`` neighborhoods including self,
    grouped xyz re-centered on the sampled point (sample_and_group_knn,
    utils.py:298-332), Conv2d(1x1)+BN+ReLU chain with the LAST layer bare
    (if_bn=False, activation None, utils.py:356), max-pool over neighbors.
    ``group_all`` makes one group of every point centered at the origin
    (sample_and_group_all, utils.py:137-164).
    """

    npoint: int
    nsample: int
    mlp: Sequence[int]
    group_all: bool = False
    use_xyz: bool = True

    @nn.compact
    def __call__(self, xyz, feats=None):
        from guassianhand_tpu.ops.fps import fps_subsample

        if self.group_all:
            new_xyz = jnp.zeros((1, 3), xyz.dtype)
            grouped_xyz = xyz[None]                       # (1, N, 3)
            grouped = grouped_xyz
            if feats is not None:
                grouped = (jnp.concatenate([grouped_xyz, feats[None]], -1)
                           if self.use_xyz else feats[None])
        else:
            new_xyz = fps_subsample(xyz, self.npoint)     # (npoint, 3)
            _, idx = knn(new_xyz, xyz, self.nsample)      # (npoint, K)
            grouped_xyz = xyz[idx] - new_xyz[:, None, :]  # re-centered
            grouped = grouped_xyz
            if feats is not None:
                grouped = (jnp.concatenate([grouped_xyz, feats[idx]], -1)
                           if self.use_xyz else feats[idx])

        x = grouped
        for i, out in enumerate(self.mlp[:-1]):
            x = nn.Dense(out, name=f"conv{i}")(x)
            x = FrozenBatchNorm(out, name=f"bn{i}")(x)
            x = nn.relu(x)
        x = nn.Dense(self.mlp[-1], name=f"conv{len(self.mlp) - 1}")(x)
        return new_xyz, jnp.max(x, axis=1)                # max over neighbors


class PointNetFPModule(nn.Module):
    """PointNet++ feature propagation (utils.py:216-263).

    Single-sample: interpolates coarse features feats2 @ xyz2 (M, C2) onto
    dense positions xyz1 (N, 3) by inverse-distance-weighted 3-NN
    (three_nn/three_interpolate semantics, dist clamped at 1e-10), optionally
    concatenates the dense skip features feats1, then a Conv1d+BN+ReLU chain.
    """

    mlp: Sequence[int]
    use_points1: bool = False

    @nn.compact
    def __call__(self, xyz1, xyz2, feats1, feats2):
        d2, idx = knn(xyz1, xyz2, 3)                      # squared L2, (N, 3)
        recip = 1.0 / jnp.maximum(jnp.sqrt(d2), 1e-10)
        w = recip / jnp.sum(recip, axis=1, keepdims=True)
        interp = jnp.sum(feats2[idx] * w[..., None], axis=1)  # (N, C2)
        x = (jnp.concatenate([interp, feats1], axis=-1)
             if self.use_points1 else interp)
        for i, out in enumerate(self.mlp):
            x = nn.Dense(out, name=f"conv{i}")(x)
            x = FrozenBatchNorm(out, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x
