"""Point-cloud generator (TGS SimplePointGenerator equivalent).

Counterpart of tgs/models/pointclouds/simplepoint.py:9-117 and its satellites
(PointLearnablePositionalEmbedding, point.py:7-29; PointOutLayer,
networks.py:12-28; ImageFeature, image_feature.py:10-52; SnowflakeModelSPDPP,
snowflake/model_spdpp_my.py:100-216). In the reference's one-shot
configuration the generator is instantiated for checkpoint compatibility but
its forward, when called, *bypasses* generation and snowflake-upsamples the
MANO points supplied in the batch (simplepoint.py forward; SURVEY.md §2.5) —
the same contract here.

Submodule names mirror the reference's checkpoint tree
(pointcloud_generator.{camera_embedder,image_tokenizer,tokenizer,backbone,
post_processor,pointcloud_upsampling}) so compat/torch_port.py maps the whole
subtree one-to-one; tests/test_compat.py proves it against the full-fidelity
spec fixture.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from guassianhand_tpu.nn.image_tokenizer import ImageTokenizer
from guassianhand_tpu.nn.mlp import MLP
from guassianhand_tpu.nn.snowflake import SnowflakeDecoder
from guassianhand_tpu.nn.transformer import Transformer1D
from guassianhand_tpu.ops.fps import fps_subsample


class PointLearnablePositionalEmbedding(nn.Module):
    """2048 x 512 learned point tokens (point.py:7-29)."""

    num_pcl: int = 2048
    num_channels: int = 512

    @nn.compact
    def __call__(self, batch_size: int):
        emb = self.param("pcl_embeddings", nn.initializers.normal(
            1.0 / (self.num_channels ** 0.5)),
            (self.num_pcl, self.num_channels))
        return jnp.broadcast_to(
            emb.T[None], (batch_size, self.num_channels, self.num_pcl))

    def detokenize(self, tokens):
        return tokens.transpose(0, 2, 1)  # (B, N, C)


class PointOutLayer(nn.Module):
    """Zero-init Linear 512 -> 3 (networks.py:12-28)."""

    @nn.compact
    def __call__(self, x):
        return nn.Dense(3, name="point_layer",
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros)(x)


class ImageFeature(nn.Module):
    """Per-pixel feature assembly: RGB(3) + upsampled tokens(768) + mask(1)
    + chamfer distance-transform channel(1) = 773, the reference's exact
    layout (image_feature.py:10-52, distance channel via
    tgs/utils/ops.py:444-452). Returns (B, H, W, out_dim)."""

    out_dim: int = 773

    @nn.compact
    def __call__(self, rgb, tokens, mask):
        from guassianhand_tpu.ops.distance_transform import (
            mask_distance_channel)

        b, h, w, _ = rgb.shape
        n = tokens.shape[1]
        side = int(n ** 0.5)
        if side * side != n:
            # DINOv2 tokenizers prepend a CLS token; the reference drops it
            # before the spatial reshape (image_feature.py: feature[:, 1:]).
            tokens = tokens[:, 1:]
            side = int(tokens.shape[1] ** 0.5)
        tok = tokens[:, : side * side].reshape(b, side, side, -1)
        tok = jax.image.resize(tok, (b, h, w, tok.shape[-1]), "bilinear")
        dist = mask_distance_channel(mask)  # (B, H, W)
        feat = jnp.concatenate(
            [rgb, tok, mask[..., None], dist[..., None]], axis=-1)
        if feat.shape[-1] < self.out_dim:
            feat = jnp.pad(feat, ((0, 0),) * 3
                           + ((0, self.out_dim - feat.shape[-1]),))
        return feat[..., : self.out_dim]


class SimplePointGenerator(nn.Module):
    """DINOv2-conditioned point-token transformer + snowflake upsampling."""

    num_pcl: int = 2048
    num_channels: int = 512
    backbone_layers: int = 10
    up_factors: tuple = (2, 4)
    camera_embed_dim: int = 768
    dim_feat: int = 128

    def setup(self):
        self.camera_embedder = MLP(dim_out=self.camera_embed_dim,
                                   n_neurons=self.camera_embed_dim,
                                   n_hidden_layers=1, activation="silu")
        self.image_tokenizer = ImageTokenizer()
        self.tokenizer = PointLearnablePositionalEmbedding(
            self.num_pcl, self.num_channels)
        self.backbone = Transformer1D(num_layers=self.backbone_layers,
                                      heads=8, head_dim=64)
        self.post_processor = PointOutLayer()
        self.pointcloud_upsampling = SnowflakeDecoder(
            up_factors=self.up_factors, input_channels=self.num_channels,
            dim_feat=self.dim_feat)

    def generate(self, images, c2w_flat_K_flat, points=None,
                 use_fps: bool = True):
        """Full generation path: image tokens -> point tokens -> xyz ->
        snowflake upsampling. images: (B, H, W, 3)."""
        b = images.shape[0]
        cam = self.camera_embedder(c2w_flat_K_flat)
        img_tokens = self.image_tokenizer(images, modulation_cond=cam)
        tokens = self.tokenizer(b)
        # The reference hard-codes the backbone's cross-attention width to 512
        # (config_one_shot.yaml pointcloud_generator.backbone
        # cross_attention_dim — its own comment mislabels it as the DINO dim,
        # which is 768; the generate path is never exercised). Match the
        # checkpoint's parameter shapes by slicing the token features.
        tokens = self.backbone(tokens,
                               context=img_tokens[..., :self.num_channels])
        pts = self.post_processor(self.tokenizer.detokenize(tokens))
        if points is None:
            points = pts

        def one(p, cond):
            base = fps_subsample(p, self.num_pcl) if (
                use_fps and p.shape[0] > self.num_pcl) else p
            up, _ = self.pointcloud_upsampling(base, cond)
            return up

        # Same 512-channel hard-code as the backbone cross-attention (the
        # decoder's mlp_feat_cond is built with input_channels=512).
        return jax.vmap(one)(points,
                             img_tokens[:, 1:, :self.num_channels])

    def __call__(self, batch_points, cond_tokens=None, use_fps: bool = True):
        """One-shot contract: snowflake-upsample the supplied points
        (simplepoint.py's bypass). batch_points: (B, N, 3); cond_tokens:
        (B, Nc, num_channels) conditioning tokens (defaults to the learned
        point tokens — the reference's 'pcl_token' mode)."""
        b, n, _ = batch_points.shape
        if cond_tokens is None:
            cond_tokens = self.tokenizer.detokenize(self.tokenizer(b))

        def one(pts, cond):
            base = fps_subsample(pts, self.num_pcl) if (use_fps and
                                                        n > self.num_pcl) else pts
            up, _ = self.pointcloud_upsampling(base, cond)
            return up

        return jax.vmap(one)(batch_points, cond_tokens)
