"""Point-cloud generator (TGS SimplePointGenerator equivalent).

Counterpart of tgs/models/pointclouds/simplepoint.py:9-117 and its satellites
(PointLearnablePositionalEmbedding, point.py:7-29; PointOutLayer,
networks.py:12-28; ImageFeature, image_feature.py:10-52). In the reference's
one-shot configuration the generator is instantiated for checkpoint
compatibility but its forward, when called, *bypasses* generation and
snowflake-upsamples the MANO points supplied in the batch
(simplepoint.py forward; SURVEY.md §2.5) — the same contract here.
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
        emb = self.param("embeddings", nn.initializers.normal(
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
        return nn.Dense(3, kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros)(x)


class ImageFeature(nn.Module):
    """Per-pixel feature assembly: RGB + upsampled tokens + mask (+ distance
    channel slot), image_feature.py:10-52. Returns (B, H, W, out_dim)."""

    out_dim: int = 773

    @nn.compact
    def __call__(self, rgb, tokens, mask):
        b, h, w, _ = rgb.shape
        n = tokens.shape[1]
        side = int(n ** 0.5)
        tok = tokens[:, : side * side].reshape(b, side, side, -1)
        tok = jax.image.resize(tok, (b, h, w, tok.shape[-1]), "bilinear")
        feat = jnp.concatenate([rgb, tok, mask[..., None]], axis=-1)
        if feat.shape[-1] < self.out_dim:
            feat = jnp.pad(feat, ((0, 0),) * 3
                           + ((0, self.out_dim - feat.shape[-1]),))
        return feat[..., : self.out_dim]


class SimplePointGenerator(nn.Module):
    """DINOv2/ViT-conditioned point-token transformer + snowflake upsampling."""

    num_pcl: int = 2048
    num_channels: int = 512
    backbone_layers: int = 10
    up_factors: tuple = (2, 4)
    camera_embed_dim: int = 768

    def setup(self):
        self.camera_embedder = MLP(dim_out=self.camera_embed_dim,
                                   n_neurons=self.camera_embed_dim,
                                   n_hidden_layers=1, activation="silu")
        self.image_tokenizer = ImageTokenizer(width=self.num_channels,
                                              layers=6, heads=8)
        self.tokenizer = PointLearnablePositionalEmbedding(
            self.num_pcl, self.num_channels)
        self.backbone = Transformer1D(num_layers=self.backbone_layers,
                                      heads=8, head_dim=64)
        self.post_processor = PointOutLayer()
        self.upsampler = SnowflakeDecoder(up_factors=self.up_factors)
        self.global_feat_fc = MLP(dim_out=128, n_neurons=256,
                                  n_hidden_layers=1, activation="relu")

    def generate(self, images, c2w_flat_K_flat):
        """Full generation path: image tokens -> point tokens -> xyz."""
        b = images.shape[0]
        cam = self.camera_embedder(c2w_flat_K_flat)
        img_tokens = self.image_tokenizer(images, modulation_cond=cam)
        tokens = self.tokenizer(b)
        tokens = self.backbone(tokens, context=img_tokens)
        pts = self.post_processor(self.tokenizer.detokenize(tokens))
        return pts, img_tokens

    def __call__(self, batch_points, images=None, cam_feats_in=None,
                 use_fps: bool = True):
        """One-shot contract: snowflake-upsample the supplied points
        (simplepoint.py's bypass). batch_points: (B, N, 3)."""
        b, n, _ = batch_points.shape

        def one(pts):
            base = fps_subsample(pts, self.num_pcl) if (use_fps and
                                                        n > self.num_pcl) else pts
            gfeat = self.global_feat_fc(
                jnp.concatenate([pts.mean(0), pts.max(0), pts.min(0)]))
            up, _ = self.upsampler(base, gfeat)
            return up

        return jax.vmap(one)(batch_points)
