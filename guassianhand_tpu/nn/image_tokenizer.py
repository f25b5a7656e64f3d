"""Image tokenizer: ViT patch encoder with AdaLN modulation.

TPU-native stand-in for the reference's DINOv2 tokenizer
(tgs/models/tokenizers/image.py:12-136 + the vendored dinov2.py): a standard
ViT (patch embed + pre-LN transformer blocks) whose per-layer activations can
be modulated by a camera embedding (the Modulation injection of image.py),
implemented with the same AdaLN-continuous machinery as the backbone.

DINOv2-base geometry by default (patch 14, width 768, 12 layers). Pretrained
DINOv2 weights can be ported into this layout later for bit-parity; the
one-shot forward path never calls the image tokenizer (SURVEY.md §2.5 — it is
instantiated for checkpoint compatibility only), so the from-scratch variant
preserves the API surface.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from guassianhand_tpu.nn.transformer import Attention, FeedForward


class Modulation(nn.Module):
    """Scale/shift conditioning (transformers.py:573-593), zero-init."""

    @nn.compact
    def __call__(self, x, cond):
        emb = nn.Dense(x.shape[-1] * 2, kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros)(nn.silu(cond))
        scale, shift = jnp.split(emb, 2, axis=-1)
        return x * (1 + scale[:, None, :]) + shift[:, None, :]


class ViTBlock(nn.Module):
    heads: int
    head_dim: int

    @nn.compact
    def __call__(self, x, cond=None):
        h = nn.LayerNorm()(x)
        x = x + Attention(self.heads, self.head_dim)(h)
        if cond is not None:
            x = Modulation()(x, cond)
        h = nn.LayerNorm()(x)
        x = x + FeedForward()(h)
        return x


class ImageTokenizer(nn.Module):
    patch_size: int = 14
    width: int = 768
    layers: int = 12
    heads: int = 12

    @nn.compact
    def __call__(self, images, modulation_cond: Optional[jnp.ndarray] = None):
        """images: (B, H, W, 3) -> patch tokens (B, N_patches, width)."""
        b, h, w, _ = images.shape
        p = self.patch_size
        x = nn.Conv(self.width, kernel_size=(p, p), strides=(p, p),
                    name="patch_embed")(images)
        x = x.reshape(b, -1, self.width)
        n = x.shape[1]
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, n, self.width))
        x = x + pos
        for i in range(self.layers):
            x = ViTBlock(self.heads, self.width // self.heads,
                         name=f"block_{i}")(x, modulation_cond)
        return nn.LayerNorm(name="norm")(x)
