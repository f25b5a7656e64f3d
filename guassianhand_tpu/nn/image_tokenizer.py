"""DINOv2 image tokenizer with AdaLN modulation.

Faithful TPU-native counterpart of the reference's DINOv2 tokenizer
(tgs/models/tokenizers/image.py:12-136 + the vendored dinov2.py:473-548):
a ViT-B/14 whose per-layer post-norm activations are modulated by a camera
embedding (Modulation after norm1 and norm2, dinov2.py:509-535), matching the
vendored Dinov2Layer exactly — layer_scale1/2, pre-LN attention, GELU MLP.

The backbone weights are NOT part of the reference's pretrain ckpt (the
pointcloud generator's tokenizer is built with freeze_backbone_params=true,
config_one_shot.yaml, so `register_non_module` excludes them from the
state_dict); they come from the HF `facebook/dinov2-base` checkpoint, which
compat.torch_port.port_dinov2_backbone maps into this layout. The 24
Modulation modules ARE in the ckpt (pointcloud_generator.image_tokenizer.
modulations.{0..23}.linear2).

Geometry: patch 14, width 768, 12 layers, 12 heads; position embeddings are
bicubically interpolated from the 224-native 16x16 grid for other input sizes
(the reference runs 252x252 -> 18x18 patches), mirroring HF
interpolate_pos_encoding.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

IMAGE_MEAN = (0.485, 0.456, 0.406)
IMAGE_STD = (0.229, 0.224, 0.225)


class Modulation(nn.Module):
    """Scale/shift conditioning (transformers.py:573-593).

    single_layer=True (the flagship config): just linear2 on silu(cond),
    zero-init so the pretrained backbone starts unmodulated.
    """

    embed_dim: int = 768

    @nn.compact
    def __call__(self, x, cond):
        emb = nn.Dense(self.embed_dim * 2, name="linear2",
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros)(nn.silu(cond))
        scale, shift = jnp.split(emb, 2, axis=-1)
        return x * (1 + scale[:, None, :]) + shift[:, None, :]


class DinoAttention(nn.Module):
    heads: int = 12

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        hd = c // self.heads
        q = nn.Dense(c, name="query")(x).reshape(b, n, self.heads, hd)
        k = nn.Dense(c, name="key")(x).reshape(b, n, self.heads, hd)
        v = nn.Dense(c, name="value")(x).reshape(b, n, self.heads, hd)
        a = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (hd ** 0.5)
        a = jax.nn.softmax(a, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(b, n, c)
        return nn.Dense(c, name="dense")(o)


class LayerScale(nn.Module):
    dim: int = 768
    init: float = 1.0

    @nn.compact
    def __call__(self, x):
        lam = self.param("lambda1",
                         nn.initializers.constant(self.init), (self.dim,))
        return x * lam


class Dinov2Layer(nn.Module):
    """Vendored Dinov2Layer semantics (dinov2.py:473-548) incl. modulation."""

    heads: int = 12
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x, cond: Optional[jax.Array] = None):
        c = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if cond is not None:
            h = Modulation(c, name="norm1_modulation")(h, cond)
        h = DinoAttention(self.heads, name="attention")(h)
        x = x + LayerScale(c, name="layer_scale1")(h)
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        if cond is not None:
            h = Modulation(c, name="norm2_modulation")(h, cond)
        h = nn.Dense(c * self.mlp_ratio, name="fc1")(h)
        h = nn.Dense(c, name="fc2")(nn.gelu(h, approximate=False))
        return x + LayerScale(c, name="layer_scale2")(h)


class ImageTokenizer(nn.Module):
    """DINOv2-base with camera modulation; returns tokens (B, 1+N, width)."""

    patch_size: int = 14
    width: int = 768
    layers: int = 12
    heads: int = 12
    native_grid: int = 16  # pos-embed grid at the 224 training size

    @nn.compact
    def __call__(self, images, modulation_cond: Optional[jnp.ndarray] = None):
        """images: (B, H, W, 3) in [0, 1]; modulation_cond: (B, Cc)."""
        b, h, w, _ = images.shape
        p = self.patch_size
        mean = jnp.asarray(IMAGE_MEAN)
        std = jnp.asarray(IMAGE_STD)
        images = (images - mean) / std

        x = nn.Conv(self.width, kernel_size=(p, p), strides=(p, p),
                    name="patch_embed")(images)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh * gw, self.width)

        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, self.width))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.width)), x], 1)

        g0 = self.native_grid
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 1 + g0 * g0, self.width))
        if (gh, gw) != (g0, g0):
            # HF interpolate_pos_encoding: bicubic resize of the patch grid.
            grid = pos[:, 1:].reshape(1, g0, g0, self.width)
            grid = jax.image.resize(grid, (1, gh, gw, self.width), "bicubic")
            pos = jnp.concatenate(
                [pos[:, :1], grid.reshape(1, gh * gw, self.width)], axis=1)
        x = x + pos

        for i in range(self.layers):
            x = Dinov2Layer(self.heads, name=f"layer_{i}")(x, modulation_cond)
        return nn.LayerNorm(epsilon=1e-6, name="layernorm")(x)
