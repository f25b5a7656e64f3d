"""Triplane tokenizers and upsampler.

Counterparts of:
- TriplaneLearnablePositionalEmbedding (tgs/models/tokenizers/triplane_texture.py:12-57):
  learnable (n_plane, C, S, S) embedding + point-encoder condition, flattened
  to (B, C, n_plane*S*S) tokens; ``detokenize`` restores plane layout.
- TriplaneUpsampleNetwork (tgs/models/networks_texture.py:30-54):
  ConvTranspose k=2 s=2 per plane, C_in -> C_out.
"""
from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp


class TriplaneLearnablePositionalEmbedding(nn.Module):
    plane_size: int = 32
    num_channels: int = 512
    n_plane: int = 2

    @nn.compact
    def __call__(self, cond_embeddings=None):
        """cond_embeddings: (B, C, S, S) from the point encoder (single plane,
        broadcast over n_plane as in the reference's unsqueeze(1)).
        Returns (B, C, n_plane * S * S)."""
        emb = self.param(
            "embeddings",
            nn.initializers.normal(stddev=1.0 / math.sqrt(self.num_channels)),
            (self.n_plane, self.num_channels, self.plane_size, self.plane_size),
        )
        b = cond_embeddings.shape[0]
        x = jnp.broadcast_to(emb[None], (b, *emb.shape))
        x = x + cond_embeddings[:, None]
        return x.transpose(0, 2, 1, 3, 4).reshape(
            b, self.num_channels, self.n_plane * self.plane_size * self.plane_size)

    def detokenize(self, tokens):
        b, c, nt = tokens.shape
        s = self.plane_size
        assert nt == self.n_plane * s * s
        return tokens.reshape(b, c, self.n_plane, s, s).transpose(0, 2, 1, 3, 4)


class TriplaneUpsampler(nn.Module):
    out_channels: int = 80
    dtype: Optional[Any] = None  # compute dtype (params stay fp32)

    @nn.compact
    def __call__(self, triplanes):
        """(B, Np, C, S, S) -> (B, Np, out, 2S, 2S)."""
        b, np_, c, s, _ = triplanes.shape
        x = triplanes.reshape(b * np_, c, s, s).transpose(0, 2, 3, 1)  # NHWC
        x = nn.ConvTranspose(self.out_channels, kernel_size=(2, 2),
                             strides=(2, 2), dtype=self.dtype)(x)
        x = x.transpose(0, 3, 1, 2)
        return x.reshape(b, np_, self.out_channels, 2 * s, 2 * s)
