"""Sin/cos positional encoding of coordinates.

Counterpart of the reference SpatialEncoder (spatial.py:24-64): frequencies are
pi * 2^l for l in [0, L); output is [x, sin(x*f), cos(x*f)] concatenated, dim
C * (1 + 2L).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def pe_dim(channels: int, levels: int) -> int:
    return channels * (1 + 2 * levels)


def positional_encoding(x: jnp.ndarray, levels: int, scale: float = 1.0):
    """x: (..., C) -> (..., C * (1 + 2 * levels))."""
    if levels <= 0:
        return x
    freqs = jnp.asarray(scale * np.pi * (2.0 ** np.arange(levels)), x.dtype)
    y = x[..., None, :] * freqs[:, None]  # (..., L, C)
    z = jnp.concatenate([jnp.sin(y), jnp.cos(y)], axis=-1)
    z = z.reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, z], axis=-1)
