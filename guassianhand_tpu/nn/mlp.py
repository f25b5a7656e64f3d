"""Basic MLP blocks (flax.linen).

Counterparts of the reference modules:
- ``MLP``: tgs/models/networks.py:57-105 (n_hidden_layers semantics identical)
- ``MLPBlock``: tgs/models/verts_refinement.py:16-32 (LayerNorm -> fc1 -> relu
  -> fc2; dropout is inference-disabled here, fitting uses tiny batches)
- ``ResnetBlockFC``: tgs/models/networks.py:162-203 (zero-init second layer)
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp


_ACT = {"relu": nn.relu, "silu": nn.silu, "gelu": nn.gelu, None: lambda x: x,
        "sigmoid": nn.sigmoid, "tanh": jnp.tanh}

# ``dtype`` on every block below is the flax compute dtype (param storage
# stays fp32 — ``param_dtype`` untouched, so checkpoints/ports are dtype-
# independent). None keeps today's fp32 promotion semantics bit-for-bit;
# the one-shot model threads bfloat16 through the frozen feature pipeline
# (OneShotConfig.compute_dtype) to run the matmuls on the MXU's bf16 path.


class MLP(nn.Module):
    dim_out: int
    n_neurons: int
    n_hidden_layers: int
    activation: str = "relu"
    output_activation: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        act = _ACT[self.activation]
        x = act(nn.Dense(self.n_neurons, dtype=self.dtype)(x))
        for _ in range(self.n_hidden_layers - 1):
            x = act(nn.Dense(self.n_neurons, dtype=self.dtype)(x))
        x = nn.Dense(self.dim_out, dtype=self.dtype)(x)
        return _ACT[self.output_activation](x)


class MLPBlock(nn.Module):
    hid_dim: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(epsilon=1e-6)(x)
        x = nn.Dense(self.hid_dim, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dense(self.hid_dim, dtype=self.dtype)(x)
        return x


class MLPResBlock(nn.Module):
    hid_dim: int
    dropout: float = 0.0   # MLP_res_block carries p=0.1 inside SelfAttn
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.LayerNorm(epsilon=1e-6)(x)
        h = nn.Dense(self.hid_dim, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype)(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + h


class ResnetBlockFC(nn.Module):
    size_out: Optional[int] = None
    size_h: Optional[int] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        size_in = x.shape[-1]
        size_out = self.size_out or size_in
        size_h = self.size_h or min(size_in, size_out)
        net = nn.Dense(size_h, dtype=self.dtype)(nn.relu(x))
        dx = nn.Dense(size_out, dtype=self.dtype,
                      kernel_init=nn.initializers.zeros)(nn.relu(net))
        if size_in == size_out:
            xs = x
        else:
            xs = nn.Dense(size_out, use_bias=False, dtype=self.dtype)(x)
        return xs + dx
