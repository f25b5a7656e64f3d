"""Basic MLP blocks (flax.linen).

Counterparts of the reference modules:
- ``MLP``: tgs/models/networks.py:57-105 (n_hidden_layers semantics identical)
- ``MLPBlock``: tgs/models/verts_refinement.py:16-32 (LayerNorm -> fc1 -> relu
  -> fc2; dropout is inference-disabled here, fitting uses tiny batches)
- ``ResnetBlockFC``: tgs/models/networks.py:162-203 (zero-init second layer)
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


_ACT = {"relu": nn.relu, "silu": nn.silu, "gelu": nn.gelu, None: lambda x: x,
        "sigmoid": nn.sigmoid, "tanh": jnp.tanh}


class MLP(nn.Module):
    dim_out: int
    n_neurons: int
    n_hidden_layers: int
    activation: str = "relu"
    output_activation: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        act = _ACT[self.activation]
        x = act(nn.Dense(self.n_neurons)(x))
        for _ in range(self.n_hidden_layers - 1):
            x = act(nn.Dense(self.n_neurons)(x))
        x = nn.Dense(self.dim_out)(x)
        return _ACT[self.output_activation](x)


class MLPBlock(nn.Module):
    hid_dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(epsilon=1e-6)(x)
        x = nn.Dense(self.hid_dim)(x)
        x = nn.relu(x)
        x = nn.Dense(self.hid_dim)(x)
        return x


class MLPResBlock(nn.Module):
    hid_dim: int
    dropout: float = 0.0   # MLP_res_block carries p=0.1 inside SelfAttn

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.LayerNorm(epsilon=1e-6)(x)
        h = nn.Dense(self.hid_dim)(h)
        h = nn.relu(h)
        h = nn.Dense(x.shape[-1])(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + h


class ResnetBlockFC(nn.Module):
    size_out: Optional[int] = None
    size_h: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        size_in = x.shape[-1]
        size_out = self.size_out or size_in
        size_h = self.size_h or min(size_in, size_out)
        net = nn.Dense(size_h)(nn.relu(x))
        dx = nn.Dense(size_out, kernel_init=nn.initializers.zeros)(nn.relu(net))
        if size_in == size_out:
            xs = x
        else:
            xs = nn.Dense(size_out, use_bias=False)(x)
        return xs + dx
