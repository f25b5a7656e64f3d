"""Per-Gaussian decode heads and interaction attention.

Counterparts of:
- GSLayer (tgs/models/renderer_one_shot.py:156-214): per-key linear heads with
  the reference's exact activations and initializations (zero weights; scaling
  bias init -5 -> trunc_exp; rotation bias (1,0,0,0) -> normalize; opacity bias
  inverse_sigmoid(0.1) -> sigmoid; xyz sigmoid-bounded offset +-1.2/32*0.5;
  rgb sigmoid when use_rgb).
- vert_valid / vert_pos_refinement (tgs/models/verts_refinement.py:35-83).
- additional_features_fc (verts_refinement.py:119-131).
- SelfAttn interaction attention (tgs/models/self_attn.py:36-85).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from guassianhand_tpu.core.gaussians import Gaussians
from guassianhand_tpu.nn.mlp import MLPBlock, MLPResBlock


def inverse_sigmoid(x: float) -> float:
    return math.log(x / (1.0 - x))


def trunc_exp(x, cap: float = 15.0):
    """exp with clipped input — same saturation guard as the reference's
    trunc_exp custom autograd fn (tgs/utils/ops.py)."""
    return jnp.exp(jnp.clip(x, -cap, cap))


class GSLayer(nn.Module):
    sh_degree: int = 3
    use_rgb: bool = True
    xyz_offset: bool = True
    restrict_offset: bool = True
    clip_scaling: Optional[float] = None
    init_scaling: float = -5.0
    init_density: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, pts: jax.Array) -> Gaussians:
        """x: (N, C) hidden features; pts: (N, 3) query points."""
        zeros = nn.initializers.zeros

        def head(name, out, bias_init):
            return nn.Dense(out, kernel_init=zeros,
                            bias_init=bias_init, name=name)

        xyz = head("xyz", 3, zeros)(x)
        if self.restrict_offset:
            max_step = 1.2 / 32.0
            xyz = (nn.sigmoid(xyz) - 0.5) * max_step
        xyz = xyz + pts if self.xyz_offset else pts

        scaling = trunc_exp(head(
            "scaling", 3,
            nn.initializers.constant(self.init_scaling))(x))
        if self.clip_scaling is not None:
            scaling = jnp.clip(scaling, 0.0, self.clip_scaling)

        def quat_bias(key, shape, dtype=jnp.float32):
            return jnp.array([1.0, 0.0, 0.0, 0.0], dtype)

        rotation = head("rotation", 4, quat_bias)(x)
        rotation = rotation / jnp.maximum(
            jnp.linalg.norm(rotation, axis=-1, keepdims=True), 1e-12)

        opacity = nn.sigmoid(head(
            "opacity", 1,
            nn.initializers.constant(inverse_sigmoid(self.init_density)))(x))

        if self.use_rgb:
            shs = nn.Dense(3, name="shs")(x)  # default (non-zero) init, as ref
            shs = nn.sigmoid(shs).reshape(x.shape[0], 1, 3)
        else:
            k = (self.sh_degree + 1) ** 2
            shs = head("shs", k * 3, zeros)(x).reshape(x.shape[0], k, 3)

        return Gaussians(xyz=xyz, opacity=opacity, rotation=rotation,
                         scaling=scaling, shs=shs)


class VertValid(nn.Module):
    """Per-point validity score in (0, 1) (verts_refinement.py:61-83)."""

    @nn.compact
    def __call__(self, feats, pts):
        h = jnp.concatenate([feats, pts], axis=-1)
        h = MLPBlock(hid_dim=h.shape[-1] // 4)(h)
        return nn.sigmoid(nn.Dense(1)(h))


class VertPosRefinement(nn.Module):
    """Bounded position refinement, tanh * radius (verts_refinement.py:35-59).

    As in the reference, the base position is detached — gradients flow only
    into the offset MLP.
    """

    radius: float = 0.001

    @nn.compact
    def __call__(self, feats, pts):
        h = jnp.concatenate([feats, pts], axis=-1)
        h = MLPBlock(hid_dim=h.shape[-1] // 4)(h)
        bias = jnp.tanh(nn.Dense(3)(h)) * self.radius
        return jax.lax.stop_gradient(pts) + bias


class AdditionalFeaturesFC(nn.Module):
    out_dim: int = 51
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        return MLPBlock(hid_dim=self.out_dim, dtype=self.dtype)(x)


class IdentityCodeInfer(nn.Module):
    """Infer a 33-d identity code from point tokens
    (verts_refinement.py:133-154: fc -> LayerNorm -> flatten-fc -> sigmoid*2-1).
    Supports the codebook-attention identity mechanism whose trained artifact
    is the raw identity_code_book parameter used by the edit path
    (SURVEY.md §2.10)."""

    code_dim: int = 33
    n_token: int = 256

    @nn.compact
    def __call__(self, tokens):
        """tokens: (B, n_token, C) -> (B, code_dim) in (-1, 1)."""
        b, n, _ = tokens.shape
        assert n == self.n_token, (n, self.n_token)
        h = nn.Dense(self.code_dim)(tokens)
        h = nn.LayerNorm()(h)
        h = nn.Dense(self.code_dim)(h.reshape(b, -1))
        return nn.sigmoid(h) * 2.0 - 1.0


class SelfAttn(nn.Module):
    """Interaction self-attention over Gaussian features (self_attn.py:36-85).

    Accepts an optional boolean mask (True = participates). Unlike the
    reference — which boolean-indexes the interacting subset and, above 30k
    points, falls back to 8 sequential *local* chunks
    (renderer_one_shot.py:554-574, an approximation) — this computes the EXACT
    attention over the interacting set with static shapes via blockwise
    online-softmax attention (ops/blockwise_attention.py), so memory stays
    O(N * chunk) at any sequence length; masked rows pass through unchanged.

    ``dense=True`` switches to materialized (N, N) attention with TRUE
    attention-probability dropout after the softmax (self_attn.py:70-71
    dropout1) — the reference's exact training semantics. O(N^2) memory, so
    it is the small-N fallback; eval-mode outputs equal the blockwise path.

    ``cap``: static interaction budget (same philosophy as the rasterizer's
    pair budgets). The reference attends over the dynamically-sized
    interacting subset, so its attention cost scales with how much the
    hands actually touch; with static shapes ours is O(N^2) regardless. A
    cap gathers the first ``cap`` interacting points (original order),
    attends within that subset only — O(cap^2) — and scatters back; rows
    beyond the budget are treated as non-interacting (full pass-through)
    and the dropped count is sown as ``diagnostics/interaction_overflow``.
    EXACT whenever the interacting count fits the budget. None = off.
    """

    n_heads: int = 4
    chunk_size: int = 1024  # chunk sweep on v5e at N=15404 (fwd+bwd ms):
    # 512 -> 16.1, 1024 -> 15.0, 2048 -> 30.7, 4096 -> 66.0. The (h, qc, kc)
    # block temporaries are HBM-materialized by XLA; past ~1k^2 they spill
    # out of any cache locality and the scan goes bandwidth-bound.
    dropout: float = 0.1   # self_attn.py:52-56, active during fitting
    dense: bool = False    # materialized attention + prob dropout
    cap: Optional[int] = None  # static interaction budget (None = full N)
    dtype: Optional[Any] = None  # compute dtype for the projections and the
    # attention matmuls; softmax stats/probabilities stay fp32 either way
    # (blockwise_attention carries, and an explicit upcast on the dense path)

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True,
                 return_overflow: bool = False):
        from guassianhand_tpu.ops.blockwise_attention import blockwise_attention

        b, n, f = x.shape
        d = f // self.n_heads
        x_in = x
        overflow = jnp.zeros((), jnp.float32)  # rows dropped by the cap

        h = nn.LayerNorm(epsilon=1e-6)(x)
        q = nn.Dense(self.n_heads * d, dtype=self.dtype)(h).reshape(
            b, n, self.n_heads, d)
        k = nn.Dense(self.n_heads * d, dtype=self.dtype)(h).reshape(
            b, n, self.n_heads, d)
        v = nn.Dense(self.n_heads * d, dtype=self.dtype)(h).reshape(
            b, n, self.n_heads, d)
        mm = mask if mask is not None else jnp.ones((b, n), bool)
        if self.dense:
            att = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                             preferred_element_type=jnp.float32) / jnp.sqrt(
                jnp.float32(d))
            att = jnp.where(mm[:, None, None, :], att, -1e9)
            att = jax.nn.softmax(att, axis=-1)
            if self.dropout > 0.0:
                # dropout on the attention PROBABILITIES (self_attn.py:70-71)
                att = nn.Dropout(self.dropout)(att,
                                               deterministic=deterministic)
            o = jnp.einsum("bhqk,bkhd->bqhd", att, v)
        elif self.cap is not None and mask is not None and self.cap < n:
            c = max(128, self.cap)
            # interacting rows first, original order preserved (stable)
            order = jnp.argsort(~mm, axis=1, stable=True).astype(jnp.int32)
            idx = order[:, :c]
            bi = jnp.arange(b)[:, None]
            qs, ks, vs = q[bi, idx], k[bi, idx], v[bi, idx]
            ms = jnp.take_along_axis(mm, idx, axis=1)
            chunk = min(self.chunk_size, max(128, c))
            os_ = jax.vmap(
                lambda qq, kk, vv, m: blockwise_attention(
                    qq, kk, vv, m, q_chunk=chunk, k_chunk=chunk)
            )(qs, ks, vs, ms)
            o = jnp.zeros((b, n, self.n_heads, d), os_.dtype
                          ).at[bi, idx].set(os_)
            # rows past the budget fall back to non-interacting pass-through
            kept = jnp.zeros((b, n), bool).at[bi, idx].set(ms)
            overflow = (jnp.sum(mm) - jnp.sum(kept)).astype(jnp.float32)
            self.sow("diagnostics", "interaction_overflow", overflow)
            mask = kept
        else:
            chunk = min(self.chunk_size, max(128, n))
            o = jax.vmap(
                lambda qq, kk, vv, m: blockwise_attention(
                    qq, kk, vv, m, q_chunk=chunk, k_chunk=chunk)
            )(q, k, v, mm)
        o = nn.Dense(f, dtype=self.dtype)(o.reshape(b, n, self.n_heads * d))
        if self.dropout > 0.0:
            # the reference's dropout2 on the attention output (in blockwise
            # mode the prob-dropout does not compose with the online
            # softmax; output dropout carries the regularization there)
            o = nn.Dropout(self.dropout)(o, deterministic=deterministic)
        x = x + o
        x = MLPResBlock(hid_dim=f, dropout=self.dropout, dtype=self.dtype)(
            x, deterministic=deterministic)
        if mask is not None:
            # Non-interacting rows keep their input features, matching the
            # reference's boolean-indexed in-place update.
            x = jnp.where(mask[..., None], x, x_in)
        if return_overflow:
            return x, overflow
        return x
