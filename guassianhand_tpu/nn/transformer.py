"""Token transformer backbone.

TPU-native counterpart of the reference ``Transformer1D``
(tgs/models/transformers.py:673-908) with the diffusers ``BasicTransformerBlock``
(:138-397) under the one-shot config (config_one_shot.yaml:61-85):

- channels-first tokens (B, C, N): GroupNorm -> proj_in -> blocks -> proj_out
  -> +residual
- each block: [self-attention, second attention (configured with a
  cross-attention dim but called with no encoder states, so it degenerates to
  self-attention — reproduced faithfully), GEGLU feed-forward], all pre-LN
- optional AdaLN-continuous modulation per block when ``modulation_dim`` is
  set (transformers.py:549-570); the one-shot config uses plain layer_norm so
  the conditioning enters through the tokenizer's point-encoder features
  instead.

Attention uses jax dot-product attention on (B, N, H, D) — XLA fuses this into
MXU-friendly batched matmuls; sequence length is 2048 triplane tokens.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

# ``dtype`` throughout is the flax compute dtype (None = today's fp32
# promotion, bit-for-bit). param_dtype stays fp32 so ported checkpoints are
# unchanged. Under bfloat16 the block residual stream runs bf16 (the LLM-
# training convention), LayerNorm/GroupNorm statistics stay fp32 (flax
# force_float32_reductions default) and the attention softmax is forced
# fp32 (force_fp32_for_softmax) — only the MXU matmuls see bf16 operands.


class GEGLU(nn.Module):
    dim_out: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype)(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # exact (erf) gelu: diffusers GEGLU uses F.gelu(approximate='none')
        # (transformers.py:468-470) — the tanh approximation drifts ~1e-3
        # against ported reference weights
        return h * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    mult: int = 4
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        h = GEGLU(dim * self.mult, dtype=self.dtype)(x)
        return nn.Dense(dim, dtype=self.dtype)(h)


class Attention(nn.Module):
    heads: int
    head_dim: int
    dtype: Optional[Any] = None
    softmax_fp32: bool = True   # force the (N, N) softmax to fp32 under a
    # bf16 compute dtype. Parity default. The fp32 probability tensor is
    # (B, H, 2048, 2048) = 134 MB at the backbone shape and the autodiff
    # backward's softmax chain streams several copies of it from HBM —
    # softmax_fp32=False halves that traffic (quality-gated like the rest
    # of the bf16 pipeline; see scripts/bench_backbone.py arms).
    attn_remat: bool = False    # jax.checkpoint around ONLY the attention
    # core (scores+softmax+AV): the backward rematerializes the probability
    # tensor instead of loading the saved copy — flash-attention-style
    # HBM/FLOP trade without a custom kernel. (Distinct from Transformer1D.
    # remat, which rematerializes WHOLE blocks and measured slower in r4.)

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype)(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype)(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype)(context)

        def split(t):
            return t.reshape(*t.shape[:-1], self.heads, self.head_dim)

        def core(q, k, v):
            if self.dtype is None:
                return nn.dot_product_attention(q, k, v)
            return nn.dot_product_attention(
                q, k, v, dtype=self.dtype,
                force_fp32_for_softmax=self.softmax_fp32)

        if self.attn_remat:
            import jax
            core = jax.checkpoint(core)
        o = core(split(q), split(k), split(v))
        o = o.reshape(*x.shape[:-1], inner)
        return nn.Dense(inner, dtype=self.dtype)(o)


class AdaLayerNormContinuous(nn.Module):
    """LayerNorm modulated by a condition vector (transformers.py:549-570)."""

    @nn.compact
    def __call__(self, x, cond):
        emb = nn.Dense(cond.shape[-1])(cond)
        emb = nn.Dense(x.shape[-1] * 2)(nn.silu(emb))
        scale, shift = jnp.split(emb, 2, axis=-1)
        h = nn.LayerNorm(use_bias=False, use_scale=False)(x)
        return h * (1.0 + scale[..., None, :]) + shift[..., None, :]


class TransformerBlock(nn.Module):
    heads: int
    head_dim: int
    modulation_dim: Optional[int] = None
    dtype: Optional[Any] = None
    softmax_fp32: bool = True
    attn_remat: bool = False

    def _norm(self, x, cond, name):
        if self.modulation_dim is not None and cond is not None:
            return AdaLayerNormContinuous(name=name)(x, cond)
        return nn.LayerNorm(name=name, dtype=self.dtype)(x)

    def _body(self, x, cond, context):
        h = self._norm(x, cond, "norm1")
        x = x + Attention(self.heads, self.head_dim, dtype=self.dtype,
                          softmax_fp32=self.softmax_fp32,
                          attn_remat=self.attn_remat,
                          name="attn1")(h)
        h = self._norm(x, cond, "norm2")
        x = x + Attention(self.heads, self.head_dim, dtype=self.dtype,
                          softmax_fp32=self.softmax_fp32,
                          attn_remat=self.attn_remat,
                          name="attn2")(h, context)
        h = self._norm(x, cond, "norm3")
        x = x + FeedForward(name="ff", dtype=self.dtype)(h)
        return x

    @nn.compact
    def __call__(self, x, cond=None, context=None):
        return self._body(x, cond, context)


class _ScanTransformerBlock(TransformerBlock):
    """lax.scan-compatible signature: (carry, (cond, context)) -> (carry, None)."""

    @nn.compact
    def __call__(self, x, xs):
        cond, context = xs
        return self._body(x, cond, context), None


class Transformer1D(nn.Module):
    num_layers: int = 10
    heads: int = 8
    head_dim: int = 64
    norm_groups: int = 32
    modulation_dim: Optional[int] = None
    dtype: Optional[Any] = None  # compute dtype for proj/blocks (params fp32)
    remat: bool = False   # gradient checkpointing per block: the counterpart
    # of the reference's enable_gradient_checkpointing /
    # snowflake/attention.py checkpointed MHA — trades FLOPs for HBM by
    # rematerializing block activations in the backward pass.
    scan: bool = False    # lax.scan over the block stack: ONE traced/compiled
    # block body instead of num_layers unrolled copies — cuts XLA compile
    # time of the full model several-fold. Params live under "blocks" with a
    # stacked leading axis; compat.torch_port.stack_transformer_blocks
    # converts an unrolled block_{i} tree (and ported reference weights) to
    # this layout. Identical math per layer.
    softmax_fp32: bool = True  # see Attention.softmax_fp32 (bf16-path knob)
    attn_remat: bool = False   # see Attention.attn_remat

    @nn.compact
    def __call__(self, tokens, modulation_cond=None, context=None):
        """tokens: (B, C, N) channels-first, as in the reference."""
        residual = tokens
        b, c, n = tokens.shape
        h = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-6)(
            tokens.transpose(0, 2, 1)
        )  # flax GroupNorm normalizes the last dim; tokens -> (B, N, C)
        inner = self.heads * self.head_dim
        h = nn.Dense(inner, dtype=self.dtype)(h)
        if self.scan:
            block_cls = _ScanTransformerBlock
            if self.remat:
                block_cls = nn.remat(block_cls, static_argnums=())
            blocks = nn.scan(
                block_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.num_layers,
                in_axes=(nn.broadcast,),
            )(self.heads, self.head_dim, self.modulation_dim,
              dtype=self.dtype, softmax_fp32=self.softmax_fp32,
              attn_remat=self.attn_remat, name="blocks")
            h, _ = blocks(h, (modulation_cond, context))
        else:
            block_cls = (nn.remat(TransformerBlock, static_argnums=())
                         if self.remat else TransformerBlock)
            for i in range(self.num_layers):
                h = block_cls(
                    self.heads, self.head_dim, self.modulation_dim,
                    dtype=self.dtype, softmax_fp32=self.softmax_fp32,
                    attn_remat=self.attn_remat,
                    name=f"block_{i}")(h, cond=modulation_cond,
                                       context=context)
        h = nn.Dense(c, dtype=self.dtype)(h)
        return h.transpose(0, 2, 1).astype(residual.dtype) + residual
