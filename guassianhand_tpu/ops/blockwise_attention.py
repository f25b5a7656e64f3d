"""Exact blockwise (flash-style) attention with online softmax.

The interaction self-attention runs over an unbounded set of interacting
Gaussians (~25k-50k for two hands). The reference bounds memory by splitting
>30k sequences into 8 sequential chunks and attending within each chunk only
(renderer_one_shot.py:561-570) — an approximation. Here the computation is
EXACT at O(N * chunk) memory: queries stream over key/value blocks with
running (max, denominator, accumulator) — the standard online-softmax
recurrence, expressed as a lax.scan so XLA pipelines the (chunk x chunk)
MXU matmuls. This is also the building block the Gaussian-axis
sequence-parallel sharding composes with (SURVEY.md §5.7).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

NEG_INF = -1e30

# GH_FLASH_ATTN=1 routes through jax's Pallas TPU flash-attention kernel
# (VMEM-resident probabilities) instead of the XLA scan path. Built because
# the scan path materializes its (h, q_chunk, k_chunk) block temporaries in
# HBM (features fwd measured at 4.5 TFLOP/s — bandwidth-bound), but MEASURED
# SLOWER on v5e at the interaction workload (N=15404, h=4, d=32): 95.2 ms
# fwd+bwd vs the scan path's 30.9 ms. Two structural reasons: head_dim=32
# fills only a quarter of the 128-lane MXU/VPU width inside the kernel, and
# its backward runs separate dq and dkv kernel passes (two extra attention
# recomputes) where the scan path's remat backward shares one. Kept
# env-gated OFF for future hardware / head shapes; parity-tested in
# tests/test_attention.py.


def _use_flash() -> bool:
    return os.environ.get("GH_FLASH_ATTN", "0") == "1"


def _flash_attention_masked(q, k, v, mask, scale):
    """Pallas TPU flash attention with the same contract as the scan path:
    masked-out positions neither attend nor are attended (their output rows
    are zeroed by the caller's final mask-blend). Masking via segment ids:
    live points form segment 1; masked points and padding form segment 0,
    so live<->masked scores are excluded in-kernel. Segment-0 rows attend
    among themselves (finite garbage) and are discarded by the blend."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention)

    n, h, d = q.shape
    pad = (-n) % 512  # block-size granularity of the kernel
    np_ = n + pad

    def prep(x):
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        return x.transpose(1, 0, 2)[None]  # (1, h, np, d)

    seg = jnp.pad(mask.astype(jnp.int32), (0, pad))[None]  # (1, np)
    out = flash_attention(
        prep(q), prep(k), prep(v),
        segment_ids=SegmentIds(q=seg, kv=seg), causal=False,
        sm_scale=float(scale))
    return out[0].transpose(1, 0, 2)[:n]  # (n, h, d)


@functools.partial(jax.jit, static_argnames=("q_chunk", "k_chunk", "flash"))
def blockwise_attention(q, k, v, mask=None, q_chunk: int = 1024,
                        k_chunk: int = 1024, flash=None):
    """q, k, v: (N, H, D); mask: optional (N,) bool — masked-out positions
    neither attend nor are attended to (their output rows are zeros; callers
    blend with the residual). Returns (N, H, D).

    ``flash``: True/False forces the Pallas kernel / XLA scan path; None
    (default) follows $GH_FLASH_ATTN (read at trace time; off by default —
    the kernel measured slower at the interaction head shape, see above).
    """
    n, h, d = q.shape
    # softmax statistics, probabilities and the output accumulator are ALWAYS
    # fp32 (the carry below); only the two MXU matmuls see the operand dtype.
    # With bf16 q/k/v (the one-shot compute_dtype path) the logits and the
    # p@v products accumulate in fp32 via preferred_element_type — the
    # standard mixed-precision flash-attention recipe. For fp32 inputs
    # preferred_element_type=f32 is the existing default: bit-identical.
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))

    if _use_flash() if flash is None else flash:
        m = mask if mask is not None else jnp.ones((n,), bool)
        out = _flash_attention_masked(q, k, v, m, 1.0 / float(d) ** 0.5)
        if mask is not None:
            out = out * mask[:, None, None].astype(out.dtype)
        return out

    pad_q = (-n) % q_chunk
    pad_k = (-n) % k_chunk
    qp = jnp.pad(q, ((0, pad_q), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, pad_k), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, pad_k), (0, 0), (0, 0)))
    if mask is None:
        kmask = jnp.arange(n + pad_k) < n
        qmask_full = jnp.ones(n + pad_q, bool).at[n:].set(False)
    else:
        kmask = jnp.pad(mask, (0, pad_k))
        qmask_full = jnp.pad(mask, (0, pad_q))

    kb = kp.reshape(-1, k_chunk, h, d)
    vb = vp.reshape(-1, k_chunk, h, d)
    kmb = kmask.reshape(-1, k_chunk)

    def per_q_chunk(q_blk):
        # q_blk: (q_chunk, h, d)
        # jax.checkpoint is LOAD-BEARING for memory, not a tuning knob:
        # without it, autodiff saves every block's probability matrix p
        # (h, q_chunk, k_chunk) across both the k-scan and the q-map — i.e.
        # the FULL (N, N) attention matrix (measured: 2 x 4 GB HBM buffers
        # at N=15404, an OOM on one v5e) — exactly what online softmax
        # exists to avoid. Rematerializing s and p in the backward (the
        # flash-attention backward) keeps residuals at the O(q_chunk) carry.
        @jax.checkpoint
        def body(carry, inp):
            m_run, l_run, acc = carry
            k_blk, v_blk, km = inp
            s = jnp.einsum("qhd,khd->hqk", q_blk, k_blk,
                           preferred_element_type=jnp.float32) * scale
            s = jnp.where(km[None, None, :], s, NEG_INF)
            m_new = jnp.maximum(m_run, s.max(axis=-1))
            p = jnp.exp(s - m_new[..., None])
            corr = jnp.exp(m_run - m_new)
            l_new = l_run * corr + p.sum(axis=-1)
            acc = acc * corr[..., None] + jnp.einsum(
                "hqk,khd->hqd", p.astype(v_blk.dtype), v_blk,
                preferred_element_type=jnp.float32)
            return (m_new, l_new, acc), None

        init = (jnp.full((h, q_chunk), NEG_INF),
                jnp.zeros((h, q_chunk)),
                jnp.zeros((h, q_chunk, d)))
        (m_run, l_run, acc), _ = jax.lax.scan(body, init, (kb, vb, kmb))
        out = acc / jnp.maximum(l_run, 1e-30)[..., None]
        return out.transpose(1, 0, 2)  # (q_chunk, h, d)

    qb = qp.reshape(-1, q_chunk, h, d)
    out = jax.lax.map(per_q_chunk, qb).reshape(-1, h, d)[:n]
    if mask is not None:
        out = out * mask[:, None, None].astype(out.dtype)
    return out


def ring_blockwise_attention(q, k, v, mask, axis_name: str, n_dev: int):
    """Cross-chip EXACT attention over the Gaussian axis (ROADMAP Scaling 3;
    the sequence-parallel upgrade of the reference's 8-chunk memory hack,
    renderer_one_shot.py:561-570).

    Runs inside shard_map with the sequence sharded over ``axis_name``:
    q, k, v: (N/D, H, Dh) local shards; mask: (N/D,) bool. Queries stay local;
    key/value/mask blocks rotate around the ring via ppermute, with the
    per-step partial softmax stats merged by the online-softmax recurrence —
    collectives ride ICI, memory stays O(N/D * N/D) per step.
    """
    n_loc, h, d = q.shape
    # fp32 softmax statistics / accumulator regardless of operand dtype —
    # the same mixed-precision recipe as blockwise_attention above
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]

    def stats(kc, vc, mc):
        s = jnp.einsum("qhd,khd->hqk", q, kc,
                       preferred_element_type=jnp.float32) * scale
        s = jnp.where(mc[None, None, :], s, NEG_INF)
        m = s.max(axis=-1)                       # (h, n_loc)
        p = jnp.exp(s - m[..., None])
        l = p.sum(axis=-1)
        acc = jnp.einsum("hqk,khd->hqd", p.astype(vc.dtype), vc,
                         preferred_element_type=jnp.float32)
        return m, l, acc

    def body(_, carry):
        m_run, l_run, acc, kc, vc, mc = carry
        m_i, l_i, a_i = stats(kc, vc, mc)
        m_new = jnp.maximum(m_run, m_i)
        c1 = jnp.exp(m_run - m_new)
        c2 = jnp.exp(m_i - m_new)
        l_new = l_run * c1 + l_i * c2
        acc = acc * c1[..., None] + a_i * c2[..., None]
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        mc = jax.lax.ppermute(mc, axis_name, perm)
        return m_new, l_new, acc, kc, vc, mc

    init = (jnp.full((h, n_loc), NEG_INF), jnp.zeros((h, n_loc)),
            jnp.zeros((h, n_loc, d)), k, v, mask)
    m_run, l_run, acc, *_ = jax.lax.fori_loop(0, n_dev, body, init)
    out = (acc / jnp.maximum(l_run, 1e-30)[..., None]).transpose(1, 0, 2)
    return out * mask[:, None, None].astype(out.dtype)
