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

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@functools.partial(jax.jit, static_argnames=("q_chunk", "k_chunk"))
def blockwise_attention(q, k, v, mask=None, q_chunk: int = 2048,
                        k_chunk: int = 2048):
    """q, k, v: (N, H, D); mask: optional (N,) bool — masked-out positions
    neither attend nor are attended to (their output rows are zeros; callers
    blend with the residual). Returns (N, H, D)."""
    n, h, d = q.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, q.dtype))

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
            s = jnp.einsum("qhd,khd->hqk", q_blk, k_blk) * scale
            s = jnp.where(km[None, None, :], s, NEG_INF)
            m_new = jnp.maximum(m_run, s.max(axis=-1))
            p = jnp.exp(s - m_new[..., None])
            corr = jnp.exp(m_run - m_new)
            l_new = l_run * corr + p.sum(axis=-1)
            acc = acc * corr[..., None] + jnp.einsum("hqk,khd->hqd", p, v_blk)
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
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, q.dtype))
    perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]

    def stats(kc, vc, mc):
        s = jnp.einsum("qhd,khd->hqk", q, kc) * scale
        s = jnp.where(mc[None, None, :], s, NEG_INF)
        m = s.max(axis=-1)                       # (h, n_loc)
        p = jnp.exp(s - m[..., None])
        l = p.sum(axis=-1)
        acc = jnp.einsum("hqk,khd->hqd", p, vc)
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
