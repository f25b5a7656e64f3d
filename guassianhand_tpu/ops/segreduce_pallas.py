"""Sorted-segment reduction as a Pallas TPU kernel (windowed one-hot MXU).

Replaces the XLA lowering of ``segment_sum(..., indices_are_sorted=True)``
in the rasterizer backward's per-gaussian gradient reduction — the r5 bench
device trace's single most expensive fusion (``%fusion.9 = f32[49153,9]``,
2.15 ms/step at 512^2/49k: docs/TRACE_BENCH_STEP.md rank 3) for what is
~10 MB of reads and 1.8 MB of writes, i.e. ~70x off the HBM roofline.

Approach (TPU-first — no scatter anywhere):
  * the pair-gradient rows arrive SORTED by gaussian id (the grad_segsort
    ride-sort already guarantees this), so each C-column chunk of the table
    touches a CONTIGUOUS window of output rows starting near ``ids[c*C]``;
  * per chunk, the kernel builds a (C, W) one-hot of the window-local ids
    in VMEM only (never HBM) and reduces the chunk with ONE MXU matmul:
    ``partial = vals_chunk (R, C) @ onehot (C, W)`` — the WINDOW rides the
    128-lane axis, so none of the MXU's width is wasted on the 9 gradient
    components;
  * the full transposed (R, n_pad) output lives in VMEM across the
    sequential grid (constant block index map) and each chunk accumulates
    its partial at a dynamic 128-aligned lane offset — TPU grid steps
    execute in order, so the read-modify-write is race-free.

Exactness: the matmul runs at ``Precision.HIGHEST`` (exact fp32 via bf16x3
passes — and the one-hot factor is 0/1, exactly representable in bf16), so
each product is exactly val*1 or val*0 and the additions are a
reassociation of the same per-segment sums — the SAME fp32 equivalence
class as XLA's own unspecified scatter-add / segment_sum combining order
(RasterizeConfig.grad_segsort documents this contract; the oracle gradient
parity suite runs green on either path).

Honesty: the windowed kernel is only valid when every chunk's id span fits
its W window. The caller computes the per-chunk spans OUTSIDE the kernel
(a (num_chunks,) strided slice of the sorted ids — trivially cheap) and
``segment_reduce_sorted`` picks the kernel or the exact XLA fallback with a
``lax.cond``, so a pathological id distribution (e.g. a fit scene where
densified-capacity gaussians leave wide dead-id gaps) silently gets the
correct slow path instead of dropped gradients.

No reference counterpart: the CUDA rasterizer accumulates per-gaussian
gradients with atomicAdd (diff-gaussian-rasterization backward.cu); atomics
don't exist on the TPU vector unit, and this kernel is the roofline-honest
substitute for the XLA scatter that replaced them.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return (a + b - 1) // b


def _kernel(win_ref, ids_ref, vals_ref, out_ref, *, w: int, c: int):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    start = win_ref[step]                     # 128-aligned, clamped
    r = vals_ref.shape[0]
    ids_row = ids_ref[...]                    # (1, C) int32, sorted ascending
    local_row = ids_row - start               # window-local output lanes
    # Trash/padding columns may hold UNINITIALIZED memory (the backward
    # kernel never wrote blocks >= ck) and NaN*0 = NaN would leak through
    # the matmul — zero the VALUES of masked columns, not just the one-hot.
    # Mosaic can't reshape/broadcast i1 vectors across the sublane dim, so
    # broadcast the mask as int32 arithmetic and compare in 2D.
    valid_i32 = jnp.where((local_row >= 0) & (local_row < w), 1, 0)
    mask_rc = valid_i32 + jnp.zeros((r, ids_row.shape[1]), jnp.int32)
    vals = jnp.where(mask_rc > 0, vals_ref[...], 0.0)
    # (C, W) one-hot built in VMEM only; lanes = window-local output slots.
    # No validity mask needed here: cols spans [0, W), and an out-of-window
    # local (< 0 or >= W) can never equal any column index.
    local_col = local_row.reshape(c, 1)       # int32 reshape (32-bit, ok)
    cols = jax.lax.broadcasted_iota(jnp.int32, (c, w), 1)
    onehot = jnp.where(cols == local_col, 1.0, 0.0)
    # One MXU matmul reduces the whole chunk: (R, C) x (C, W) -> (R, W).
    # HIGHEST = exact fp32 (bf16x3); the one-hot side is bf16-exact anyway.
    partial = jax.lax.dot_general(
        vals, onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    # The output lives as (R, n_pad/128, 128): Mosaic can't dynamically
    # slice the minor (lane) dim of a VMEM vector, but a dynamic offset on
    # the second-minor block dim is the standard windowed-accumulate
    # pattern, and (R, W) -> (R, W/128, 128) is a layout no-op (each lane
    # tile becomes one block row).
    wb = w // 128
    blk = start // 128
    part3 = partial.reshape(vals_ref.shape[0], wb, 128)
    cur = out_ref[:, pl.ds(blk, wb), :]
    out_ref[:, pl.ds(blk, wb), :] = cur + part3


def _pallas_reduce(ids_sorted, vals, n: int, *, w: int, c: int,
                   interpret: bool = False):
    """ids_sorted (PP,) int32 ascending; vals (R, PP) f32. -> (n, R)."""
    r, pp = vals.shape
    pp_pad = _cdiv(pp, c) * c
    if pp_pad != pp:
        ids_sorted = jnp.pad(ids_sorted, (0, pp_pad - pp),
                             constant_values=n)  # trash id, masked in-kernel
        vals = jnp.pad(vals, ((0, 0), (0, pp_pad - pp)))
    num_chunks = pp_pad // c
    n_pad = max(_cdiv(n, 128) * 128, w)
    # Per-chunk window base: the chunk's first id, rounded down to the lane
    # tile (128) and clamped so start + W stays inside the padded output.
    first = ids_sorted[::c]                   # (num_chunks,) strided slice
    win = jnp.clip((first // 128) * 128, 0, n_pad - w).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((1, c), lambda i, win: (0, i)),
            pl.BlockSpec((r, c), lambda i, win: (0, i)),
        ],
        out_specs=pl.BlockSpec((r, n_pad // 128, 128),
                               lambda i, win: (0, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, w=w, c=c),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, n_pad // 128, 128), jnp.float32),
        interpret=interpret,
    )(win, ids_sorted[None, :], vals)
    return out.reshape(r, n_pad)[:, :n].T


def segment_reduce_sorted(ids_sorted, vals, n: int, *, window: int = 256,
                          chunk: int = 512, interpret: bool = False):
    """Per-segment sums of ``vals`` (R, PP) over sorted ``ids_sorted`` (PP,).

    Ids must be ascending; ids >= n (the trash segment) are dropped.
    Returns (n, R) f32. The kernel path requires every ``chunk``-column
    window to span < ``window`` rows after 128-lane alignment; the per-chunk
    span check runs outside and a ``lax.cond`` falls back to the exact XLA
    segment_sum when any chunk overflows, so results are always complete.
    """
    r, pp = vals.shape
    assert window % 128 == 0 and chunk % 128 == 0

    def xla_path(operands):
        ids, v = operands
        return jax.ops.segment_sum(v.T, ids, num_segments=n + 1,
                                   indices_are_sorted=True)[:n]

    def pallas_path(operands):
        ids, v = operands
        return _pallas_reduce(ids, v, n, w=window, c=chunk,
                              interpret=interpret)

    pp_pad = _cdiv(pp, chunk) * chunk
    ids_p = (jnp.pad(ids_sorted, (0, pp_pad - pp), constant_values=n)
             if pp_pad != pp else ids_sorted)
    first = ids_p[::chunk]
    last = ids_p[chunk - 1::chunk]
    # span per chunk incl. the <=127-row alignment rounding of the base
    ok = jnp.all(jnp.minimum(last, n - 1) - (first // 128) * 128 < window)
    return jax.lax.cond(ok, pallas_path, xla_path, (ids_sorted, vals))
