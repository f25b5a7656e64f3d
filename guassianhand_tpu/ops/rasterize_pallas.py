"""Pallas TPU tile-composite kernels (forward + hand-written backward).

The reference's hot loop is the external CUDA tile rasterizer
(diff-gaussian-rasterization, called at tgs/models/renderer_one_shot.py:336-346).
This is its TPU-native replacement. Instead of a per-pixel sequential
front-to-back loop, compositing is expressed as an associative scan that maps
onto the MXU:

    w_i   = alpha_i * T_carry * exp(cumsum_{j<i} log(1 - alpha_j))
    color = W^T @ C            (per-tile matmuls)

The cumulative sum along the depth-sorted Gaussian axis is a triangular-matrix
matmul, so the whole tile composite is (P x G) element-wise VPU work plus three
MXU matmuls per block. The only sequential state is the per-pixel transmittance
carried across blocks of the same tile (and, in the backward pass, the suffix
accumulator — the TPU analog of the CUDA back-to-front replay, with per-pair
partial gradients reduced by segment_sum instead of atomicAdd).

Grid layout: one grid step per fixed-size pair block; blocks of the same tile
are consecutive, so the output tile block stays resident in VMEM and acts as
the accumulator (standard Pallas revisiting pattern). Per-tile slab metadata is
delivered via scalar prefetch. No dynamic shapes anywhere.

Acceptance semantics replicate the CUDA kernel exactly (see ops/common.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from guassianhand_tpu.ops.common import ALPHA_MIN, ALPHA_MAX, T_EPS

NEG_CLAMP = -30.0  # exp(-30) == 0 in fp32's useful range; masks garbage slots

# attr rows: 0:x 1:y 2:conicA 3:conicB 4:conicC 5:r 6:g 7:b 8:opacity
ATTR_ROWS = 16
# grad rows: 0:dx 1:dy 2:dA 3:dB 4:dC 5:dr 6:dg 7:db 8:dopacity
GRAD_ROWS = 16


def _pixel_coords(t, ntx: int, tile_size: int, p: int):
    """Per-tile pixel coordinates as (P, 1) floats."""
    tx = t % ntx
    ty = t // ntx
    pidx = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (tx * tile_size + pidx % tile_size).astype(jnp.float32)
    py = (ty * tile_size + pidx // tile_size).astype(jnp.float32)
    return px, py


def _block_alpha(attr, px, py, base, cnt, g: int):
    """Masked alpha + helpers for one (P pixels x G pairs) block.

    Returns (alpha, alpha_raw, exp_power, dx, dy, conics) with masked slots at
    exactly alpha == 0.
    """
    xg = attr[0:1, :]
    yg = attr[1:2, :]
    ca = attr[2:3, :]
    cb = attr[3:4, :]
    cc = attr[4:5, :]
    op = attr[8:9, :]

    dx = xg - px  # (P, G)
    dy = yg - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy

    slot = base + jax.lax.broadcasted_iota(jnp.int32, (1, g), 1)
    valid = slot < cnt
    pmask = valid & (power <= 0.0)
    power_c = jnp.where(pmask, power, NEG_CLAMP)
    exp_power = jnp.exp(power_c)
    alpha_raw = op * exp_power
    alpha = jnp.minimum(alpha_raw, ALPHA_MAX)
    alpha = jnp.where(pmask & (alpha >= ALPHA_MIN), alpha, 0.0)
    return alpha, alpha_raw, exp_power, dx, dy, (ca, cb, cc)


def _tri_strict_upper(g: int):
    """M[j, i] = 1 if j < i — right-matmul gives exclusive prefix sums."""
    r = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    return (r < c).astype(jnp.float32)


def _tri_strict_lower(g: int):
    """M[j, i] = 1 if j > i — right-matmul gives exclusive suffix sums."""
    r = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    return (r > c).astype(jnp.float32)


def _fwd_kernel(tob_ref, base_ref, cnt_ref, attr_ref, out_ref, tchk_ref,
                tcarry, *, ntx: int, tile_size: int, g: int):
    p = tile_size * tile_size
    i = pl.program_id(0)
    t = tob_ref[i]
    base = base_ref[i]
    cnt = cnt_ref[t]

    @pl.when(base == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)
        tcarry[:] = jnp.ones_like(tcarry)

    # checkpoint the transmittance at block start — the backward pass reads
    # these instead of replaying the forward (single-phase backward). The
    # checkpoint array is row-grouped by 8 to satisfy Mosaic's (8, 128) block
    # tiling; this step owns row i % 8 of block i // 8.
    tchk_ref[pl.ds(i % 8, 1), :] = tcarry[:].reshape(1, p)

    @pl.when(cnt > base)  # skip empty/dummy blocks entirely
    def _compute():
        px, py = _pixel_coords(t, ntx, tile_size, p)
        attr = attr_ref[:]
        alpha, _, _, _, _, _ = _block_alpha(attr, px, py, base, cnt, g)

        glog = jnp.log(1.0 - alpha)
        cume = jax.lax.dot_general(
            glog, _tri_strict_upper(g), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        tc = tcarry[:]  # (P, 1)
        cpexc = tc * jnp.exp(cume)
        cpincl = cpexc * (1.0 - alpha)
        acc = (cpincl >= T_EPS).astype(jnp.float32)
        w = alpha * cpexc * acc  # (P, G)

        cattr = attr[5:8, :]  # (3, G)
        out_ref[0, 0:3, :] += jax.lax.dot_general(
            cattr, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        tcarry[:] = jnp.min(jnp.where(acc > 0, cpincl, tc), axis=1,
                            keepdims=True)

    @pl.when(base + g >= cnt)
    def _finalize():
        out_ref[0, 3:4, :] = tcarry[:].reshape(1, p)


def composite_forward(attr, tile_of_block, base_of_block, counts,
                      *, num_tiles: int, ntx: int, tile_size: int,
                      block_size: int, interpret: bool = False):
    """attr: (16, PP) fp32. Returns (out (T+1, 8, P), tchk (TB, P)):
    out rows 0-2 color, row 3 final T; tchk = per-block start transmittance
    checkpoints consumed by the backward pass."""
    p = tile_size * tile_size
    total_blocks = tile_of_block.shape[0]
    kernel = functools.partial(_fwd_kernel, ntx=ntx, tile_size=tile_size,
                               g=block_size)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(total_blocks,),
        in_specs=[
            pl.BlockSpec((ATTR_ROWS, block_size), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 8, p), lambda i, tob, *_: (tob[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, p), lambda i, *_: (i // 8, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((p, 1), jnp.float32)],
    )
    tchk_rows = -(-total_blocks // 8) * 8
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles + 1, 8, p), jnp.float32),
            jax.ShapeDtypeStruct((tchk_rows, p), jnp.float32),
        ),
        interpret=interpret,
    )(tile_of_block, base_of_block, counts, attr)


def _bwd_kernel(step_block, step_tile, step_base, cnt_ref,
                attr_ref, gtile_ref, tchk_ref, grad_ref, carry_r,
                *, ntx: int, tile_size: int, g: int):
    """Single-phase backward: blocks of each tile visited in REVERSE depth
    order; the per-block start transmittance comes from the forward pass's
    checkpoints (tchk input), so no replay phase is needed."""
    p = tile_size * tile_size
    i = pl.program_id(0)
    t = step_tile[i]
    base = step_base[i]
    cnt = cnt_ref[t]

    blk = step_block[i]
    gt = gtile_ref[0]  # (8, P): 0-2 grad color, 3 gT_total, 4 T_final

    @pl.when(base + g >= cnt)  # first backward step of this tile
    def _():
        carry_r[:] = (gt[3:4, :] * gt[4:5, :]).reshape(p, 1)

    grad_ref[:] = jnp.zeros_like(grad_ref)

    @pl.when(cnt > base)
    def _compute():
        px, py = _pixel_coords(t, ntx, tile_size, p)
        attr = attr_ref[:]
        alpha, alpha_raw, exp_power, dx, dy, (ca, cb, cc) = _block_alpha(
            attr, px, py, base, cnt, g)
        tstart = tchk_ref[pl.ds(blk % 8, 1), :].reshape(p, 1)
        glog = jnp.log(1.0 - alpha)
        cume = jax.lax.dot_general(
            glog, _tri_strict_upper(g), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        cpexc = tstart * jnp.exp(cume)
        cpincl = cpexc * (1.0 - alpha)
        acc = (cpincl >= T_EPS).astype(jnp.float32)
        w = alpha * cpexc * acc

        gimg = gt[0:3, :]  # (3, P)
        cattr = attr[5:8, :]
        # e[p, i] = sum_ch g[ch, p] * c[ch, i]
        e = jax.lax.dot_general(
            gimg, cattr, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (P, G)
        we = w * e
        suffix = jax.lax.dot_general(
            we, _tri_strict_lower(g), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        r_i = suffix + carry_r[:]
        g_div = 1.0 - alpha
        live = acc * (alpha > 0.0).astype(jnp.float32)
        dalpha = (e * cpexc - r_i / g_div) * live

        dpower = dalpha * alpha_raw
        dopa = jnp.sum(exp_power * dalpha * live, axis=0, keepdims=True)
        ddx = jnp.sum(dpower * -(ca * dx + cb * dy), axis=0, keepdims=True)
        ddy = jnp.sum(dpower * -(cc * dy + cb * dx), axis=0, keepdims=True)
        da = jnp.sum(dpower * (-0.5 * dx * dx), axis=0, keepdims=True)
        db = jnp.sum(dpower * (-dx * dy), axis=0, keepdims=True)
        dc = jnp.sum(dpower * (-0.5 * dy * dy), axis=0, keepdims=True)
        dcol = jax.lax.dot_general(
            gimg, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (3, G)

        grad_ref[0:1, :] = ddx
        grad_ref[1:2, :] = ddy
        grad_ref[2:3, :] = da
        grad_ref[3:4, :] = db
        grad_ref[4:5, :] = dc
        grad_ref[5:8, :] = dcol
        grad_ref[8:9, :] = dopa

        carry_r[:] = carry_r[:] + jnp.sum(we, axis=1, keepdims=True)


def composite_backward(attr, gtiles, tchk, tile_of_block, base_of_block,
                       counts, *, num_tiles: int, ntx: int, tile_size: int,
                       block_size: int, max_blocks_per_tile: int,
                       interpret: bool = False):
    """Backward composite (single phase; see _bwd_kernel).

    attr:   (16, PP) as in forward.
    gtiles: (T+1, 8, P): rows 0-2 dL/dcolor, 3 total dL/dT_final, 4 T_final.
    tchk:   (TB, P) forward transmittance checkpoints.
    Returns per-pair gradients (16, PP).
    """
    p = tile_size * tile_size
    tb = tile_of_block.shape[0]

    # Schedule: blocks of each tile in reverse order (tiles stay in order so
    # the gtile input block remains resident across a tile's steps).
    # Blocks of a tile are contiguous: find run boundaries and scatter with
    # UNIQUE indices (duplicate-index scatter-min/max serializes on TPU).
    order_fwd = jnp.arange(tb, dtype=jnp.int32)
    tob = tile_of_block
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), tob[:-1]])
    nxt = jnp.concatenate([tob[1:], jnp.full((1,), -1, jnp.int32)])
    oob = num_tiles + 2
    first_of_tile = jnp.zeros((num_tiles + 2,), jnp.int32).at[
        jnp.where(tob != prev, tob, oob)].set(order_fwd, mode="drop")
    last_of_tile = jnp.zeros((num_tiles + 2,), jnp.int32).at[
        jnp.where(tob != nxt, tob, oob)].set(order_fwd, mode="drop")
    sched_block = first_of_tile[tob] + last_of_tile[tob] - order_fwd
    sched_tile = tob[sched_block]
    sched_base = base_of_block[sched_block]

    kernel = functools.partial(_bwd_kernel, ntx=ntx, tile_size=tile_size,
                               g=block_size)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(tb,),
        in_specs=[
            pl.BlockSpec((ATTR_ROWS, block_size),
                         lambda i, sb, *_: (0, sb[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, p),
                         lambda i, sb, st, *_: (st[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, p),
                         lambda i, sb, *_: (sb[i] // 8, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (GRAD_ROWS, block_size),
            lambda i, sb, *_: (0, sb[i]),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((p, 1), jnp.float32),  # suffix carry R
        ],
    )
    grads = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((GRAD_ROWS, tb * block_size),
                                       jnp.float32),
        interpret=interpret,
    )(sched_block, sched_tile, sched_base, counts, attr, gtiles, tchk)
    return grads
