"""Pallas TPU tile-composite kernels (forward + hand-written backward).

The reference's hot loop is the external CUDA tile rasterizer
(diff-gaussian-rasterization, called at tgs/models/renderer_one_shot.py:336-346).
This is its TPU-native replacement. Instead of a per-pixel sequential
front-to-back loop, compositing is expressed as an associative scan that maps
onto the MXU:

    w_i   = alpha_i * T_carry * exp(cumsum_{j<i} log(1 - alpha_j))
    color = W^T @ C            (per-tile matmuls)

The cumulative sum along the depth-sorted Gaussian axis is a triangular-matrix
matmul, so the whole tile composite is (P x G) element-wise VPU work plus a few
MXU matmuls per pair block. The only sequential state is the per-pixel
transmittance carried across a tile's blocks (and, in the backward pass, the
suffix accumulator — the TPU analog of the CUDA back-to-front replay, with
per-pair partial gradients reduced by a segmented sum instead of atomicAdd).

Grid layout: ONE grid step for the whole image. Measured on v5e, Mosaic charges
~3 us of sequencing overhead per grid step regardless of work, so both earlier
layouts (one step per pair block, then one step per tile — 1024 steps at 512^2,
twice for fwd+bwd ~= 6 ms of pure grid walk) were overhead-bound. The single
step walks every tile's (dynamic-length) slab of depth-sorted pair blocks with
a double-buffered HBM->VMEM DMA loop; the slab is CONTIGUOUS across tiles
(ops/binning.py lays tiles' block runs back to back), so the stream prefetches
across tile boundaries with no stalls. Outputs are written back with chunked
DMAs (OUT_CHUNK tiles per descriptor). Slab starts are block_size-aligned by
construction; `pl.multiple_of` alignment hints are REQUIRED for dynamic HBM
slices or Mosaic refuses to compile. No dynamic shapes anywhere.

The forward also streams out per-block transmittance checkpoints (T at each
block start, batched K_CHUNK blocks per DMA). The backward consumes them in a
single descending sweep over the flat block list — no forward replay pass —
computing per-pair gradients and DMAing them out block by block.

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

# Precision of the backward's suffix-sum matmul (P x G x G — the largest
# MXU op in the backward; the 3xG matmuls stay HIGHEST). Default: HIGHEST
# (6-pass exact fp32). GH_SUFFIX_BF16X3=1: manual 3-term bf16 split of the
# `we` operand — the triangular 0/1 mask operand is EXACT in bf16, and
# 3 x 8 mantissa bits reconstruct fp32's 24, so the 3 default-precision bf16
# dots (fp32 accumulation) reproduce the exact product to ~2^-22 relative at
# half the MXU passes. Mosaic does NOT support jax.lax.Precision.HIGH dots
# (NotImplementedError at lowering, measured 2026-08-18), so the split is
# done by hand instead of via the precision enum.
import os as _os
_SUFFIX_BF16X3 = _os.environ.get("GH_SUFFIX_BF16X3", "0") == "1"


def _dot_bf16x3(a, b_bf16):
    """a @ b via a 3-term bf16 split of fp32 ``a``; ``b_bf16`` must be exact
    in bf16 (here: a 0/1 triangular mask). fp32 accumulation on the MXU."""
    a1 = a.astype(jnp.bfloat16)
    r1 = a - a1.astype(jnp.float32)
    a2 = r1.astype(jnp.bfloat16)
    a3 = (r1 - a2.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))

    def d(x):
        return jax.lax.dot_general(x, b_bf16, dn,
                                   preferred_element_type=jnp.float32)

    return d(a1) + d(a2) + d(a3)

# GH_BWD_MOMENTS=1: compute the six per-pair gradient reductions (dopa, ddx,
# ddy, da, db, dc) from ONE (8, P) x (P, G) moment matmul over the polynomial
# basis [1, x, y, x^2, y^2, xy] in TILE-LOCAL pixel coordinates, instead of
# six separate cross-sublane VPU reductions with per-element integrands. The
# integrands are all dpower times a degree-<=2 polynomial in (dx, dy), so
# they are exact linear combinations of the basis moments; local coordinates
# (|x| <= tile_size + splat radius) keep the reconstruction well-conditioned.
# Changes only the association order of gradient sums (few-ulp class).
_BWD_MOMENTS = _os.environ.get("GH_BWD_MOMENTS", "0") == "1"

# GH_FWD_POWER_MXU=1: evaluate the per-pixel gaussian exponent `power` as ONE
# (P, 8) x (8, G) MXU matmul instead of ~10 VPU ops per (pixel, pair)
# element. The quadratic -0.5 d^T Sigma^-1 d, expanded in TILE-LOCAL pixel
# coordinates, is a degree-2 polynomial whose 6 coefficients are computed
# per pair AFTER the (tile, depth) sort (attr rows 10-15, see
# ops/rasterize._sorted_attr_table) — tile-local coords keep |terms| <= a few
# hundred, so the expansion error is ~1e-5 in power (alpha-relative 1e-5
# class, inside the forward parity tolerances). The CUDA-semantics
# `power > 0 -> skip` gate (a numeric-safety rule: true power is never
# positive) becomes min(power, 0), which bounds alpha_raw <= opacity instead
# of dropping rounding-positive center pixels.
FWD_POWER_MXU = _os.environ.get("GH_FWD_POWER_MXU", "0") == "1"


def _power_basis(tile_size: int, p: int):
    """(P, 8) polynomial basis over tile-local pixel coords, aligned to attr
    rows 8..15 = [opacity, gid, c_xx, c_yy, c_xy, c_x, c_y, c_0]."""
    pidx = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    pxl = (pidx % tile_size).astype(jnp.float32)
    pyl = (pidx // tile_size).astype(jnp.float32)
    z = jnp.zeros((p, 1), jnp.float32)
    return jnp.concatenate(
        [z, z, pxl * pxl, pyl * pyl, pxl * pyl, pxl, pyl,
         jnp.ones((p, 1), jnp.float32)], axis=1)

# attr rows: 0:x 1:y 2:conicA 3:conicB 4:conicC 5:r 6:g 7:b 8:opacity
ATTR_ROWS = 16
# grad rows: 0:dx 1:dy 2:dA 3:dB 4:dC 5:dr 6:dg 7:db 8:dopacity
GRAD_ROWS = 16

OUT_CHUNK = 8   # tiles buffered per output DMA
K_CHUNK = 8     # T-checkpoint rows buffered per DMA


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pixel_coords(t, ntx: int, tile_size: int, p: int):
    """Per-tile pixel coordinates as (P, 1) floats."""
    tx = t % ntx
    ty = t // ntx
    pidx = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (tx * tile_size + pidx % tile_size).astype(jnp.float32)
    py = (ty * tile_size + pidx // tile_size).astype(jnp.float32)
    return px, py


def _block_alpha(attr, px, py, base, cnt, g: int, lane=None, basis=None):
    """Masked alpha + helpers for one (P pixels x G pairs) block.

    Returns (alpha, alpha_raw, exp_power, dx, dy, conics) with masked slots at
    exactly alpha == 0. ``lane``: optional precomputed (1, G) lane iota
    (loop-invariant; callers hoist it out of their block loops). ``basis``:
    optional (P, 8) polynomial basis (FWD_POWER_MXU) — power comes from one
    MXU matmul against attr rows 8..15 and dx/dy are left for DCE unless a
    caller (the backward) uses them.
    """
    xg = attr[0:1, :]
    yg = attr[1:2, :]
    ca = attr[2:3, :]
    cb = attr[3:4, :]
    cc = attr[4:5, :]
    op = attr[8:9, :]

    dx = xg - px  # (P, G)
    dy = yg - py

    if lane is None:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, g), 1)
    slot = base + lane
    valid = slot < cnt
    if basis is not None:
        power = jax.lax.dot_general(
            basis, attr[8:16, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # (P, G)
        pmask = valid
        power_c = jnp.where(valid, jnp.minimum(power, 0.0), NEG_CLAMP)
    else:
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        pmask = valid & (power <= 0.0)
        power_c = jnp.where(pmask, power, NEG_CLAMP)
    exp_power = jnp.exp(power_c)
    alpha_raw = op * exp_power
    alpha = jnp.minimum(alpha_raw, ALPHA_MAX)
    alpha = jnp.where(pmask & (alpha >= ALPHA_MIN), alpha, 0.0)
    return alpha, alpha_raw, exp_power, dx, dy, (ca, cb, cc)


def _scan_masks(g: int):
    """Loop-invariant (1, G) lane masks for _prefix_products: one per scan
    step plus the final exclusive shift. Hoisted OUT of the per-block loop by
    the callers (kernel bodies build them once before their fori_loop) — the
    iota + compare per step otherwise re-runs for every pair block (~14 VPU
    ops/block of pure recomputation). Also returns the raw lane iota for
    _block_alpha's slot-validity test."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, g), 1)
    masks = []
    s = 1
    while s < g:
        masks.append(lane >= s)
        s *= 2
    return masks, lane >= 1, lane


def _prefix_products(g1, g: int, masks):
    """Exclusive/inclusive prefix products along the lane axis.

    Hillis-Steele tree scan via masked cyclic lane rolls: exact fp32 multiply
    chains, matching the oracle's cumprod to association order (a few ulps).
    The earlier exp(cumsum(log)) formulation — a triangular MXU matmul —
    drifted ~1e-3 against the oracle on TPU, whose exp/log are approximate;
    this is both exact and cheaper (log2(G) VPU ops vs a G^2 matmul).
    ``masks`` comes from _scan_masks (precomputed lane predicates)."""
    step_masks, excl_mask, _ = masks
    x = g1
    s = 1
    i = 0
    while s < g:
        x = x * jnp.where(step_masks[i], pltpu.roll(x, s, axis=1), 1.0)
        s *= 2
        i += 1
    excl = jnp.where(excl_mask, pltpu.roll(x, 1, axis=1), 1.0)
    return excl, x


def _forward_block(attr, px, py, base, cnt, tc, g: int, masks, basis=None):
    """One composite block: returns (color_contrib (3, P), t_new (P, 1),
    cpexc (P, G) — the per-pair incoming transmittance, streamed out for the
    backward so it never re-runs the prefix-product scan)."""
    alpha, _, _, _, _, _ = _block_alpha(attr, px, py, base, cnt, g,
                                        lane=masks[2], basis=basis)
    # masked slots: alpha == 0
    excl, incl = _prefix_products(1.0 - alpha, g, masks)
    cpexc = tc * excl
    cpincl = tc * incl
    accb = cpincl >= T_EPS
    acc = accb.astype(jnp.float32)
    w = alpha * cpexc * acc  # (P, G)
    cattr = attr[5:8, :]
    # precision=HIGHEST: TPU fp32 dot defaults to bf16-truncated passes
    # (~3e-3 abs error at 128-pair blocks — caught by scripts/probe_bwd_kernel).
    contrib = jax.lax.dot_general(
        cattr, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    # cpincl is non-increasing, so min over accepted == T after the last
    # accepted pair; exact because cpincl is an exact product chain.
    t_new = jnp.min(jnp.where(accb, cpincl, tc), axis=1, keepdims=True)
    return contrib, t_new, cpexc


def _fwd_kernel(boff_ref, cnt_ref, srcb_ref, attr_hbm, out_hbm, tchk_hbm,
                cpx_hbm, abuf, asem, obuf, osem, kbuf, ksem, cbuf, csem,
                *, ntx: int, tile_size: int, g: int, num_tiles: int,
                num_tiles_pad: int, store_cpx: bool):
    p = tile_size * tile_size
    c_total = boff_ref[num_tiles]

    def dma_cpx(slot, blk):
        return pltpu.make_async_copy(
            cbuf.at[slot], cpx_hbm.at[pl.ds(blk, 1)], csem.at[slot])

    def dma_attr(slot, blk):
        # Sorted-direct read: block blk's pairs live at srcb[blk] in the
        # depth-sorted pair table (NOT g-aligned). Fetch the g-aligned 2g
        # window containing them; _attr_window rolls the in-window offset
        # away. This replaces the 352k-element slab gather + attr gather
        # (measured ~5.5 ms at the 512^2 bench — XLA gathers cost ~9 ns per
        # index regardless of row width).
        start = (srcb_ref[blk] // g) * g
        return pltpu.make_async_copy(
            attr_hbm.at[:, pl.ds(pl.multiple_of(start, g), 2 * g)],
            abuf.at[slot], asem.at[slot])

    def attr_window(cur, blk):
        off = srcb_ref[blk] % g
        return pltpu.roll(abuf[cur], -off, axis=1)[:, :g]

    def dma_out(slot, chunk):
        return pltpu.make_async_copy(
            obuf.at[slot],
            out_hbm.at[pl.ds(pl.multiple_of(chunk * OUT_CHUNK, OUT_CHUNK),
                             OUT_CHUNK)],
            osem.at[slot])

    def dma_k(slot, kc):
        return pltpu.make_async_copy(
            kbuf.at[slot],
            tchk_hbm.at[pl.ds(pl.multiple_of(kc * K_CHUNK, K_CHUNK), K_CHUNK)],
            ksem.at[slot])

    @pl.when(c_total > 0)
    def _():
        dma_attr(0, 0).start()

    masks = _scan_masks(g)
    basis = _power_basis(tile_size, p) if FWD_POWER_MXU else None

    def tile_body(t, _):
        c0 = boff_ref[t]
        nb = boff_ref[t + 1] - c0
        cnt = cnt_ref[t]
        px, py = _pixel_coords(t, ntx, tile_size, p)

        def blk_body(b, carry):
            tc, acc = carry
            blk = c0 + b
            cur = blk % 2

            @pl.when(blk + 1 < c_total)
            def _():
                dma_attr((blk + 1) % 2, blk + 1).start()

            dma_attr(cur, blk).wait()

            # Checkpoint T at block start into the batched tchk stream.
            kc = blk // K_CHUNK
            kslot = kc % 2

            @pl.when((blk % K_CHUNK == 0) & (kc >= 2))
            def _():
                dma_k(kslot, kc - 2).wait()

            kbuf[kslot, pl.ds(blk % K_CHUNK, 1)] = tc.reshape(1, p)

            @pl.when(blk % K_CHUNK == K_CHUNK - 1)
            def _():
                dma_k(kslot, kc).start()

            # NOTE on early termination: wrapping the block math in
            # jax.lax.cond(max(tc) >= T_EPS, ...) was measured at +5.6 ms at
            # the 512^2 bench — Mosaic branches around vector code spill the
            # loop carries and pay for both branches; do NOT reintroduce it.
            contrib, t_new, cpexc = _forward_block(attr_window(cur, blk), px,
                                                   py, b * g, cnt, tc, g,
                                                   masks, basis=basis)
            if store_cpx:
                cslot = blk % 2

                @pl.when(blk >= 2)
                def _():
                    dma_cpx(cslot, blk - 2).wait()

                cbuf[cslot, 0] = cpexc
                dma_cpx(cslot, blk).start()
            return t_new, acc + contrib

        tc0 = jnp.ones((p, 1), jnp.float32)
        acc0 = jnp.zeros((3, p), jnp.float32)
        t_final, acc = jax.lax.fori_loop(0, nb, blk_body, (tc0, acc0))

        # Stage the finished tile into the chunked output buffer.
        oc = t // OUT_CHUNK
        oslot = oc % 2
        tpos = t % OUT_CHUNK

        @pl.when((tpos == 0) & (oc >= 2))
        def _():
            dma_out(oslot, oc - 2).wait()

        row = jnp.concatenate(
            [acc, t_final.reshape(1, p), jnp.zeros((4, p), jnp.float32)],
            axis=0)
        obuf[oslot, pl.ds(tpos, 1)] = row.reshape(1, 8, p)

        @pl.when(tpos == OUT_CHUNK - 1)
        def _():
            dma_out(oslot, oc).start()

        return 0

    jax.lax.fori_loop(0, num_tiles_pad, tile_body, 0)

    # Drain: flush a trailing partial tchk chunk, then retire in-flight DMAs.
    n_kc = pl.cdiv(c_total, K_CHUNK)

    @pl.when(c_total % K_CHUNK != 0)
    def _():
        dma_k((n_kc - 1) % 2, n_kc - 1).start()

    @pl.when(n_kc >= 1)
    def _():
        dma_k((n_kc - 1) % 2, n_kc - 1).wait()

    @pl.when(n_kc >= 2)
    def _():
        dma_k((n_kc - 2) % 2, n_kc - 2).wait()

    n_oc = num_tiles_pad // OUT_CHUNK
    dma_out((n_oc - 1) % 2, n_oc - 1).wait()

    @pl.when(n_oc >= 2)
    def _():
        dma_out((n_oc - 2) % 2, n_oc - 2).wait()

    if store_cpx:
        @pl.when(c_total >= 1)
        def _():
            dma_cpx((c_total - 1) % 2, c_total - 1).wait()

        @pl.when(c_total >= 2)
        def _():
            dma_cpx((c_total - 2) % 2, c_total - 2).wait()


def composite_forward(attr_sorted, block_off, counts, src_base, total_blocks,
                      *, num_tiles: int, ntx: int, tile_size: int,
                      block_size: int, max_blocks_per_tile: int,
                      interpret: bool = False, store_cpx: bool = False):
    """attr_sorted: (16, NMpad) fp32 pair attrs in depth-sorted order (NMpad
    g-aligned with >= 2g tail padding); block_off: (T+1,) block offsets (units
    of blocks); counts: (T+1,); src_base: (TB,) per-block start column into
    attr_sorted. Returns (out (T, 8, P), tchk (TBk, P), cpx): out rows 0-2
    color, 3 final T; tchk holds per-block start-of-block transmittance (used
    by the backward's dead-block compaction). With store_cpx, cpx is
    (TB, P, G) per-pair incoming transmittance — the backward consumes it and
    skips the prefix-product scans entirely; without it cpx is a (1, P, G)
    dummy (render-only paths pay neither the HBM nor the DMA cost).
    """
    p = tile_size * tile_size
    g = block_size
    # The dynamic-window attr DMA slices the (16, NMpad) table at g-aligned
    # columns; Mosaic requires the slice start divisible by the 128-lane
    # tiling (g=64 fails to compile: "tile index in dimension 1 is divisible
    # by the tiling (128)").
    assert g % 128 == 0, f"block_size must be a multiple of 128, got {g}"
    tb = total_blocks
    tbk = _cdiv(tb, K_CHUNK) * K_CHUNK
    t_pad = _cdiv(num_tiles, OUT_CHUNK) * OUT_CHUNK

    # Pad the scalar-prefetch arrays so virtual tail tiles read nb == 0.
    boff_pad = jnp.pad(block_off, (0, t_pad + 1 - block_off.shape[0]),
                       mode="edge")
    cnt_pad = jnp.pad(counts, (0, t_pad + 1 - counts.shape[0]))

    kernel = functools.partial(_fwd_kernel, ntx=ntx, tile_size=tile_size,
                               g=g, num_tiles=num_tiles, num_tiles_pad=t_pad,
                               store_cpx=store_cpx)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # attr stays in HBM
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # out, chunk-DMA'd
            pl.BlockSpec(memory_space=pl.ANY),  # tchk
            pl.BlockSpec(memory_space=pl.ANY),  # cpx
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ATTR_ROWS, 2 * g), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, OUT_CHUNK, 8, p), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, K_CHUNK, p), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, 1, p, g), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, tchk, cpx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, 8, p), jnp.float32),
            jax.ShapeDtypeStruct((tbk, p), jnp.float32),
            jax.ShapeDtypeStruct((tb if store_cpx else 1, p, g), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(boff_pad, cnt_pad, src_base, attr_sorted)
    return out[:num_tiles], tchk, cpx


def _bwd_kernel(boff_ref, cnt_ref, tob_ref, bob_ref, srcb_ref, cpxb_ref,
                attr_hbm, cpx_hbm, gtile_hbm, grad_hbm,
                abuf, asem, cbuf, csem, gb, gsem, obuf, osem,
                *, ntx: int, tile_size: int, g: int, num_tiles: int):
    p = tile_size * tile_size
    c_total = boff_ref[num_tiles]

    def dma_attr(slot, blk):
        # Sorted-direct window read (see _fwd_kernel.dma_attr).
        start = (srcb_ref[blk] // g) * g
        return pltpu.make_async_copy(
            attr_hbm.at[:, pl.ds(pl.multiple_of(start, g), 2 * g)],
            abuf.at[slot], asem.at[slot])

    def dma_cpx(slot, blk):
        # cpx rows are indexed by ORIGINAL (pre-compaction) block id.
        return pltpu.make_async_copy(
            cpx_hbm.at[pl.ds(cpxb_ref[blk], 1)], cbuf.at[slot], csem.at[slot])

    def dma_gt(slot, t):
        return pltpu.make_async_copy(
            gtile_hbm.at[pl.ds(t, 1)], gb.at[slot], gsem.at[slot])

    def dma_out(slot, blk):
        return pltpu.make_async_copy(
            obuf.at[slot],
            grad_hbm.at[:, pl.ds(pl.multiple_of(blk * g, g), g)],
            osem.at[slot])

    @pl.when(c_total > 0)
    def _():
        b0 = c_total - 1
        dma_attr(b0 % 2, b0).start()
        dma_cpx(b0 % 2, b0).start()
        dma_gt(0, tob_ref[b0]).start()

    # Strict upper-triangular ones: suffix[p, i] = sum_{j > i} we[p, j] as a
    # single MXU matmul (replaces a 7-step reversed Hillis-Steele lane scan —
    # each element's sum is computed independently, so no total-minus-prefix
    # cancellation).
    ut = (jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
          > jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
          ).astype(jnp.float32)
    ut_bf = ut.astype(jnp.bfloat16) if _SUFFIX_BF16X3 else None
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, g), 1)
    pbasis = _power_basis(tile_size, p) if FWD_POWER_MXU else None

    # Moment basis over tile-local pixel coords — identical for every tile,
    # so built once outside the block loop (see _BWD_MOMENTS).
    if _BWD_MOMENTS:
        pidx = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
        pxl = (pidx % tile_size).astype(jnp.float32)
        pyl = (pidx // tile_size).astype(jnp.float32)
        basis = jnp.concatenate(
            [jnp.ones((1, p), jnp.float32), pxl, pyl,
             pxl * pxl, pyl * pyl, pxl * pyl,
             jnp.zeros((2, p), jnp.float32)], axis=0)  # (8, P)

    def body(k, carry):
        r_carry, gslot_prev = carry
        b = c_total - 1 - k
        t = tob_ref[b]
        cnt = cnt_ref[t]
        base = bob_ref[b]
        new_tile = b + 1 == boff_ref[t + 1]  # first processed block of tile t
        gslot = jnp.where(new_tile, 1 - gslot_prev, gslot_prev)

        @pl.when(new_tile)
        def _():
            dma_gt(gslot, t).wait()
            # Prefetch the next (descending) tile's cotangent rows.
            c_prev = boff_ref[t]

            @pl.when(c_prev > 0)
            def _():
                dma_gt(1 - gslot, tob_ref[c_prev - 1]).start()

        cur = b % 2

        @pl.when(b >= 1)
        def _():
            dma_attr((b - 1) % 2, b - 1).start()
            dma_cpx((b - 1) % 2, b - 1).start()

        dma_attr(cur, b).wait()
        attr = pltpu.roll(abuf[cur], -(srcb_ref[b] % g), axis=1)[:, :g]
        gt = gb[gslot][0]  # (8, P): 0-2 grad color, 3 gT_total, 4 T_final
        r0 = (gt[3:4, :] * gt[4:5, :]).reshape(p, 1)
        r_in = jnp.where(new_tile, r0, r_carry)

        px, py = _pixel_coords(t, ntx, tile_size, p)
        alpha, alpha_raw, exp_power, dx, dy, (ca, cb, cc) = _block_alpha(
            attr, px, py, base, cnt, g, lane=lane, basis=pbasis)
        dma_cpx(cur, b).wait()
        # Streamed from the forward: cpexc is exact (identical product
        # chain); cpincl re-derives as cpexc*(1-alpha) — a few-ulp
        # association difference from the forward's tree product, which can
        # flip T_EPS-borderline acceptance bits (weights there are ~1e-4,
        # same class as the existing cross-exp gate-flip noise).
        cpexc = cbuf[cur][0]  # (P, G)
        cpincl = cpexc * (1.0 - alpha)
        acc = (cpincl >= T_EPS).astype(jnp.float32)
        w = alpha * cpexc * acc

        gimg = gt[0:3, :]  # (3, P)
        cattr = attr[5:8, :]
        e = jax.lax.dot_general(  # e[p, i] = sum_ch g[ch, p] c[ch, i]
            gimg, cattr, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # (P, G)
        we = w * e
        if _SUFFIX_BF16X3:
            suffix = _dot_bf16x3(we, ut_bf)  # (P, G)
        else:
            suffix = jax.lax.dot_general(
                we, ut, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # (P, G)
        r_i = suffix + r_in
        g_div = 1.0 - alpha
        live = acc * (alpha > 0.0).astype(jnp.float32)
        dalpha = (e * cpexc - r_i / g_div) * live

        dpower = dalpha * alpha_raw
        if _BWD_MOMENTS:
            # mom[k, i] = sum_p dpower[p, i] * basis_k(p) — one MXU matmul.
            mom = jax.lax.dot_general(
                basis, dpower, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # (8, G)
            n1, nx, ny = mom[0:1, :], mom[1:2, :], mom[2:3, :]
            nxx, nyy, nxy = mom[3:4, :], mom[4:5, :], mom[5:6, :]
            ox = ((t % ntx) * tile_size).astype(jnp.float32)
            oy = ((t // ntx) * tile_size).astype(jnp.float32)
            xgl = attr[0:1, :] - ox  # gaussian mean, tile-local
            ygl = attr[1:2, :] - oy
            # S_* = sum_p dpower * dx^a dy^b, expanded in basis moments
            # (dx = xgl - pxl is translation-invariant, so local == global).
            sx = xgl * n1 - nx
            sy = ygl * n1 - ny
            sxx = xgl * (xgl * n1 - 2.0 * nx) + nxx
            syy = ygl * (ygl * n1 - 2.0 * ny) + nyy
            sxy = xgl * sy - ygl * nx + nxy
            ddx = -(ca * sx + cb * sy)
            ddy = -(cc * sy + cb * sx)
            da = -0.5 * sxx
            db = -sxy
            dc = -0.5 * syy
            # dopa = sum_p exp_power*dalpha = n1/op (dpower = dalpha*op*
            # exp_power); masked slots have n1 == 0 exactly, and zero-padded
            # tail columns (op == 0) are guarded by the max.
            dopa = n1 / jnp.maximum(attr[8:9, :], 1e-12)
        else:
            dopa = jnp.sum(exp_power * dalpha * live, axis=0, keepdims=True)
            ddx = jnp.sum(dpower * -(ca * dx + cb * dy), axis=0,
                          keepdims=True)
            ddy = jnp.sum(dpower * -(cc * dy + cb * dx), axis=0,
                          keepdims=True)
            da = jnp.sum(dpower * (-0.5 * dx * dx), axis=0, keepdims=True)
            db = jnp.sum(dpower * (-dx * dy), axis=0, keepdims=True)
            dc = jnp.sum(dpower * (-0.5 * dy * dy), axis=0, keepdims=True)
        dcol = jax.lax.dot_general(
            gimg, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # (3, G)
        we_sum = jnp.sum(we, axis=1, keepdims=True)

        # Double-buffered grad write-back: before reusing a slot, retire the
        # DMA started from it two iterations ago.
        oslot = k % 2

        @pl.when(k >= 2)
        def _():
            dma_out(oslot, b + 2).wait()

        obuf[oslot, 0:1, :] = ddx
        obuf[oslot, 1:2, :] = ddy
        obuf[oslot, 2:3, :] = da
        obuf[oslot, 3:4, :] = db
        obuf[oslot, 4:5, :] = dc
        obuf[oslot, 5:8, :] = dcol
        obuf[oslot, 8:9, :] = dopa
        # Row 9 passes the pair's gaussian id (f32-exact integer, ridden
        # through the sort as attr row 9) out with the gradients, so the
        # per-gaussian segment reduction needs NO separate index gather.
        obuf[oslot, 9:10, :] = attr[9:10, :]
        obuf[oslot, 10:, :] = jnp.zeros_like(obuf[oslot, 10:, :])
        dma_out(oslot, b).start()

        return r_in + we_sum, gslot

    jax.lax.fori_loop(0, c_total, body,
                      (jnp.zeros((p, 1), jnp.float32), jnp.int32(1)))

    # Drain the in-flight grad DMAs (one per live slot).
    @pl.when(c_total > 0)
    def _():
        dma_out((c_total - 1) % 2, 0).wait()  # started at k = c_total-1

    @pl.when(c_total > 1)
    def _():
        dma_out(c_total % 2, 1).wait()  # started at k = c_total-2


def composite_backward(attr_sorted, cpx, gtiles, block_off, counts,
                       tile_of_block, base_of_block, src_base, cpx_of_block,
                       total_blocks,
                       *, num_tiles: int, ntx: int, tile_size: int,
                       block_size: int, max_blocks_per_tile: int,
                       interpret: bool = False):
    """Backward composite: single descending sweep over the flat block list.

    attr_sorted: (16, NMpad) as in forward (row 9 = gaussian id as f32).
    cpx:    (TB, P, G) per-pair incoming transmittance from the forward
            (store_cpx=True), indexed by ORIGINAL block id.
    gtiles: (T, 8, P): rows 0-2 dL/dcolor, 3 total dL/dT_final, 4 T_final.
    cpx_of_block: (TB,) original block id per (possibly compacted) block.
    Returns per-pair gradients (16, PP) in SLAB block order (block b's pairs
    at columns [b*g, (b+1)*g)); row 9 carries each pair's gaussian id.
    Columns of blocks >= block_off[num_tiles] are never written — mask with
    c_total before reducing.
    """
    p = tile_size * tile_size
    g = block_size
    pp = total_blocks * g
    boff_pad = jnp.pad(block_off, (0, max(0, num_tiles + 1 - block_off.shape[0])),
                       mode="edge")
    kernel = functools.partial(_bwd_kernel, ntx=ntx, tile_size=tile_size,
                               g=g, num_tiles=num_tiles)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # attr in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # cpx in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # gtiles in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # grads in HBM
        scratch_shapes=[
            pltpu.VMEM((2, ATTR_ROWS, 2 * g), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, 1, p, g), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, 1, 8, p), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, GRAD_ROWS, g), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    grads = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((GRAD_ROWS, pp), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(boff_pad, counts, tile_of_block, base_of_block, src_base, cpx_of_block,
      attr_sorted, cpx, gtiles)
    return grads
