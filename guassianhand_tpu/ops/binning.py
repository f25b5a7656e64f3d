"""Tile binning: build depth-sorted per-tile Gaussian lists under static shapes.

TPU-native replacement for the CUDA rasterizer's (tile, depth) radix sort +
per-tile ranges (the reference's external diff-gaussian-rasterization binning,
see SURVEY.md §3.5). Everything here is index computation — gradients never
flow through it.

Design (all shapes static, scatter-free — XLA scatter serializes on TPU, so
the slab layout is produced by *gathers* from the sorted pair array):

  1. every Gaussian enumerates up to ``max_tiles_per_gaussian`` (tile, depth)
     pairs covering its 3-sigma rect (overflow counted, not silently lost);
  2. one stable lexicographic XLA sort by (tile, depth) — parity with the
     CUDA radix sort; invalid pairs carry a sentinel tile and sort last;
  3. per-tile ranges come from searchsorted; each tile's run is *virtually*
     padded to a multiple of ``block_size``: a slab slot maps back into the
     sorted array as ``starts[tile] + rank`` (gather), no scatter anywhere;
  4. per-block metadata (owning tile, slot base) drives the Pallas grid. The
     slab capacity is a budget of ``pairs_per_gaussian`` average pairs, so
     compute tracks actual overlap instead of the N*M worst case.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from guassianhand_tpu.ops.common import opacity_cull_keep, tile_rect


@dataclasses.dataclass(frozen=True)
class BinningConfig:
    tile_size: int = 16
    block_size: int = 128           # pairs per Pallas block (lane-width aligned)
    max_tiles_per_gaussian: int = 16
    max_blocks_per_tile: int = 64   # caps per-tile pairs at block_size * this
    pairs_per_gaussian: float = 4.5  # slab capacity budget (average per gaussian)
    # Compact-walk enumeration (r5): walk this many rect cells (static; must
    # cover the scene's max 3-sigma rect), apply the opacity cull per CELL,
    # and compact the surviving cells into the max_tiles_per_gaussian slots
    # (stable per-row sort — walk order preserved, outputs bit-identical).
    # M then bounds the LIVE tile need (measured 4-6 on the hand scenes)
    # instead of the rect need (9+), shrinking the big (tile, depth) sort
    # rows by N*(M_rect - M_live), and overflow becomes an EXACT live-cell
    # count instead of a conservative rect overcount. 0 = legacy walk-M.
    walk_cells: int = 0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Binning:
    """Static-shape binning result.

    pair_gidx:  (PP,) int32 Gaussian index per slab slot; sentinel N padding.
    pair_eidx:  (PP,) int32 enumeration index (gaussian * M + m) per slot;
                sentinel N*M padding. Real entries are UNIQUE across the slab
                (each sorted pair lands in at most one slot); gaussian ids
                are pair_eidx // M (the sentinel maps to the sentinel id N).
    tile_of_block / base_of_block: (TB,) int32 per-block owning tile and the
                slot offset of the block within its tile's run.
    counts:     (T+1,) int32 number of real pairs per tile (dummy tile last).
    n_pairs:    () int32 total real pairs.
    overflow:   () int32 pairs dropped (enum cap, per-tile cap, slab budget).
    """

    pair_gidx: jax.Array
    pair_eidx: jax.Array
    tile_of_block: jax.Array
    base_of_block: jax.Array
    counts: jax.Array
    n_pairs: jax.Array
    overflow: jax.Array


def grid_dims(height: int, width: int, tile_size: int):
    ntx = -(-width // tile_size)
    nty = -(-height // tile_size)
    return ntx, nty


def static_sizes(n: int, height: int, width: int, cfg: BinningConfig):
    """(num_tiles, padded slab capacity PP, total blocks TB)."""
    ntx, nty = grid_dims(height, width, cfg.tile_size)
    num_tiles = ntx * nty
    g = cfg.block_size
    pair_budget = -(-int(n * cfg.pairs_per_gaussian) // g) * g
    # every tile gets >= 1 block; tile runs pad to block granularity
    total_blocks = num_tiles + pair_budget // g + 1
    pp = total_blocks * g
    return num_tiles, pp, total_blocks


def enumerate_tiles(
    mean2d: jax.Array,
    radius: jax.Array,
    visible: jax.Array,
    *,
    height: int,
    width: int,
    cfg: BinningConfig = BinningConfig(),
    y_band=None,
    opacity=None,
):
    """Rect enumeration: (tile_flat (N*M,) int32 with sentinel num_tiles,
    overflow_enum ()). Pure index computation, no gradients.

    With ``opacity`` given, rect tiles whose min distance from the Gaussian
    center exceeds the opacity-aware cull radius (ops/common.opacity_cull_r2)
    are dropped — EXACT w.r.t. the compositors' alpha >= ALPHA_MIN gate (the
    oracle applies the identical rule). On low-opacity scenes this removes
    the rect-corner tiles where the Gaussian can never clear the gate."""
    n = mean2d.shape[0]
    m = cfg.max_tiles_per_gaussian
    ntx, nty = grid_dims(height, width, cfg.tile_size)
    num_tiles = ntx * nty
    mean2d = jax.lax.stop_gradient(mean2d)

    x0, x1, y0, y1 = tile_rect(mean2d, radius, ntx, nty, cfg.tile_size,
                               y_band=y_band)
    rw = x1 - x0
    rh = y1 - y0
    need = jnp.where(visible, rw * rh, 0)  # (N,)
    rw_safe = jnp.maximum(rw, 1)

    # Rect enumeration without integer div/mod (slow on the VPU): unrolled
    # row-major counters over the (rw, rh) rect.
    r_cells = cfg.walk_cells if cfg.walk_cells > m else m
    txs, tys = [], []
    cx = jnp.zeros_like(x0)
    cy = jnp.zeros_like(y0)
    for _ in range(r_cells):
        txs.append(x0 + cx)
        tys.append(y0 + cy)
        wrap = cx + 1 >= rw_safe
        cx = jnp.where(wrap, 0, cx + 1)
        cy = jnp.where(wrap, cy + 1, cy)
    tx = jnp.stack(txs, axis=1)  # (N, R)
    ty = jnp.stack(tys, axis=1)
    rr = jnp.arange(r_cells, dtype=jnp.int32)

    if cfg.walk_cells > m:
        # Compact-walk: cull every WALKED cell, then pack the survivors into
        # the m slots with a stable per-row sort (live cells first, walk
        # order preserved — the (tile, depth) sort sees the identical live
        # pair set in the identical relative order, so outputs/grads are
        # bit-identical; only the slot bookkeeping changes).
        in_rect = rr[None, :] < need[:, None]              # (N, R), uncapped
        live = in_rect
        if opacity is not None:
            live = live & opacity_cull_keep(
                mean2d[:, 0:1], mean2d[:, 1:2], radius[:, None],
                opacity[:, None], tx, ty, cfg.tile_size)   # (N, R)
        tile_cell = jnp.where(live, ty * ntx + tx, num_tiles
                              ).astype(jnp.int32)
        key = (~live).astype(jnp.int32)
        _, tile_sorted = jax.lax.sort((key, tile_cell), dimension=1,
                                      num_keys=1, is_stable=True)
        tile_id = tile_sorted[:, :m]
        live_count = jnp.sum(live.astype(jnp.int32), axis=1)
        # EXACT accounting: live cells beyond the m slots, plus (conservative)
        # rect cells the static walk never reached.
        overflow_enum = (jnp.sum(jnp.maximum(live_count - m, 0))
                         + jnp.sum(jnp.maximum(need - r_cells, 0)))
        return tile_id.reshape(-1), overflow_enum

    need_cap = jnp.minimum(need, m)
    valid = rr[None, :] < need_cap[:, None]
    if opacity is not None:
        valid = valid & opacity_cull_keep(
            mean2d[:, 0:1], mean2d[:, 1:2], radius[:, None], opacity[:, None],
            tx, ty, cfg.tile_size)                         # (N, M)
    tile_id = jnp.where(valid, ty * ntx + tx, num_tiles).astype(jnp.int32)
    # Pre-cull rect accounting: rect tiles beyond the m-slot window are never
    # materialized, so the cull cannot be applied to them — overflow_enum is
    # an UPPER bound on lost work when opacity culling is active (a tile
    # counted here might have been culled anyway). Conservative direction:
    # the bench's overflow==0 honesty gate can only fail early, never pass
    # while silently dropping work. (The compact-walk mode above replaces
    # this with exact live accounting.)
    overflow_enum = jnp.sum(jnp.maximum(need - m, 0))
    return tile_id.reshape(-1), overflow_enum


def slab_layout(tile_s, num_tiles: int, total_blocks: int,
                cfg: BinningConfig):
    """Per-tile ranges + per-block metadata from the tile-sorted key array.

    Returns (starts (T+1,), counts (T+1,), block_off (T+1,), tile_of_block
    (TB,), base_of_block (TB,), src_base (TB,), overflow_cap, overflow_budget).
    src_base is each block's start position in the SORTED pair array (not
    slab-aligned) — the composite kernels read it with dynamic-window DMAs.

    Per-tile ranges come via searchsorted. Measured alternatives both lose on
    TPU: scatter-based boundary marking costs ~ the full update count (XLA
    scatter cost tracks updates, not unique targets), and histogram via
    segment_sum serializes on duplicate indices.
    """
    g = cfg.block_size
    tile_ar = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    # method='scan' = vectorized binary search (the default 'compare_all'
    # materializes an O(N*T) comparison sweep)
    starts = jnp.searchsorted(tile_s, tile_ar, side="left",
                              method="scan").astype(jnp.int32)
    ends = jnp.searchsorted(tile_s, tile_ar, side="right",
                            method="scan").astype(jnp.int32)
    raw_counts = ends - starts  # (T+1,), last entry = invalid pairs
    cap = cfg.max_blocks_per_tile * g
    counts = jnp.minimum(raw_counts, cap).at[num_tiles].set(0)
    overflow_cap = jnp.sum(jnp.maximum(raw_counts[:num_tiles] - cap, 0))

    # Slab layout: nb[t] = ceil(counts/g) blocks per tile (EMPTY tiles get
    # no blocks), clamped to the static slab budget — tiles past the budget
    # are dropped (counted).
    nb = -(-counts[:num_tiles] // g)
    block_end = jnp.cumsum(nb).astype(jnp.int32)  # (T,)
    fits = block_end <= total_blocks
    overflow_budget = jnp.sum(jnp.where(fits, 0, counts[:num_tiles]))
    counts = counts.at[:num_tiles].set(jnp.where(fits, counts[:num_tiles], 0))
    nb = -(-counts[:num_tiles] // g)
    block_off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nb).astype(jnp.int32)]
    )  # (T+1,)

    # Per-block metadata (gathers only, TB-sized).
    blk = jnp.arange(total_blocks, dtype=jnp.int32)
    tile_of_block = (
        jnp.searchsorted(block_off, blk, side="right").astype(jnp.int32) - 1
    )
    tile_of_block = jnp.minimum(tile_of_block, num_tiles)  # tail -> dummy
    tob_c = jnp.clip(tile_of_block, 0, num_tiles - 1)
    base_of_block = (blk - block_off[tob_c]) * g
    base_of_block = jnp.where(tile_of_block >= num_tiles, 0, base_of_block)
    src_base = starts[tob_c] + base_of_block          # (TB,)
    src_base = jnp.where(tile_of_block >= num_tiles, 0, src_base)
    return (starts, counts, block_off, tile_of_block, base_of_block,
            src_base, overflow_cap, overflow_budget)


@functools.partial(jax.jit, static_argnames=("height", "width", "cfg"))
def bin_gaussians(
    mean2d: jax.Array,
    depth: jax.Array,
    radius: jax.Array,
    visible: jax.Array,
    *,
    height: int,
    width: int,
    cfg: BinningConfig = BinningConfig(),
    y_band=None,
) -> Binning:
    n = mean2d.shape[0]
    m = cfg.max_tiles_per_gaussian
    g = cfg.block_size
    ntx, nty = grid_dims(height, width, cfg.tile_size)
    num_tiles, pp, total_blocks = static_sizes(n, height, width, cfg)

    depth = jax.lax.stop_gradient(depth)
    tile_flat, overflow_enum = enumerate_tiles(
        mean2d, radius, visible, height=height, width=width, cfg=cfg,
        y_band=y_band)
    depth_flat = jnp.broadcast_to(depth[:, None], (n, m)).reshape(-1)

    # 2-key stable lexicographic sort over the full (N, M) enumeration grid.
    # Measured-and-rejected alternatives at the 512^2 bench:
    # - packed single-int32 key (tile << rank_bits | depth-rank): 10.7M vs
    #   15.0M rays/s — XLA's TPU sort does not reward key packing;
    # - pre-sort compaction of the ~23% valid pairs via unique-index scatter:
    #   projbin 6.3 -> 13.8 ms — XLA TPU scatter costs ~10 ns/element even
    #   with unique_indices=True, dwarfing the sort savings.
    eidx_flat = jnp.arange(n * m, dtype=jnp.int32)
    tile_s, _, eidx_s = jax.lax.sort(
        (tile_flat, depth_flat, eidx_flat), num_keys=2, is_stable=True
    )
    cap_c = n * m

    lay = slab_layout(tile_s, num_tiles, total_blocks, cfg)
    (starts, counts, block_off, tile_of_block, base_of_block, src_base,
     overflow_cap, overflow_budget) = lay

    # Slot -> sorted-pair mapping. All metadata is per-block (TB-sized
    # gathers, ~thousands of elements) broadcast over the block's G slots;
    # only ONE large gather remains (gidx_s[src], contiguous runs of G).
    cnt_b = counts[jnp.clip(tile_of_block, 0, num_tiles - 1)]
    jj = jnp.arange(g, dtype=jnp.int32)
    src = src_base[:, None] + jj[None, :]             # (TB, G)
    ok = ((tile_of_block < num_tiles)[:, None]
          & (base_of_block[:, None] + jj[None, :] < cnt_b[:, None]))
    src = jnp.clip(src, 0, cap_c - 1)
    pair_eidx = jnp.where(ok, eidx_s[src], n * m).reshape(-1)
    pair_gidx = jnp.minimum(pair_eidx // m, n)

    return Binning(
        pair_gidx=pair_gidx,
        pair_eidx=pair_eidx,
        tile_of_block=tile_of_block,
        base_of_block=base_of_block,
        counts=counts,
        n_pairs=jnp.sum(counts[:num_tiles]),
        overflow=(overflow_enum + overflow_cap
                  + overflow_budget).astype(jnp.int32),
    )
