"""Differentiable 3DGS rasterization: the public op.

Pipeline (TPU-native redesign of the reference's CUDA rasterizer call sites,
renderer_one_shot.py:259-382):

  project (XLA, autodiff)  ->  bin (XLA sort, integer data)  ->
  composite (Pallas fwd kernel; hand-written Pallas bwd via jax.custom_vjp)

The custom VJP sits around the composite stage only; gradients w.r.t. the 3D
parameters (means, scales, quaternions, SH/colors, opacity) flow through the
XLA projection math by ordinary autodiff, which mirrors how the CUDA backward
chains its screen-space gradients through the preprocess step.

The mask render that the reference obtains with a second full rasterization
using all-ones colors (renderer_one_shot.py:371-380) equals ``1 - final_T`` of
the main pass, so one kernel invocation yields rgb + mask + T.
"""
from __future__ import annotations

import dataclasses
import functools
import os as _os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from guassianhand_tpu.core.camera import Camera
from guassianhand_tpu.core.gaussians import Gaussians
from guassianhand_tpu.core import sh as sh_lib
from guassianhand_tpu.ops import binning as binning_lib
from guassianhand_tpu.ops import rasterize_pallas as kern
from guassianhand_tpu.ops.binning import BinningConfig
from guassianhand_tpu.ops.common import T_EPS
from guassianhand_tpu.ops.projection import project_gaussians
from guassianhand_tpu.ops.projection_pallas import project_gaussians_pallas

# GH_BWD_SEGSORT=1: reduce per-pair gradients to per-gaussian via
# sort-by-gaussian-id + indices_are_sorted segment_sum instead of a random
# duplicate-index scatter-add (the bench step's #1 op by device time).
# Unset -> RasterizeConfig.grad_segsort decides; "0"/"1" overrides for A/B.
_BWD_SEGSORT_ENV = {"0": False, "1": True}.get(
    _os.environ.get("GH_BWD_SEGSORT", ""))


@dataclasses.dataclass(frozen=True)
class RasterizeConfig:
    tile_size: int = 16
    block_size: int = 128
    max_tiles_per_gaussian: int = 16
    max_blocks_per_tile: int = 64
    pairs_per_gaussian: float = 4.5  # slab capacity budget (average/gaussian)
    # "xla" (default): the scalar-form autodiff formulation
    # (ops/projection.py) — XLA fuses it into the surrounding pipeline, and
    # an A/B at the 512^2 bench measured it FASTER end-to-end (15.3 ms vs
    # 15.8-16.1 ms) than "pallas", the fused single-kernel pair
    # (ops/projection_pallas.py) whose call boundary blocks that fusion.
    projection_impl: str = "xla"
    # Exact opacity-aware (gaussian, tile) culling: drop rect tiles the
    # Gaussian can never clear the alpha >= 1/255 acceptance gate in
    # (ops/common.opacity_cull_r2 — the oracle applies the identical rule).
    opacity_cull: bool = True
    # Stability of the (tile, depth) pair sort. Ties are bit-equal fp32 depth
    # collisions within a tile (measure-zero in practice); the CUDA
    # reference's radix sort is stable, so stable is the parity default. A
    # config field (not an env read) so it participates in the jit cache key.
    sort_stable: bool = True
    # Ride the 3 color rows through the (tile, depth) sort as ONE u10x3-
    # packed int32 lane instead of three f32 lanes (12 -> 10 sort operands;
    # VERDICT r3 item 3a). The acceptance rule never reads color, so the
    # only semantic change is color quantization to 1/1023 — under half the
    # 1/255 uint8 quantum the reference's own eval protocol rounds through
    # (evaluator.py PNG round-trip) — and color GRADIENTS are exact either
    # way (dL/dc is the pair weight, which doesn't depend on c). Unpacked
    # elementwise right after the sort; the kernels see the same 16-row
    # table. Requires colors in [0, 1] (use_rgb sigmoid output or clamped
    # SH); values outside clip. A/B'd r4: +1.9% at ~9 sigma (ROADMAP.md),
    # shipped ON in the flagship config and bench.py; the dataclass default
    # stays False so the core op keeps exact color semantics for
    # port-parity baselines.
    pack_rgb: bool = False
    # Reduce per-pair gradients to per-gaussian via sort-by-gaussian-id +
    # indices_are_sorted segment_sum instead of a random duplicate-index
    # scatter-add. The scatter was the bench step's single biggest device op
    # (3.59 ms/step, docs/TRACE_BENCH_STEP.md rank 1); the sorted reduction
    # measured 14.71 -> 14.43 ms/step (~5 sigma) at the 512^2 bench. Values
    # differ only by fp32 summation ORDER within each gaussian's pair sum —
    # the same equivalence class as XLA's own unspecified scatter-add
    # combining order — so this defaults ON; gradient oracle-parity tests
    # run green either way (GH_BWD_SEGSORT=0/1 overrides for A/B).
    grad_segsort: bool = True
    # With grad_segsort: reduce the sorted pair-grad rows with the Pallas
    # windowed one-hot MXU kernel (ops/segreduce_pallas.py) instead of the
    # XLA segment_sum expansion (2.15 ms/step at the 512^2 bench, trace
    # rank 3). Same reassociation equivalence class; a span-guarded
    # lax.cond keeps the exact XLA path for pathological id gaps. Default
    # False (core-op parity baseline); bench + flagship opt in via config.
    segreduce_pallas: bool = False
    # Kernel geometry for segreduce_pallas: each `segreduce_chunk`-column
    # slice of the sorted pair table accumulates into a `segreduce_window`-
    # lane output window. Larger windows tolerate sparser id distributions
    # (e.g. fit scenes where densified-capacity slots leave dead-id gaps)
    # at linear VPU cost in the one-hot build; the span check falls back to
    # exact XLA when even that window is exceeded.
    # Geometry measured IN-PIPELINE at the 512^2 bench (one process,
    # scripts/bench_segreduce.py, real v5e): (256,512) engages on the real
    # culled-scene id distribution and wins 14.43 -> 12.41 ms/step (+16%);
    # (512,2048) trips the span guard there (max real span 727) and falls
    # back, i.e. correct but no win. The one-hot build costs PP*W VPU
    # element-ops, so the smallest window that fits the spans wins.
    segreduce_window: int = 256
    segreduce_chunk: int = 512
    # Compact-walk enumeration (BinningConfig.walk_cells): walk this many
    # rect cells applying the opacity cull per cell, pack survivors into the
    # max_tiles_per_gaussian slots — M then bounds LIVE need, not rect need.
    # 0 = legacy. Outputs/grads bit-identical (tests/test_rasterize.py).
    walk_cells: int = 0
    scale_modifier: float = 1.0
    znear: float = 0.01
    zfar: float = 1000.0
    interpret: bool = False  # run Pallas kernels in interpreter mode (CPU tests)

    def binning(self) -> BinningConfig:
        return BinningConfig(
            tile_size=self.tile_size,
            block_size=self.block_size,
            max_tiles_per_gaussian=self.max_tiles_per_gaussian,
            max_blocks_per_tile=self.max_blocks_per_tile,
            pairs_per_gaussian=self.pairs_per_gaussian,
            walk_cells=self.walk_cells,
        )


def _sorted_attr_table(mean2d, conic, color, opacity, tile_flat, depth, m, g,
                       stable=True, ntx=1, tile_size=16, num_tiles=1,
                       pack_rgb=False):
    """Depth-sort the (N, M) pair enumeration WITH the attrs riding the sort.

    Returns (tile_s (NM,), attr_sorted (16, NMpad)) where attr rows are
    0:x 1:y 2:conicA 3:conicB 4:conicC 5:r 6:g 7:b 8:opacity 9:gaussian id
    (an f32-exact integer), in (tile, depth)-sorted pair order, padded to a
    block-aligned width + 2 blocks so the kernels' dynamic 2g-windows never
    overrun.

    Riding the 10 payload rows through the sort costs ~+1.3 ms at the 512^2
    bench but replaces TWO 352k-index gathers (slab eidx + attr build,
    ~5.5 ms) — XLA TPU gathers cost ~9 ns per index regardless of row width.

    pack_rgb: ride r/g/b as ONE u10x3-packed int32 lane (10 sort operands
    instead of 12), unpacked elementwise after the sort — the kernels see
    the identical table layout, colors quantized to 1/1023 (see
    RasterizeConfig.pack_rgb). This sits inside the _composite custom_vjp,
    so the integer packing is invisible to autodiff.
    """
    n = mean2d.shape[0]
    assert n < (1 << 24), "gaussian ids must stay f32-exact"
    nm = n * m

    def bc(v):
        return jnp.broadcast_to(v[:, None], (n, m)).reshape(nm)

    depth_b = bc(jax.lax.stop_gradient(depth))
    gidx_f = bc(jnp.arange(n, dtype=jnp.float32))
    if pack_rgb:
        def q10(c):
            return jnp.round(jnp.clip(c, 0.0, 1.0) * 1023.0).astype(jnp.int32)

        rgb_packed = (q10(color[:, 0]) | (q10(color[:, 1]) << 10)
                      | (q10(color[:, 2]) << 20))
        ops = jax.lax.sort(
            (tile_flat, depth_b,
             bc(mean2d[:, 0]), bc(mean2d[:, 1]),
             bc(conic[:, 0]), bc(conic[:, 1]), bc(conic[:, 2]),
             bc(rgb_packed), bc(opacity), gidx_f),
            num_keys=2, is_stable=stable)
        tile_s = ops[0]
        p = ops[7]
        inv = jnp.float32(1.0 / 1023.0)
        attr_sorted = jnp.stack(
            [ops[2], ops[3], ops[4], ops[5], ops[6],
             (p & 1023).astype(jnp.float32) * inv,
             ((p >> 10) & 1023).astype(jnp.float32) * inv,
             ((p >> 20) & 1023).astype(jnp.float32) * inv,
             ops[8], ops[9]], axis=0)  # (10, NM)
    else:
        ops = jax.lax.sort(
            (tile_flat, depth_b,
             bc(mean2d[:, 0]), bc(mean2d[:, 1]),
             bc(conic[:, 0]), bc(conic[:, 1]), bc(conic[:, 2]),
             bc(color[:, 0]), bc(color[:, 1]), bc(color[:, 2]),
             bc(opacity), gidx_f),
            num_keys=2, is_stable=stable)
        tile_s = ops[0]
        attr_sorted = jnp.stack(ops[2:], axis=0)  # (10, NM)
    pad = (-nm) % g + 2 * g
    if kern.FWD_POWER_MXU:
        # Rows 10-15: tile-local polynomial coefficients of `power`, so the
        # kernels evaluate the exponent as one MXU matmul against the
        # [.., x^2, y^2, xy, x, y, 1] basis (kern._power_basis). Computed
        # POST-sort (elementwise over the sorted table + tile id) so the
        # (tile, depth) sort stays at 12 operands. Sentinel tiles (invalid
        # pairs, tile_s == num_tiles) are clamped to keep the math finite;
        # their slots are count-masked in-kernel anyway.
        ts_safe = jnp.minimum(tile_s, num_tiles - 1)
        ox = (ts_safe % ntx * tile_size).astype(jnp.float32)
        oy = (ts_safe // ntx * tile_size).astype(jnp.float32)
        x, y = attr_sorted[0], attr_sorted[1]
        ca, cb, cc = attr_sorted[2], attr_sorted[3], attr_sorted[4]
        ux = x - ox
        uy = y - oy
        coef = jnp.stack(
            [-0.5 * ca, -0.5 * cc, -cb,
             ca * ux + cb * uy, cc * uy + cb * ux,
             -0.5 * (ca * ux * ux + cc * uy * uy) - cb * ux * uy], axis=0)
        attr_sorted = jnp.concatenate([attr_sorted, coef], axis=0)
    attr_sorted = jnp.pad(attr_sorted,
                          ((0, kern.ATTR_ROWS - attr_sorted.shape[0]),
                           (0, pad)))
    return tile_s, attr_sorted


def _tiles_to_image(tiles, height, width, tile_size):
    """(T, C, P) -> (H, W, C) for a tile-row-major layout."""
    ntx, nty = binning_lib.grid_dims(height, width, tile_size)
    c = tiles.shape[1]
    x = tiles.reshape(nty, ntx, c, tile_size, tile_size)
    x = x.transpose(0, 3, 1, 4, 2).reshape(nty * tile_size, ntx * tile_size, c)
    return x[:height, :width]


def _image_to_tiles(img, tile_size):
    """(H, W, C) -> (T, C, P); H, W must be tile-aligned (padded internally)."""
    h, w, c = img.shape
    nty, ntx = h // tile_size, w // tile_size
    x = img.reshape(nty, tile_size, ntx, tile_size, c)
    return x.transpose(0, 2, 4, 1, 3).reshape(nty * ntx, c, tile_size * tile_size)


def _int_cotangent(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _composite(mean2d, conic, color, opacity, tile_flat, depth,
               height, width, cfg):
    """Differentiable tile composite over a pre-enumerated pair list.

    mean2d (N,2), conic (N,3), color (N,3), opacity (N,) are the
    differentiable per-gaussian screen attrs; tile_flat (N*M,) int32 is the
    rect enumeration from binning.enumerate_tiles (sentinel num_tiles);
    depth (N,). cfg: RasterizeConfig (static). M == cfg.max_tiles_per_gaussian.

    Internally: attrs ride a (tile, depth) sort -> slab layout metadata ->
    Pallas forward reading the sorted table via dynamic-window DMAs; the
    hand-written backward emits per-pair grads + gaussian ids, reduced by one
    segment_sum. Returns (rgb, final_t, n_pairs, overflow_capbudget); the
    last two are diagnostics (zero gradients).
    """
    # Primal (non-differentiated) path: skip the per-pair transmittance
    # stream the backward would need — render-only callers pay nothing.
    out, _ = _composite_impl(mean2d, conic, color, opacity, tile_flat, depth,
                             height, width, cfg, store_cpx=False)
    return out


def _composite_fwd(mean2d, conic, color, opacity, tile_flat, depth,
                   height, width, cfg):
    return _composite_impl(mean2d, conic, color, opacity, tile_flat, depth,
                           height, width, cfg, store_cpx=True)


def _composite_impl(mean2d, conic, color, opacity, tile_flat, depth,
                    height, width, cfg, *, store_cpx):
    n = mean2d.shape[0]
    m = cfg.max_tiles_per_gaussian
    g = cfg.block_size
    ts = cfg.tile_size
    bcfg = cfg.binning()
    ntx, nty = binning_lib.grid_dims(height, width, ts)
    num_tiles = ntx * nty
    _, _, total_blocks = binning_lib.static_sizes(n, height, width, bcfg)

    tile_s, attr_sorted = _sorted_attr_table(
        mean2d, conic, color, opacity, tile_flat, depth, m, g,
        stable=cfg.sort_stable, ntx=ntx, tile_size=ts, num_tiles=num_tiles,
        pack_rgb=cfg.pack_rgb)
    (_, counts, block_off, tile_of_block, base_of_block, src_base,
     overflow_cap, overflow_budget) = binning_lib.slab_layout(
        tile_s, num_tiles, total_blocks, bcfg)

    tiles, tchk, cpx = kern.composite_forward(
        attr_sorted, block_off, counts, src_base, total_blocks,
        num_tiles=num_tiles, ntx=ntx, tile_size=ts,
        block_size=g, max_blocks_per_tile=cfg.max_blocks_per_tile,
        interpret=cfg.interpret, store_cpx=store_cpx)
    rgb = _tiles_to_image(tiles[:, 0:3], height, width, ts)
    final_t = _tiles_to_image(tiles[:, 3:4], height, width, ts)[..., 0]
    n_pairs = jnp.sum(counts[:num_tiles])
    overflow = (overflow_cap + overflow_budget).astype(jnp.int32)
    residuals = (attr_sorted, tchk, cpx, block_off, counts, tile_of_block,
                 base_of_block, src_base, tiles[:, 3], opacity, tile_flat,
                 depth)
    return (rgb, final_t, n_pairs, overflow), residuals


def _composite_bwd(height, width, cfg, residuals, cotangents):
    (attr_sorted, tchk, cpx, block_off, counts, tile_of_block, base_of_block,
     src_base, tfinal_tiles, opacity_tok, tile_flat, depth_tok) = residuals
    g_rgb, g_t, _g_npairs, _g_overflow = cotangents
    ts = cfg.tile_size
    g = cfg.block_size
    ntx, nty = binning_lib.grid_dims(height, width, ts)
    num_tiles = ntx * nty
    p = ts * ts
    n = opacity_tok.shape[0]
    total_blocks = tile_of_block.shape[0]

    # Pad cotangent images to the tile-aligned canvas.
    ph, pw = nty * ts, ntx * ts
    g_rgb_pad = jnp.zeros((ph, pw, 3), jnp.float32).at[:height, :width].set(g_rgb)
    g_t_pad = jnp.zeros((ph, pw, 1), jnp.float32).at[:height, :width, 0].set(g_t)
    g_rgb_tiles = _image_to_tiles(g_rgb_pad, ts)  # (T, 3, P)
    g_t_tiles = _image_to_tiles(g_t_pad, ts)[:, 0]  # (T, P)

    gtiles = jnp.zeros((num_tiles, 8, p), jnp.float32)
    gtiles = gtiles.at[:, 0:3].set(g_rgb_tiles)
    gtiles = gtiles.at[:, 3].set(g_t_tiles)
    gtiles = gtiles.at[:, 4].set(tfinal_tiles)

    # Dead-block compaction: a block whose INCOMING per-pixel transmittance
    # is all < T_EPS contributes exactly zero gradient (every pair's
    # acceptance bit is 0), and because T is monotone non-increasing through
    # a tile's depth-sorted blocks, dead blocks are always a SUFFIX of the
    # tile — so compacting the kept blocks preserves per-tile contiguity and
    # the kernel's descending-sweep carry stays exact (skipped blocks add
    # nothing to the suffix accumulator). The replay then walks only the
    # live fraction of the slab. All the remapping below is on TB-sized
    # (~thousand-element) arrays — negligible next to the kernel.
    c_total = block_off[num_tiles]
    blk = jnp.arange(total_blocks, dtype=jnp.int32)
    keep = (blk < c_total) & (jnp.max(tchk[:total_blocks], axis=1) >= T_EPS)
    kb = jnp.argsort(jnp.where(keep, blk, total_blocks))  # kept ids ascending
    kept_nb = jax.ops.segment_sum(
        keep.astype(jnp.int32), jnp.clip(tile_of_block, 0, num_tiles),
        num_segments=num_tiles + 1)[:num_tiles]
    kept_boff = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                 jnp.cumsum(kept_nb).astype(jnp.int32)])
    ck = kept_boff[num_tiles]
    live_j = jnp.arange(total_blocks, dtype=jnp.int32) < ck
    tob2 = jnp.where(live_j, tile_of_block[kb], num_tiles)
    bob2 = jnp.where(live_j, base_of_block[kb], 0)
    srcb2 = jnp.where(live_j, src_base[kb], 0)
    # cpx stays in ORIGINAL block order (it is TB x P x G — gathering it
    # would move hundreds of MB); the kernel indirects through cpxb instead.
    cpxb = jnp.where(live_j, kb, 0)

    pair_grads = kern.composite_backward(
        attr_sorted, cpx, gtiles, kept_boff, counts, tob2,
        bob2, srcb2, cpxb, total_blocks,
        num_tiles=num_tiles, ntx=ntx, tile_size=ts, block_size=g,
        max_blocks_per_tile=cfg.max_blocks_per_tile,
        interpret=cfg.interpret)  # (16, PP) slab order; row 9 = gaussian id

    # Per-gaussian reduction: the kernel passes each pair's gaussian id out
    # with the gradients (row 9), so no index gather is needed. Columns of
    # blocks the kernel never walked (>= ck) are UNINITIALIZED — route
    # them to the trash segment n. (A unique-index scatter into the enum grid
    # was measured SLOWER than segment_sum — TPU scatter ~10 ns/element.)
    pp = total_blocks * g
    blk_of_col = jnp.arange(pp, dtype=jnp.int32) // g
    live = blk_of_col < ck
    gidx = jnp.where(live, pair_grads[9].astype(jnp.int32), n)
    gidx = jnp.clip(gidx, 0, n)
    use_segsort = (cfg.grad_segsort if _BWD_SEGSORT_ENV is None
                   else _BWD_SEGSORT_ENV)
    if use_segsort:
        # Sort the pair-gradient rows by gaussian id first, then reduce with
        # indices_are_sorted=True: XLA's TPU scatter-add over random
        # duplicate indices is the single most expensive op of the whole
        # bench step (device trace: 3.59 ms/step, docs/TRACE_BENCH_STEP.md
        # rank 1); a sorted scatter lowers to a cheaper expansion. The
        # extra key-value sort rides all 9 gradient rows. Unstable sort is
        # safe here: reordering within one gaussian only permutes the order
        # of a commutative fp32 sum over <= a few hundred terms (same class
        # of nondeterminism as XLA's own scatter-add combining order).
        sorted_ops = jax.lax.sort(
            (gidx, *[pair_grads[i] for i in range(9)]),
            num_keys=1, is_stable=False)
        if cfg.segreduce_pallas:
            # windowed one-hot MXU kernel (ops/segreduce_pallas.py): same
            # sorted-reduction contract, ~roofline instead of the 2.15 ms
            # XLA expansion; span-guarded lax.cond falls back to the exact
            # XLA path on pathological id gaps.
            from .segreduce_pallas import segment_reduce_sorted
            seg = segment_reduce_sorted(
                sorted_ops[0], jnp.stack(sorted_ops[1:], axis=0), n,
                window=cfg.segreduce_window, chunk=cfg.segreduce_chunk,
                interpret=cfg.interpret)
        else:
            seg = jax.ops.segment_sum(
                jnp.stack(sorted_ops[1:], axis=1), sorted_ops[0],
                num_segments=n + 1, indices_are_sorted=True)[:n]
    else:
        seg = jax.ops.segment_sum(
            pair_grads[:9].T, gidx, num_segments=n + 1)[:n]
    return (seg[:, 0:2], seg[:, 2:5], seg[:, 5:8], seg[:, 8],
            _int_cotangent(tile_flat), jnp.zeros_like(depth_tok))


_composite.defvjp(_composite_fwd, _composite_bwd)


def _project(gaussians: Gaussians, camera: Camera, config: RasterizeConfig):
    fn = (project_gaussians_pallas if config.projection_impl == "pallas"
          else project_gaussians)
    kw = {"interpret": config.interpret} \
        if config.projection_impl == "pallas" else {}
    return fn(gaussians.xyz, gaussians.scaling, gaussians.rotation, camera,
              scale_modifier=config.scale_modifier, znear=config.znear,
              zfar=config.zfar, **kw)


def rasterize(
    gaussians: Gaussians,
    camera: Camera,
    *,
    height: int,
    width: int,
    background: Optional[jax.Array] = None,
    sh_degree: int = 3,
    use_rgb: bool = False,
    config: RasterizeConfig = RasterizeConfig(),
):
    """Render one view. Returns dict with comp_rgb (H,W,3), comp_mask (H,W),
    final_t (H,W), plus binning diagnostics (n_pairs, overflow, radii)."""
    if background is None:
        background = jnp.zeros((3,), jnp.float32)
    background = jnp.asarray(background, jnp.float32)

    opacity = gaussians.effective_opacity()[:, 0]
    proj = _project(gaussians, camera, config)

    if use_rgb:
        color = gaussians.shs[:, 0, :]
    else:
        dirs = gaussians.xyz - camera.camera_center()[None, :]
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-9)
        color = sh_lib.eval_sh(sh_degree, gaussians.shs, dirs)

    tile_flat, overflow_enum = binning_lib.enumerate_tiles(
        proj.mean2d, proj.radius, proj.visible,
        height=height, width=width, cfg=config.binning(),
        opacity=opacity if config.opacity_cull else None)

    rgb, final_t, n_pairs, overflow = _composite(
        proj.mean2d, proj.conic, color, opacity, tile_flat, proj.depth,
        height, width, config)

    rgb = rgb + final_t[..., None] * background[None, None, :]
    return {
        "comp_rgb": rgb,
        "comp_mask": 1.0 - final_t,
        "final_t": final_t,
        "radii": proj.radius,
        "n_pairs": n_pairs,
        "overflow": (overflow_enum + overflow).astype(jnp.int32),
    }


def render_gaussians(gaussians, w2c, K, *, height, width, **kwargs):
    """Convenience wrapper building the Camera from (w2c, K)."""
    cam = Camera.from_w2c(w2c, K, height, width)
    return rasterize(gaussians, cam, height=height, width=width, **kwargs)


def rasterize_multiview(
    gaussians: Gaussians,
    w2cs: jax.Array,
    Ks: jax.Array,
    *,
    height: int,
    width: int,
    background: Optional[jax.Array] = None,
    sh_degree: int = 3,
    use_rgb: bool = False,
    config: RasterizeConfig = RasterizeConfig(),
):
    """Render V views in ONE binning + ONE composite launch.

    The reference rasterizes per view in a python loop
    (renderer_one_shot.py:494-503); a vmap replays binning per view. Here the
    V views are stacked vertically on a (V * H_band, W) canvas (bands are
    tile-row aligned): each view's projected means are offset by v * H_band
    and its tile rects clamped to the view's tile-row band, so a single sort
    + slab + kernel walk composites every view. Gradients flow to the shared
    Gaussians through each view's projection by ordinary autodiff.

    w2cs: (V, 4, 4); Ks: (V, 3, 3) or (V, 4, 4).
    Returns dict with comp_rgb (V, H, W, 3), comp_mask / final_t (V, H, W),
    n_pairs, overflow.
    """
    if background is None:
        background = jnp.zeros((3,), jnp.float32)
    background = jnp.asarray(background, jnp.float32)

    v = w2cs.shape[0]
    ts = config.tile_size
    nty_band = -(-height // ts)
    band_h = nty_band * ts
    n = gaussians.xyz.shape[0]
    opacity = gaussians.effective_opacity()[:, 0]

    def proj_one(w2c, K):
        cam = Camera.from_w2c(w2c, K, height, width)
        proj = _project(gaussians, cam, config)
        if use_rgb:
            color = gaussians.shs[:, 0, :]
        else:
            dirs = gaussians.xyz - cam.camera_center()[None, :]
            dirs = dirs / jnp.maximum(
                jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-9)
            color = sh_lib.eval_sh(sh_degree, gaussians.shs, dirs)
        return proj, color

    projs, colors = jax.vmap(proj_one)(w2cs, Ks)  # (V, N, ...)

    yoff = (jnp.arange(v, dtype=jnp.float32) * band_h)[:, None]
    mean2d = jnp.stack(
        [projs.mean2d[..., 0], projs.mean2d[..., 1] + yoff], axis=-1
    ).reshape(v * n, 2)
    conic = projs.conic.reshape(v * n, 3)
    color = colors.reshape(v * n, 3)
    depth = projs.depth.reshape(v * n)
    radius = projs.radius.reshape(v * n)
    visible = projs.visible.reshape(v * n)
    opacity_f = jnp.broadcast_to(opacity[None, :], (v, n)).reshape(v * n)

    band_lo = jnp.repeat(jnp.arange(v, dtype=jnp.int32) * nty_band, n)
    tile_flat, overflow_enum = binning_lib.enumerate_tiles(
        mean2d, radius, visible,
        height=v * band_h, width=width, cfg=config.binning(),
        y_band=(band_lo, band_lo + nty_band),
        opacity=opacity_f if config.opacity_cull else None)

    rgb, final_t, n_pairs, overflow = _composite(
        mean2d, conic, color, opacity_f, tile_flat, depth,
        v * band_h, width, config)

    rgb = rgb + final_t[..., None] * background[None, None, :]
    rgb = rgb.reshape(v, band_h, width, 3)[:, :height]
    final_t = final_t.reshape(v, band_h, width)[:, :height]
    return {
        "comp_rgb": rgb,
        "comp_mask": 1.0 - final_t,
        "final_t": final_t,
        "n_pairs": n_pairs,
        "overflow": (overflow_enum + overflow).astype(jnp.int32),
    }
