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
from guassianhand_tpu.ops.projection import project_gaussians


@dataclasses.dataclass(frozen=True)
class RasterizeConfig:
    tile_size: int = 16
    block_size: int = 128
    max_tiles_per_gaussian: int = 16
    max_blocks_per_tile: int = 64
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
        )


def _build_attr(mean2d, conic, color, opacity, pair_gidx):
    """Gather per-Gaussian rows into the (16, PP) slab layout (sentinel col N)."""
    rows = jnp.stack(
        [mean2d[:, 0], mean2d[:, 1], conic[:, 0], conic[:, 1], conic[:, 2],
         color[:, 0], color[:, 1], color[:, 2], opacity], axis=0
    )  # (9, N)
    rows = jnp.pad(rows, ((0, kern.ATTR_ROWS - 9), (0, 1)))  # (+sentinel col)
    return rows[:, pair_gidx]  # (16, PP)


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13, 14))
def _composite(mean2d, conic, color, opacity, pair_eidx, tile_of_block,
               base_of_block, counts, height, width, tile_size, block_size,
               max_blocks_per_tile, interpret, enum_m):
    """pair_eidx: (PP,) enum indices (gaussian * enum_m + slot), sentinel
    N * enum_m for padding; real entries unique across the slab (see
    binning.Binning.pair_eidx). enum_m == 1 means indices ARE gaussian ids."""
    out, _ = _composite_fwd(mean2d, conic, color, opacity, pair_eidx,
                            tile_of_block, base_of_block, counts, height,
                            width, tile_size, block_size, max_blocks_per_tile,
                            interpret, enum_m)
    return out


def _block_offsets(counts, num_tiles, block_size):
    nb = -(-counts[:num_tiles] // block_size)
    return jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nb).astype(jnp.int32)])


def _composite_fwd(mean2d, conic, color, opacity, pair_eidx, tile_of_block,
                   base_of_block, counts, height, width, tile_size,
                   block_size, max_blocks_per_tile, interpret, enum_m):
    ntx, nty = binning_lib.grid_dims(height, width, tile_size)
    num_tiles = ntx * nty
    pair_gidx = pair_eidx // enum_m  # sentinel N*M maps to the sentinel col N
    attr = _build_attr(mean2d, conic, color, opacity, pair_gidx)
    block_off = _block_offsets(counts, num_tiles, block_size)
    tiles, tchk = kern.composite_forward(
        attr, block_off, counts,
        num_tiles=num_tiles, ntx=ntx, tile_size=tile_size,
        block_size=block_size, max_blocks_per_tile=max_blocks_per_tile,
        interpret=interpret)  # (T, 8, P), (TBk, P)
    rgb = _tiles_to_image(tiles[:, 0:3], height, width, tile_size)
    final_t = _tiles_to_image(tiles[:, 3:4], height, width, tile_size)[..., 0]
    residuals = (mean2d, conic, color, opacity, attr, tchk, pair_eidx,
                 tile_of_block, base_of_block, block_off, counts, tiles[:, 3])
    return (rgb, final_t), residuals


def _composite_bwd(height, width, tile_size, block_size, max_blocks_per_tile,
                   interpret, enum_m, residuals, cotangents):
    (mean2d, conic, color, opacity, attr, tchk, pair_eidx, tile_of_block,
     base_of_block, block_off, counts, tfinal_tiles) = residuals
    g_rgb, g_t = cotangents
    ntx, nty = binning_lib.grid_dims(height, width, tile_size)
    num_tiles = ntx * nty
    p = tile_size * tile_size

    # Pad cotangent images to the tile-aligned canvas.
    ph, pw = nty * tile_size, ntx * tile_size
    g_rgb_pad = jnp.zeros((ph, pw, 3), jnp.float32).at[:height, :width].set(g_rgb)
    g_t_pad = jnp.zeros((ph, pw, 1), jnp.float32).at[:height, :width, 0].set(g_t)
    g_rgb_tiles = _image_to_tiles(g_rgb_pad, tile_size)  # (T, 3, P)
    g_t_tiles = _image_to_tiles(g_t_pad, tile_size)[:, 0]  # (T, P)

    gtiles = jnp.zeros((num_tiles, 8, p), jnp.float32)
    gtiles = gtiles.at[:, 0:3].set(g_rgb_tiles)
    gtiles = gtiles.at[:, 3].set(g_t_tiles)
    gtiles = gtiles.at[:, 4].set(tfinal_tiles)

    pair_grads = kern.composite_backward(
        attr, tchk, gtiles, block_off, counts, tile_of_block, base_of_block,
        num_tiles=num_tiles, ntx=ntx, tile_size=tile_size,
        block_size=block_size, max_blocks_per_tile=max_blocks_per_tile,
        interpret=interpret)  # (16, PP)

    # Per-gaussian reduction. (A unique-index scatter into the (N*M, 9) enum
    # grid + dense reduce was measured SLOWER than this segment_sum — XLA TPU
    # scatter costs ~10 ns/element regardless of unique_indices.)
    n = mean2d.shape[0]
    pair_gidx = jnp.minimum(pair_eidx // enum_m, n)
    seg = jax.ops.segment_sum(pair_grads.T, pair_gidx, num_segments=n + 1)[:n]
    return (seg[:, 0:2], seg[:, 2:5], seg[:, 5:8], seg[:, 8],
            _int_cotangent(pair_eidx), _int_cotangent(tile_of_block),
            _int_cotangent(base_of_block), _int_cotangent(counts))


_composite.defvjp(_composite_fwd, _composite_bwd)


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
    proj = project_gaussians(
        gaussians.xyz, gaussians.scaling, gaussians.rotation, camera,
        scale_modifier=config.scale_modifier, znear=config.znear,
        zfar=config.zfar)

    if use_rgb:
        color = gaussians.shs[:, 0, :]
    else:
        dirs = gaussians.xyz - camera.camera_center()[None, :]
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-9)
        color = sh_lib.eval_sh(sh_degree, gaussians.shs, dirs)

    binning = binning_lib.bin_gaussians(
        proj.mean2d, proj.depth, proj.radius, proj.visible,
        height=height, width=width, cfg=config.binning())

    rgb, final_t = _composite(
        proj.mean2d, proj.conic, color, opacity,
        binning.pair_eidx, binning.tile_of_block, binning.base_of_block,
        binning.counts, height, width, config.tile_size, config.block_size,
        config.max_blocks_per_tile, config.interpret,
        config.max_tiles_per_gaussian)

    rgb = rgb + final_t[..., None] * background[None, None, :]
    return {
        "comp_rgb": rgb,
        "comp_mask": 1.0 - final_t,
        "final_t": final_t,
        "radii": proj.radius,
        "n_pairs": binning.n_pairs,
        "overflow": binning.overflow,
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
        proj = project_gaussians(
            gaussians.xyz, gaussians.scaling, gaussians.rotation, cam,
            scale_modifier=config.scale_modifier, znear=config.znear,
            zfar=config.zfar)
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
    binning = binning_lib.bin_gaussians(
        mean2d, depth, radius, visible,
        height=v * band_h, width=width, cfg=config.binning(),
        y_band=(band_lo, band_lo + nty_band))

    rgb, final_t = _composite(
        mean2d, conic, color, opacity_f,
        binning.pair_eidx, binning.tile_of_block, binning.base_of_block,
        binning.counts, v * band_h, width, config.tile_size,
        config.block_size, config.max_blocks_per_tile, config.interpret,
        config.max_tiles_per_gaussian)

    rgb = rgb + final_t[..., None] * background[None, None, :]
    rgb = rgb.reshape(v, band_h, width, 3)[:, :height]
    final_t = final_t.reshape(v, band_h, width)[:, :height]
    return {
        "comp_rgb": rgb,
        "comp_mask": 1.0 - final_t,
        "final_t": final_t,
        "n_pairs": binning.n_pairs,
        "overflow": binning.overflow,
    }
