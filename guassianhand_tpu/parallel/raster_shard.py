"""Explicitly sharded rasterizer: Gaussian-parallel projection, an
all_to_all Gaussian->tile exchange, tile-parallel compositing.

This is the SPMD design SURVEY.md §7.3 calls for (replacing the implicit
XLA resharding the round-1 build relied on): under ``shard_map`` over the
``model`` mesh axis,

  1. each device projects ITS shard of the Gaussians (N/D rows) and
     enumerates its (tile, depth, gaussian) pairs — pure local work;
  2. tiles are owned in contiguous ROW BANDS (device d owns tile rows
     [d*nty/D, (d+1)*nty/D)); every pair is bucketed by owner, buckets are
     padded to a static per-(src, dst) capacity, and ONE
     ``jax.lax.all_to_all`` moves every pair (with its screen-space attribute
     VALUES — the receiver has no access to the sender's Gaussians) to its
     owner — the TPU counterpart of the CUDA rasterizer's global radix sort
     across the whole image;
  3. each device depth-sorts the pairs it received, builds its local slab,
     and runs the Pallas composite over its band only. Bands are
     row-contiguous, so shifting ``mean2d.y`` by the band's pixel offset
     makes the band-local tile grid exactly equal the global one — the
     single-device kernels run unchanged. Received pairs are treated as
     "virtual Gaussians" feeding the standard ``_composite`` custom-VJP, so
     ``jax.grad`` flows: per-pair gradients -> all_to_all transpose (the VJP
     of all_to_all) -> the owning device's Gaussians. No hand-written
     communication in the backward.

Returns the image with rows sharded over ``model`` (composes directly with a
row-sharded loss); overflow counts pairs dropped by the exchange capacity.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from guassianhand_tpu.core.camera import Camera
from guassianhand_tpu.core.gaussians import Gaussians
import importlib

from guassianhand_tpu.ops import binning as binning_lib

# `ops/__init__` re-exports the rasterize FUNCTION under the module's name,
# so a plain `import ...ops.rasterize as m` resolves to the function.
raster_lib = importlib.import_module("guassianhand_tpu.ops.rasterize")
from guassianhand_tpu.ops import common
from guassianhand_tpu.ops.common import tile_rect
from guassianhand_tpu.ops.projection import project_gaussians
from guassianhand_tpu.ops.rasterize import RasterizeConfig


def _round_up(a: int, b: int) -> int:
    return -(-a // b) * b


def sharded_rasterize(gaussians: Gaussians, camera: Camera, *, height: int,
                      width: int, mesh: Mesh, background=None,
                      config: RasterizeConfig = RasterizeConfig(),
                      exchange_capacity: Optional[int] = None):
    """Render one view (use_rgb mode) with Gaussians/tiles sharded over
    ``model``. gaussians arrays shard on axis 0; N must divide the model-axis
    size; the tile-row count must divide it too (pad the image otherwise).

    exchange_capacity: per-(src, dst) pair budget of the all_to_all; defaults
    to the full local enumeration (lossless). Excess pairs are dropped and
    counted in ``overflow`` like the binning caps.
    """
    n_dev = mesh.shape["model"]
    n = gaussians.xyz.shape[0]
    assert n % n_dev == 0, (n, n_dev)
    m = config.max_tiles_per_gaussian
    ts = config.tile_size
    g = config.block_size
    ntx, nty = binning_lib.grid_dims(height, width, ts)
    assert nty % n_dev == 0, (
        f"tile rows {nty} must divide over model={n_dev}; pad the image")
    band_rows = nty // n_dev
    band_h = band_rows * ts
    n_loc = n // n_dev
    cap = exchange_capacity or _round_up(n_loc * m, 8)
    num_tiles = band_rows * ntx          # per-band
    total_blocks = num_tiles + (n_dev * cap) // g + 1

    if background is None:
        background = jnp.zeros((3,), jnp.float32)
    background = jnp.asarray(background, jnp.float32)
    eff_opacity = gaussians.effective_opacity()[:, 0]

    def local(xyz, scaling, rotation, opacity, color):
        d = jax.lax.axis_index("model")
        proj = project_gaussians(xyz, scaling, rotation, camera,
                                 scale_modifier=config.scale_modifier,
                                 znear=config.znear, zfar=config.zfar)

        # ---- local pair enumeration (rect walk as in ops/binning.py)
        x0, x1, y0, y1 = tile_rect(proj.mean2d, proj.radius, ntx, nty, ts)
        rw = x1 - x0
        rh = y1 - y0
        need = jnp.where(proj.visible, rw * rh, 0)
        need_cap = jnp.minimum(need, m)
        rw_safe = jnp.maximum(rw, 1)
        txs, tys = [], []
        cx = jnp.zeros_like(x0)
        cy = jnp.zeros_like(y0)
        for _ in range(m):
            txs.append(x0 + cx)
            tys.append(y0 + cy)
            wrap = cx + 1 >= rw_safe
            cx = jnp.where(wrap, 0, cx + 1)
            cy = jnp.where(wrap, cy + 1, cy)
        tx = jnp.stack(txs, axis=1)
        ty = jnp.stack(tys, axis=1)
        mm = jnp.arange(m, dtype=jnp.int32)
        pair_valid = mm[None, :] < need_cap[:, None]
        if config.opacity_cull:
            # THE shared cull decision (ops/common.opacity_cull_keep) —
            # fewer pairs cross the all_to_all (identical outputs/grads).
            pair_valid = pair_valid & common.opacity_cull_keep(
                proj.mean2d[:, 0:1], proj.mean2d[:, 1:2],
                proj.radius[:, None], opacity[:, None], tx, ty, ts)
        pair_valid = pair_valid.reshape(-1)
        tile_flat = jnp.where(
            pair_valid, (ty * ntx + tx).reshape(-1), nty * ntx
        ).astype(jnp.int32)
        gidx_flat = jnp.broadcast_to(
            jnp.arange(n_loc, dtype=jnp.int32)[:, None], (n_loc, m)
        ).reshape(-1)
        depth_flat = jax.lax.stop_gradient(
            jnp.broadcast_to(proj.depth[:, None], (n_loc, m)).reshape(-1))

        # ---- bucket by owning band, pad each bucket to the static capacity
        owner = jnp.where(pair_valid, tile_flat // (band_rows * ntx), n_dev)
        order = jnp.argsort(owner, stable=True)
        owner_s = owner[order]
        boundary = jnp.concatenate(
            [jnp.ones((1,), bool), owner_s[1:] != owner_s[:-1]])
        pos = jnp.arange(owner_s.shape[0], dtype=jnp.int32)
        run_start = jax.lax.cummax(jnp.where(boundary, pos, 0))
        rank = pos - run_start
        slot = jnp.where((owner_s < n_dev) & (rank < cap),
                         owner_s * cap + rank, n_dev * cap)
        dropped = jnp.sum(((owner_s < n_dev) & (rank >= cap)
                           ).astype(jnp.int32))
        src_pair = order  # flat pair index per sorted position

        def send_of(flat_vals, fill=0.0):
            buf = jnp.full((n_dev * cap + 1,), fill, flat_vals.dtype)
            return buf.at[slot].set(flat_vals[src_pair],
                                    mode="drop")[:-1].reshape(n_dev, cap)

        def send_gauss(per_g):
            return send_of(per_g[gidx_flat])

        send = {
            "x": send_gauss(proj.mean2d[:, 0]),
            "y": send_gauss(proj.mean2d[:, 1]),
            "ca": send_gauss(proj.conic[:, 0]),
            "cb": send_gauss(proj.conic[:, 1]),
            "cc": send_gauss(proj.conic[:, 2]),
            "r": send_gauss(color[:, 0]),
            "g": send_gauss(color[:, 1]),
            "b": send_gauss(color[:, 2]),
            "op": send_gauss(opacity),
            "tile": send_of(tile_flat, fill=jnp.int32(-1)),
            "depth": send_of(depth_flat),
        }
        recv = jax.tree_util.tree_map(
            lambda a: jax.lax.all_to_all(a, "model", 0, 0), send)

        # ---- received pairs == virtual Gaussians for the band composite
        np_recv = n_dev * cap
        rtile = recv["tile"].reshape(np_recv)
        rdepth = jax.lax.stop_gradient(recv["depth"].reshape(np_recv))
        rlive = rtile >= 0
        mean2d_r = jnp.stack(
            [recv["x"].reshape(np_recv),
             recv["y"].reshape(np_recv)
             - (d * band_h).astype(jnp.float32)], axis=1)
        conic_r = jnp.stack([recv["ca"].reshape(np_recv),
                             recv["cb"].reshape(np_recv),
                             recv["cc"].reshape(np_recv)], axis=1)
        color_r = jnp.stack([recv["r"].reshape(np_recv),
                             recv["g"].reshape(np_recv),
                             recv["b"].reshape(np_recv)], axis=1)
        op_r = recv["op"].reshape(np_recv)

        # band-local composite: received pairs feed the standard sorted-ride
        # _composite as virtual gaussians with M == 1 (each pair IS its own
        # enumeration slot); the slab budget is exactly np_recv pairs.
        band_t0 = d * band_rows * ntx
        loc_tile = jnp.where(rlive, rtile - band_t0, num_tiles
                             ).astype(jnp.int32)
        cfg_band = dataclasses.replace(config, max_tiles_per_gaussian=1,
                                       pairs_per_gaussian=1.0)
        rgb, final_t, _n_pairs, _ov = raster_lib._composite(
            mean2d_r, conic_r, color_r, op_r, loc_tile, rdepth,
            band_h, width, cfg_band)
        rgb = rgb + final_t[..., None] * background[None, None, :]
        ov = (dropped + jnp.sum(jnp.maximum(need - m, 0))).astype(jnp.int32)
        return rgb, 1.0 - final_t, final_t, ov[None]

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P("model"), P("model"), P("model"), P("model"), P("model")),
        out_specs=(P("model"), P("model"), P("model"), P(("model",))),
        check_rep=False)
    rgb, mask, final_t, ov = fn(gaussians.xyz, gaussians.scaling,
                                gaussians.rotation, eff_opacity,
                                gaussians.shs[:, 0, :])
    return {"comp_rgb": rgb[:height], "comp_mask": mask[:height],
            "final_t": final_t[:height], "overflow": jnp.sum(ov)}
