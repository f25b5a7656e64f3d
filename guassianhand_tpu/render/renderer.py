"""Gaussian renderer head: validity/densify, UV residual maps, per-view render.

TPU-native counterpart of the reference ``GS3DRenderer``
(tgs/models/renderer_one_shot.py:216-648) and its edit variant
(renderer_one_shot_edit.py:466-520):

- validity gating and the learned "duplicate high-score points and refine"
  densify step (renderer_one_shot.py:468-477) become static-capacity masking:
  the output always holds 2N slots (originals + duplicates) with a validity
  mask, instead of boolean indexing (SURVEY.md §7.1);
- per-UV-texel appearance residuals: ``color_w`` global gain/bias,
  ``color_b``/``opacity_b`` maps sampled at Gaussian UVs
  (renderer_one_shot.py:300-334, 489-492);
- the per-view python loop (renderer_one_shot.py:494-503) is a vmap over
  cameras; the mask render comes free from the transmittance output.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from guassianhand_tpu.core.camera import Camera
from guassianhand_tpu.core.gaussians import Gaussians
from guassianhand_tpu.nn.heads import GSLayer, VertValid, VertPosRefinement
from guassianhand_tpu.nn.mlp import MLP
from guassianhand_tpu.ops.grid_sample import grid_sample_2d
from guassianhand_tpu.ops.rasterize import (RasterizeConfig, rasterize,
                                            rasterize_multiview)
from guassianhand_tpu.mano.uv import normalize_uv


@dataclasses.dataclass(frozen=True)
class EditConfig:
    """Texture-edit flags (render_edit dict of the reference,
    config_one_shot_edit.yaml:175-179; semantics at
    renderer_one_shot_edit.py:489-510). In the packed UV atlas the map's left
    half (u < 0.5) is the RIGHT hand, the right half the LEFT hand."""

    enabled: bool = False          # use the edit path (per-hand color_w pairs)
    edit_left_only: bool = False   # zero color_b on the right hand's half
    duplication: bool = False      # right hand samples the left hand's texture


@dataclasses.dataclass(frozen=True)
class RendererConfig:
    hidden_dim: int = 128          # gs_out.in_channels
    feature_dim: int = 131         # 80 triplane + 51 additional (mlp_in, renderer_one_shot.py:241)
    threshold_low: float = 0.1
    threshold_high: float = 0.9
    sh_degree: int = 3
    use_rgb: bool = True
    multiview_batched: bool = True  # one binning+kernel launch for all views
    # Render through the EXPLICIT Gaussian->tile all_to_all exchange
    # (parallel.raster_shard.sharded_rasterize_batch) instead of letting XLA
    # reshard the sorted pair arrays implicitly. Takes effect only when a
    # mesh is active via parallel.mesh.use_exchange_mesh (set by
    # parallel.step.make_sharded_fit_step when the model axis > 1).
    sharded_exchange: bool = False
    # Hard-fail (RuntimeError at trace time) instead of warning + falling
    # back to the unsharded path when sharded_exchange is set but no
    # exchange mesh is active. Multi-chip validation runs set this so a
    # silent fallback can never masquerade as a passing sharded dryrun
    # (VERDICT r4 weak #3).
    sharded_exchange_required: bool = False
    # Per-(src, dst) pair budget of the exchange all_to_all. None = the
    # lossless full-enumeration budget (bl*v*n_loc*M rows — measured 12.9x
    # more than the live maximum on the flagship scene). Production real-ICI
    # runs should set this from exchange_balance_stats()["suggested_capacity"]
    # (max live bucket + 25% headroom, tested overflow-free at flagship
    # scale in tests/test_parallel.py); overflow counts any dropped pairs.
    exchange_capacity: Optional[int] = None
    # Re-project every (possibly refined/duplicated) point's UV through the
    # posed UV mesh via mano.uv.get_uvd, exactly like the reference's
    # per-forward re-projection (renderer_one_shot.py:481-487). Off by
    # default: refinement offsets are bounded at 1e-3 (sub-texel), and the
    # closest-point search is O(N*F) per forward. Requires tri_xyz/tri_uv.
    exact_duplicate_uv: bool = False
    raster: RasterizeConfig = RasterizeConfig()


class GSRenderer(nn.Module):
    cfg: RendererConfig = RendererConfig()

    def setup(self):
        self.mlp_net = MLP(dim_out=self.cfg.hidden_dim,
                           n_neurons=self.cfg.hidden_dim, n_hidden_layers=2,
                           activation="silu")
        self.gs_net = GSLayer(sh_degree=self.cfg.sh_degree,
                              use_rgb=self.cfg.use_rgb)
        self.gs_valid = VertValid()
        self.vert_pos_refinement = VertPosRefinement()

    def build_gaussians(self, features: jax.Array, points: jax.Array,
                        vert_uv: jax.Array, tri_xyz=None, tri_uv=None):
        """features (N, C), points (N, 3), vert_uv (N, 2) packed-atlas UVs.

        Returns (Gaussians with 2N static slots + validity, uv (2N, 2)).
        By default the duplicated half reuses the parent vertex UV — the
        refinement offset is bounded by 1e-3 (VertPosRefinement.radius), far
        below one UV texel, so re-projecting through the UV mesh (reference
        renderer_one_shot.py:481-487) is numerically a no-op for it. With
        ``cfg.exact_duplicate_uv`` (and tri_xyz (F, 3, 3) / tri_uv (F, 3, 2)
        supplied) every point's UV is re-projected through
        mano.uv.get_uvd exactly as the reference does each forward.
        """
        score = self.gs_valid(features, points)[:, 0]  # (N,)
        keep = score > self.cfg.threshold_low
        dup = score > self.cfg.threshold_high
        refined = self.vert_pos_refinement(features, points)

        all_feats = jnp.concatenate([features, features], axis=0)
        all_points = jnp.concatenate([points, refined], axis=0)
        valid = jnp.concatenate([keep, dup], axis=0).astype(jnp.float32)

        h = self.mlp_net(all_feats)
        gs = self.gs_net(h, all_points)
        gs = Gaussians(xyz=gs.xyz, opacity=gs.opacity, rotation=gs.rotation,
                       scaling=gs.scaling, shs=gs.shs, valid=valid)
        if self.cfg.exact_duplicate_uv and tri_xyz is not None:
            from guassianhand_tpu.mano.uv import get_uvd
            uv, _ = get_uvd(gs.xyz, tri_xyz, tri_uv)
        else:
            uv = jnp.concatenate([vert_uv, vert_uv], axis=0)
        return gs, uv

    def apply_appearance(self, gs: Gaussians, uv: jax.Array,
                         color_w: Optional[jax.Array],
                         xyz_b: Optional[jax.Array],
                         color_b_map: Optional[jax.Array],
                         opacity_b_map: Optional[jax.Array],
                         edit: EditConfig = EditConfig()) -> Gaussians:
        """Apply the fitted per-identity appearance residuals.

        color_w: (48,) global gain/bias (first two rgb triples used, matching
        renderer_one_shot.py:324); color_b_map: (48, Hm, Wm); opacity_b_map:
        (1, Hm, Wm); xyz_b: (3,).
        """
        uvn = normalize_uv(uv)  # (M, 2) in [-1, 1]
        rgb = gs.shs[:, 0, :]
        right = uv[:, 0] < 0.5  # right hand occupies u in [0, 0.5)

        uvn_sample = uvn
        if edit.duplication:
            # Right-hand points sample the left hand's texture half: the
            # reference copies map[..., 1024:] over map[..., :1024]
            # (renderer_one_shot_edit.py:506-507), i.e. a +0.5 u shift.
            shifted = jnp.stack([uvn[:, 0] + 1.0, uvn[:, 1]], axis=1)
            uvn_sample = jnp.where(right[:, None], shifted, uvn)

        if color_w is not None:
            cw = color_w.reshape(16, 3)
            if edit.enabled:
                # per-hand gain/bias pairs (renderer_one_shot_edit.py:489-499):
                # right hand cw[0]/cw[1], left hand cw[2]/cw[3]; duplication
                # gives the left hand's pair to both hands.
                use_left_pair = (~right[:, None]) | edit.duplication
                gain = jnp.where(use_left_pair, cw[2][None], cw[0][None])
                bias = jnp.where(use_left_pair, cw[3][None], cw[1][None])
            else:
                gain = cw[0][None]
                bias = cw[1][None]
            rgb = rgb * gain + bias - 1.0

        if color_b_map is not None:
            # The map carries 48 channels for checkpoint layout parity, but
            # only the first rgb triple is consumed — reshape(16,3)[:,0,:]
            # in the reference (renderer_one_shot.py:330-334). Slice BEFORE
            # sampling: identical values and gradients (the other 45
            # channels' taps had zero cotangents anyway), but the bilinear
            # gather and, critically, its backward scatter-add into the
            # (48, 1024, 2048) map gradient shrink 16x.
            cb = grid_sample_2d(color_b_map[:3], uvn_sample)  # (M, 3)
            if edit.edit_left_only:
                # zero residuals on the right hand's half of the map
                cb = cb * (~right)[:, None].astype(cb.dtype)
            rgb = rgb + cb

        opacity = gs.opacity
        if opacity_b_map is not None:
            ob = grid_sample_2d(opacity_b_map, uvn)  # (M, 1)
            opacity = opacity + ob

        xyz = gs.xyz if xyz_b is None else gs.xyz + xyz_b[None, :]
        return Gaussians(xyz=xyz, opacity=opacity, rotation=gs.rotation,
                         scaling=gs.scaling, shs=rgb[:, None, :],
                         valid=gs.valid)

    def render_views(self, gs: Gaussians, w2cs: jax.Array, Ks: jax.Array,
                     height: int, width: int,
                     background: Optional[jax.Array] = None):
        """w2cs (V, 4, 4), Ks (V, 3/4, 3/4) -> stacked view dict.

        With ``multiview_batched`` the V views share one binning + one
        composite launch via the stacked-canvas path
        (ops/rasterize.rasterize_multiview); otherwise vmap per view.
        """
        if self.cfg.multiview_batched:
            out = rasterize_multiview(
                gs, w2cs, Ks, height=height, width=width,
                background=background, sh_degree=self.cfg.sh_degree,
                use_rgb=self.cfg.use_rgb, config=self.cfg.raster)
            return {"comp_rgb": out["comp_rgb"],
                    "comp_mask": out["comp_mask"],
                    "overflow": out["overflow"]}

        def one_view(w2c, K):
            cam = Camera.from_w2c(w2c, K, height, width)
            out = rasterize(gs, cam, height=height, width=width,
                            background=background,
                            sh_degree=self.cfg.sh_degree,
                            use_rgb=self.cfg.use_rgb, config=self.cfg.raster)
            return out["comp_rgb"], out["comp_mask"], out["overflow"]

        rgb, mask, ov = jax.vmap(one_view)(w2cs, Ks)
        return {"comp_rgb": rgb, "comp_mask": mask,
                "overflow": jnp.sum(ov)}

    def __call__(self, features, points, vert_uv, w2cs, Ks, *, height, width,
                 background=None, color_w=None, xyz_b=None, color_b_map=None,
                 opacity_b_map=None, edit: EditConfig = EditConfig(),
                 tri_xyz=None, tri_uv=None):
        """Single-sample forward (vmap over batch at the model level)."""
        gs, uv = self.build_gaussians(features, points, vert_uv,
                                      tri_xyz=tri_xyz, tri_uv=tri_uv)
        gs = self.apply_appearance(gs, uv, color_w, xyz_b, color_b_map,
                                   opacity_b_map, edit)
        out = self.render_views(gs, w2cs, Ks, height, width, background)
        out["3dgs"] = gs
        return out
