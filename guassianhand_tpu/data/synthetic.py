"""Synthetic two-hand scenes for tests and benchmarks.

Stands in for the InterHand2.6M pipeline (dataset_one_shot.py) when neither
the dataset nor the licensed MANO assets are present: a synthetic MANO-like
model is posed by LBS, edge-subdivided with the real static-topology pipeline,
packed into the two-hand UV atlas layout, and a "ground-truth" image is
rendered with the oracle-tested rasterizer from a fixed Gaussian decoration of
the mesh. Every shape matches the real pipeline's contract
(SURVEY.md §2.8: points, vert_uv, mano pose, cameras, masks).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from guassianhand_tpu.core.camera import Camera
from guassianhand_tpu.core.gaussians import Gaussians
from guassianhand_tpu.mano.lbs import ManoModel, lbs
from guassianhand_tpu.mano.model import synthetic_mano_model
from guassianhand_tpu.mano.uv import synthetic_uv_atlas
from guassianhand_tpu.ops.knn import interaction_mask
from guassianhand_tpu.ops.rasterize import RasterizeConfig, rasterize
from guassianhand_tpu.ops.subdivision import (build_subdivision_plans,
                                              subdivide_n)


@dataclasses.dataclass
class SyntheticHandScene:
    """A deterministic two-hand scene with all model inputs precomputed."""

    model_r: ManoModel
    model_l: ManoModel
    plans_r: tuple
    plans_l: tuple
    uv_r: np.ndarray   # (Vr_sub, 2) packed atlas
    uv_l: np.ndarray
    height: int
    width: int
    K: np.ndarray
    w2c: np.ndarray

    @staticmethod
    def build(n_vertices: int = 778, subdivide: int = 1, height: int = 128,
              width: int = 128, seed: int = 0) -> "SyntheticHandScene":
        model_r = synthetic_mano_model(n_vertices, seed=seed)
        model_l = synthetic_mano_model(n_vertices, seed=seed + 1)
        plans_r = build_subdivision_plans(
            np.asarray(model_r.faces), n_vertices, subdivide)
        plans_l = build_subdivision_plans(
            np.asarray(model_l.faces), n_vertices, subdivide)

        def sub_uv(uv, plans):
            out = uv
            for plan in plans:
                e = plan.edges
                out = np.concatenate([out, 0.5 * (out[e[:, 0]] + out[e[:, 1]])])
            return out

        uv_r = sub_uv(synthetic_uv_atlas(np.asarray(model_r.v_template), True),
                      plans_r)
        uv_l = sub_uv(synthetic_uv_atlas(np.asarray(model_l.v_template), False),
                      plans_l)

        f = 0.9 * width
        K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]],
                     np.float32)
        w2c = np.eye(4, dtype=np.float32)
        w2c[2, 3] = 0.6
        return SyntheticHandScene(model_r, model_l, plans_r, plans_l,
                                  uv_r, uv_l, height, width, K, w2c)

    @property
    def n_points(self) -> int:
        return self.plans_r[-1].n_vertices_out + self.plans_l[-1].n_vertices_out

    def pose_points(self, pose_r, pose_l, betas=None, separation=0.08):
        """Returns posed (N, 3) concat [right, left] subdivided vertices.

        ``separation`` is the left hand's +x offset. The 0.08 default makes
        the hands overlap (a worst-case interacting scene, ~100% of points
        interact); larger values leave only a contact band interacting —
        the regime the reference's interaction detector targets
        (renderer_one_shot.py:554-574) and where ``interaction_cap`` pays.
        """
        betas = jnp.zeros(10) if betas is None else betas
        vr, _ = lbs(self.model_r, betas, pose_r)
        vl, _ = lbs(self.model_l, betas, pose_l)
        vl = vl * jnp.array([-1.0, 1.0, 1.0]) + jnp.array(
            [separation, 0.0, 0.0])
        vr = subdivide_n(vr, self.plans_r)
        vl = subdivide_n(vl, self.plans_l)
        return jnp.concatenate([vr, vl], axis=0)

    def vert_uv(self) -> jnp.ndarray:
        return jnp.asarray(np.concatenate([self.uv_r, self.uv_l]))

    def decoration_gaussians(self, points, seed: int = 0) -> Gaussians:
        """Fixed 'ground-truth' Gaussians on the mesh for target rendering."""
        n = points.shape[0]
        rng = np.random.RandomState(seed)
        colors = jnp.asarray(rng.uniform(0.2, 1.0, (n, 1, 3)), jnp.float32)
        # scales sized to cover ~2 px at the scene's focal length so the
        # target image has real content to fit against
        sigma = 2.0 * 0.6 / (0.9 * self.width)
        return Gaussians(
            xyz=points,
            opacity=jnp.full((n, 1), 0.9),
            rotation=jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (n, 1)),
            scaling=jnp.full((n, 3), sigma),
            shs=colors,
        )

    def render_target(self, points, raster: Optional[RasterizeConfig] = None,
                      seed: int = 0):
        cam = Camera.from_w2c(self.w2c, self.K, self.height, self.width)
        gs = self.decoration_gaussians(points, seed)
        out = rasterize(gs, cam, height=self.height, width=self.width,
                        use_rgb=True, config=raster or RasterizeConfig())
        return out["comp_rgb"], out["comp_mask"]


def synthetic_batch(scene: SyntheticHandScene, seed: int = 0,
                    pose_scale: float = 0.3,
                    raster: Optional[RasterizeConfig] = None,
                    with_target: bool = True,
                    separation: float = 0.08) -> Dict:
    """Build a model-ready batch dict (B=1) from the scene."""
    rng = np.random.RandomState(seed)
    pose_r = jnp.asarray(rng.uniform(-pose_scale, pose_scale, 48), jnp.float32)
    pose_l = jnp.asarray(rng.uniform(-pose_scale, pose_scale, 48), jnp.float32)
    tpose = jnp.zeros(48)

    points = scene.pose_points(pose_r, pose_l, separation=separation)
    points_t = scene.pose_points(tpose, tpose, separation=separation)
    inter = interaction_mask(points, points_t, k=min(100, points.shape[0] // 4))

    K = jnp.asarray(scene.K)
    w2c = jnp.asarray(scene.w2c)
    c2w = jnp.linalg.inv(w2c)
    K_normed = K.at[0].divide(scene.width).at[1].divide(scene.height)

    batch = {
        "points": points[None],
        "points_tar": points[None],
        "vert_uv": scene.vert_uv()[None],
        "inter_mask": inter[None],
        "mano_pose": jnp.concatenate([pose_r, pose_l])[None],
        "c2w": c2w[None],
        "intrinsic_normed": K_normed[None],
        "w2c_render": w2c[None, None],
        "K_render": K[None, None],
        "background": jnp.zeros((1, 3)),
    }
    if with_target:
        rgb, mask = scene.render_target(points, raster)
        batch["target_rgb"] = rgb[None]
        batch["target_mask"] = mask[None]
    return batch
