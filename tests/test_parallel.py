"""Sharded training step == unsharded step (virtual 8-device mesh)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from guassianhand_tpu.data.synthetic import SyntheticHandScene, synthetic_batch
from guassianhand_tpu.models.one_shot import OneShotAvatarModel, OneShotConfig
from guassianhand_tpu.ops.rasterize import RasterizeConfig
from guassianhand_tpu.parallel.mesh import make_mesh
from guassianhand_tpu.parallel.step import make_sharded_fit_step, shard_batch
from guassianhand_tpu.render.renderer import RendererConfig
from guassianhand_tpu.train.fit import FitConfig, make_fit_step, make_optimizer
from guassianhand_tpu.train.losses import LossWeights

HW = 32
RASTER = RasterizeConfig(interpret=True, max_tiles_per_gaussian=4,
                         max_blocks_per_tile=16)
CFG = OneShotConfig(
    camera_embed_dim=32, pose_embed_dim=32, plane_size=8, token_channels=32,
    backbone_layers=1, backbone_heads=2, backbone_head_dim=16,
    residual_map_hw=(32, 64), interaction_k=8,
    renderer=RendererConfig(raster=RASTER))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_step_matches_unsharded():
    scene = SyntheticHandScene.build(n_vertices=64, subdivide=1, height=HW,
                                     width=HW)
    b1 = synthetic_batch(scene, seed=0, raster=RASTER)
    batch = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x, x], axis=0), b1)

    model = OneShotAvatarModel(cfg=CFG)
    params = model.init(jax.random.PRNGKey(0), b1, HW, HW)
    fit_cfg = FitConfig(weights=LossWeights(vgg=0.0))
    optimizer = make_optimizer(params, fit_cfg)
    opt_state = optimizer.init(params)

    def model_apply(p, b):
        return model.apply(p, b, HW, HW)

    # unsharded reference step
    ref_step = make_fit_step(model_apply, None, optimizer, fit_cfg)
    p_ref, _, loss_ref, _ = ref_step(params, opt_state, batch)

    mesh = make_mesh(n_data=2)
    with mesh:
        sbatch = shard_batch(batch, mesh)
        step = make_sharded_fit_step(model_apply, optimizer, mesh,
                                     cfg=fit_cfg)
        p_sh, _, loss_sh, _ = step(params, opt_state, sbatch)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-4)
    # updated trainable params agree across the two paths
    a = np.asarray(p_ref["params"]["color_w"])
    b = np.asarray(p_sh["params"]["color_w"])
    np.testing.assert_allclose(a, b, atol=1e-5)
