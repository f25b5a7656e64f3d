"""Data pipeline pieces: native loader, rays/bounds, orbit cameras, saving,
config system, snowflake/point-generator, profiling utils."""
import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from guassianhand_tpu.data.rays import (bounds_from_points, get_mask_at_box,
                                        get_rays, orbit_cameras)
from guassianhand_tpu.utils.saving import Saver, save_image_grid


def test_rays_and_mask_at_box():
    K = np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]], np.float32)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0, 0, 2.0], np.float32)
    ro, rd = get_rays(64, 64, K, R, t)
    assert ro.shape == (64, 64, 3) and rd.shape == (64, 64, 3)
    pts = np.random.RandomState(0).uniform(-0.2, 0.2, (100, 3)).astype(
        np.float32)
    bounds = bounds_from_points(pts)
    mask, near, far = get_mask_at_box(bounds, K, R, t, 64, 64)
    assert mask.shape == (64, 64)
    assert mask.any() and not mask.all()
    # the box sits around the origin, 2 in front of the camera
    assert 1.0 < near < 2.0 < far < 3.0
    # center pixel hits the box
    assert mask[32, 32]


def test_orbit_cameras_look_at_center():
    K = np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]], np.float32)
    center = np.array([0.1, -0.2, 0.4])
    w2cs, Ks = orbit_cameras(center, 1.5, K, n_views=8)
    assert w2cs.shape == (8, 4, 4)
    for v in range(8):
        pc = w2cs[v, :3, :3] @ center + w2cs[v, :3, 3]
        # center projects to the optical axis at distance radius
        np.testing.assert_allclose(pc[:2], 0.0, atol=1e-5)
        np.testing.assert_allclose(pc[2], 1.5, atol=1e-5)


def test_native_loader_roundtrip(tmp_path):
    import PIL.Image

    from guassianhand_tpu.data.native_loader import PrefetchPool, decode_image

    img = (np.random.RandomState(0).uniform(0, 1, (32, 24, 3)) * 255).astype(
        np.uint8)
    p = str(tmp_path / "t.png")
    PIL.Image.fromarray(img).save(p)
    d = decode_image(p)
    np.testing.assert_allclose(d, img / 255.0, atol=1e-6)

    mask = np.zeros((32, 24), np.uint8)
    mask[:16] = 255
    mp = str(tmp_path / "m.png")
    PIL.Image.fromarray(mask).save(mp)
    pool = PrefetchPool(2)
    t = pool.submit(p, mp)
    rgb, m = pool.wait(t)
    assert np.abs(rgb[16:]).max() == 0.0  # background zeroed
    np.testing.assert_allclose(m[:16], 1.0)
    pool.close()


def test_saver_and_grid(tmp_path):
    s = Saver(str(tmp_path))
    img = np.random.RandomState(0).uniform(0, 1, (16, 16, 3))
    path = s.save_rgb("a/b.png", img)
    assert os.path.exists(path)
    path = save_image_grid(str(tmp_path / "grid.png"), [img, img, img], cols=2)
    import PIL.Image

    g = PIL.Image.open(path)
    assert g.size == (32, 32)  # 2x2 grid of 16px cells


def test_config_system(tmp_path):
    from guassianhand_tpu.config import load_config, save_config_snapshot

    base = tmp_path / "base.yaml"
    base.write_text("expname: base\nfit:\n  lr: 0.5\n")
    child = tmp_path / "child.yaml"
    child.write_text(f"extends: base.yaml\ndata:\n  height: 128\n")
    cfg = load_config(str(child), ["fit.epochs=3", "expname=run1"])
    assert cfg.expname == "run1"
    assert cfg.fit.lr == 0.5
    assert cfg.fit.epochs == 3
    assert cfg.data.height == 128
    snap = save_config_snapshot(cfg, str(tmp_path / "run"))
    assert os.path.exists(snap)


def test_fps_and_snowflake():
    from guassianhand_tpu.ops.fps import farthest_point_sample, fps_subsample
    from guassianhand_tpu.nn.snowflake import SnowflakeDecoder

    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(0, 1, (256, 3)), jnp.float32)
    idx = farthest_point_sample(pts, 32)
    assert len(np.unique(np.asarray(idx))) == 32  # no duplicates
    sub = fps_subsample(pts, 32)
    assert sub.shape == (32, 3)

    dec = SnowflakeDecoder(up_factors=(2, 2), input_channels=96)
    cond = jnp.asarray(rng.uniform(-1, 1, (32, 96)), jnp.float32)
    params = dec.init(jax.random.PRNGKey(0), sub, cond)
    up, levels = dec.apply(params, sub, cond)
    assert up.shape == (128, 3)
    assert len(levels) == 3


def test_point_generator_bypass():
    from guassianhand_tpu.models.point_generator import SimplePointGenerator

    gen = SimplePointGenerator(num_pcl=64, backbone_layers=1,
                               up_factors=(2,))
    pts = jnp.asarray(np.random.RandomState(0).uniform(0, 1, (1, 128, 3)),
                      jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), pts)
    out = gen.apply(params, pts)
    assert out.shape == (1, 128, 3)  # 64 fps * 2 up


def test_profiling_utils():
    from guassianhand_tpu.utils.profiling import timed

    f = jax.jit(lambda x: x * 2)
    dt, res = timed(f, jnp.ones(8), iters=3, warmup=1)
    assert dt > 0 and np.asarray(res).sum() == 16


def test_zbuffer_rasterize_points():
    from guassianhand_tpu.core.camera import Camera
    from guassianhand_tpu.ops.zbuffer import rasterize_points, fetch_image_features

    K = np.array([[32.0, 0, 16], [0, 32.0, 16], [0, 0, 1]], np.float32)
    w2c = np.eye(4, dtype=np.float32)
    cam = Camera.from_w2c(w2c, K, 32, 32)
    # two points projecting to the same pixel; nearer one must win
    pts = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, 1.0], [0.25, 0.0, 1.0]])
    idx, depth = rasterize_points(pts, cam, 32, 32)
    assert int(idx[16, 16]) == 1
    np.testing.assert_allclose(float(depth[16, 16]), 1.0, atol=1e-6)
    assert int(idx[16, 24]) == 2  # x=0.25 -> pixel 16+8
    assert int(idx[0, 0]) == -1

    fm = jnp.asarray(np.random.RandomState(0).uniform(
        size=(32, 32, 4)), jnp.float32)
    feats = fetch_image_features(pts, cam, fm)
    np.testing.assert_allclose(np.asarray(feats[1]), np.asarray(fm[16, 16]),
                               atol=1e-5)


def test_shipped_configs():
    """The shipped configs/ (VERDICT r1 item 6) load, extend and reproduce the
    reference experiment definitions (config_one_shot.yaml + one_shot.json)."""
    import os
    from guassianhand_tpu.config import load_config

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    cfg = load_config(os.path.join(root, "one_shot.yaml"))
    assert cfg.expname == "oneshot_interhand26m"
    assert cfg.fit.lr == 0.01 and cfg.fit.steps_per_epoch == 50
    assert cfg.model.backbone_layers == 10
    assert cfg.model.residual_map_hw == (1024, 2048)
    assert cfg.fit.weights.l1 == 10.0 and cfg.fit.weights.vgg == 0.1
    assert cfg.data.dataset == "interhand"

    edit = load_config(os.path.join(root, "one_shot_edit.yaml"))
    assert edit.fit.lr == 0.001 and edit.fit.epochs == 10
    assert edit.fit.steps_per_epoch == 100
    assert edit.edit.enabled and edit.edit.edit_left_only
    assert edit.data.edit
    # inherited from the base experiment
    assert edit.model.backbone_layers == 10

    drive = load_config(os.path.join(root, "one_shot_avatar_drive.yaml"))
    assert drive.edit.duplication and not drive.edit.edit_left_only

    # CLI-style dotted overrides still apply on top
    over = load_config(os.path.join(root, "one_shot.yaml"),
                       ["fit.lr=0.5", "data.height=128"])
    assert over.fit.lr == 0.5 and over.data.height == 128


def test_pointnet_sa_fp_modules():
    """PointNet++ SA (kNN) and FP modules: shapes, grouping semantics, and
    inverse-distance interpolation (ref snowflake/utils.py:216-263,334-384)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from guassianhand_tpu.nn.snowflake import (PointNetSAModuleKNN,
                                               PointNetFPModule)

    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))

    sa = PointNetSAModuleKNN(npoint=16, nsample=8, mlp=(32, 64))
    params = sa.init(jax.random.PRNGKey(0), xyz, feats)
    new_xyz, new_feats = sa.apply(params, xyz, feats)
    assert new_xyz.shape == (16, 3) and new_feats.shape == (16, 64)
    # FPS centers are actual input points
    d = jnp.min(jnp.sum((new_xyz[:, None] - xyz[None]) ** 2, -1), axis=1)
    assert float(jnp.max(d)) < 1e-10

    sa_all = PointNetSAModuleKNN(npoint=0, nsample=0, mlp=(32, 64),
                                 group_all=True)
    p2 = sa_all.init(jax.random.PRNGKey(0), xyz, feats)
    gx, gf = sa_all.apply(p2, xyz, feats)
    assert gx.shape == (1, 3) and gf.shape == (1, 64)

    # FP: interpolating a linear field reproduces it (3-NN inverse-distance
    # weights are exact when the coarse set contains the query point).
    xyz2 = xyz[:32]
    feats2 = xyz2 @ jnp.ones((3, 5))  # linear in position
    fp = PointNetFPModule(mlp=(16,), use_points1=True)
    p3 = fp.init(jax.random.PRNGKey(0), xyz[:32], xyz2, feats[:32], feats2)
    out = fp.apply(p3, xyz[:32], xyz2, feats[:32], feats2)
    assert out.shape == (32, 16)
    assert np.isfinite(np.asarray(out)).all()
