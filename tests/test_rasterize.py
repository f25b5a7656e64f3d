"""Rasterizer correctness ladder (BASELINE config 1):

1. oracle self-consistency (alpha in [0,1], background passthrough)
2. Pallas forward == oracle forward (same acceptance semantics)
3. Pallas backward == oracle autodiff gradients (pixel-grad allclose)
"""
import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from guassianhand_tpu.core import sh as sh_lib
from guassianhand_tpu.ops.projection import project_gaussians
from guassianhand_tpu.ops.rasterize import RasterizeConfig, rasterize
from guassianhand_tpu.ops.rasterize_ref import composite_reference

from tests.utils import make_camera, make_gaussians

CFG = RasterizeConfig(interpret=True, max_tiles_per_gaussian=16)


def _oracle_render(gaussians, camera, height, width, bg, use_rgb=True):
    proj = project_gaussians(gaussians.xyz, gaussians.scaling,
                             gaussians.rotation, camera)
    if use_rgb:
        color = gaussians.shs[:, 0, :]
    else:
        dirs = gaussians.xyz - camera.camera_center()[None]
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        color = sh_lib.eval_sh(3, gaussians.shs, dirs)
    opacity = gaussians.effective_opacity()[:, 0]
    return composite_reference(
        proj.mean2d, proj.conic, color, opacity, proj.depth, proj.radius,
        proj.visible, height, width, bg, CFG.tile_size)


def test_oracle_basics():
    cam = make_camera(64, 64)
    g = make_gaussians(128, seed=1)
    bg = jnp.array([0.2, 0.3, 0.4])
    img, alpha, final_t = _oracle_render(g, cam, 64, 64, bg)
    assert img.shape == (64, 64, 3)
    a = np.asarray(alpha)
    assert (a >= -1e-6).all() and (a <= 1 + 1e-6).all()
    # Corner pixels far from the cluster should be pure background.
    assert np.allclose(np.asarray(img)[0, 0], np.asarray(bg), atol=1e-5)
    # Transmittance + alpha == 1
    np.testing.assert_allclose(np.asarray(final_t) + a, 1.0, atol=1e-6)
    # Something was actually rendered.
    assert a.max() > 0.5


def test_empty_scene_is_background():
    cam = make_camera(32, 32)
    g = make_gaussians(16, seed=2)
    # Push everything behind the camera -> all culled.
    g = jax.tree_util.tree_map(lambda x: x, g)
    g = g.__class__(xyz=g.xyz - jnp.array([0.0, 0.0, 10.0]), opacity=g.opacity,
                    rotation=g.rotation, scaling=g.scaling, shs=g.shs)
    bg = jnp.array([1.0, 0.0, 0.5])
    out = rasterize(g, cam, height=32, width=32, background=bg, use_rgb=True,
                    config=CFG)
    np.testing.assert_allclose(
        np.asarray(out["comp_rgb"]), np.broadcast_to(np.asarray(bg), (32, 32, 3)),
        atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["comp_mask"]), 0.0, atol=1e-6)


@pytest.mark.parametrize("seed,n,hw", [(0, 256, 64), (3, 512, 96), (7, 64, 32)])
def test_pallas_forward_matches_oracle(seed, n, hw):
    cam = make_camera(hw, hw)
    g = make_gaussians(n, seed=seed)
    bg = jnp.array([0.1, 0.2, 0.3])
    img_o, alpha_o, t_o = _oracle_render(g, cam, hw, hw, bg)
    out = rasterize(g, cam, height=hw, width=hw, background=bg, use_rgb=True,
                    config=CFG)
    assert int(out["overflow"]) == 0
    np.testing.assert_allclose(np.asarray(out["final_t"]), np.asarray(t_o),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["comp_rgb"]), np.asarray(img_o),
                               atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["comp_mask"]), np.asarray(alpha_o),
                               atol=2e-5, rtol=1e-4)


def test_pallas_gradients_match_oracle():
    hw = 48
    cam = make_camera(hw, hw)
    g = make_gaussians(192, seed=5, opacity_range=(0.2, 0.8))
    bg = jnp.array([0.05, 0.1, 0.15])
    tgt = jnp.asarray(np.random.RandomState(0).uniform(0, 1, (hw, hw, 3)),
                      jnp.float32)

    def loss_pallas(xyz, scaling, rotation, opacity, shs):
        gg = g.__class__(xyz=xyz, opacity=opacity, rotation=rotation,
                         scaling=scaling, shs=shs)
        out = rasterize(gg, cam, height=hw, width=hw, background=bg,
                        use_rgb=True, config=CFG)
        return (jnp.abs(out["comp_rgb"] - tgt).mean()
                + 0.3 * (out["comp_mask"] ** 2).mean())

    def loss_oracle(xyz, scaling, rotation, opacity, shs):
        gg = g.__class__(xyz=xyz, opacity=opacity, rotation=rotation,
                         scaling=scaling, shs=shs)
        img, alpha, _ = _oracle_render(gg, cam, hw, hw, bg)
        return jnp.abs(img - tgt).mean() + 0.3 * (alpha ** 2).mean()

    args = (g.xyz, g.scaling, g.rotation, g.opacity, g.shs)
    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(*args)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2, 3, 4))(*args)
    names = ["xyz", "scaling", "rotation", "opacity", "shs"]
    for name, a, b in zip(names, gp, go):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(
            a, b, atol=2e-4 * scale, rtol=2e-3,
            err_msg=f"grad mismatch for {name}")


def test_gradcheck_vs_finite_differences():
    """FD-check the oracle in float64 (measure-zero gate flips at tiny eps).

    The oracle's autodiff gradients are separately shown to match the Pallas
    hand-written backward (test above), so this closes the chain:
    FD == oracle autodiff == Pallas custom VJP.
    """
    hw = 32
    cam = make_camera(hw, hw)
    g = make_gaussians(24, seed=9, opacity_range=(0.3, 0.7),
                       scale_range=(0.04, 0.1))
    bg = jnp.zeros(3)

    jax.config.update("jax_enable_x64", True)
    try:
        cam64 = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float64)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, cam)

        def loss(xyz):
            gg = g.__class__(
                xyz=xyz, opacity=g.opacity.astype(jnp.float64),
                rotation=g.rotation.astype(jnp.float64),
                scaling=g.scaling.astype(jnp.float64),
                shs=g.shs.astype(jnp.float64))
            img, alpha, _ = _oracle_render(gg, cam64, hw, hw,
                                           bg.astype(jnp.float64))
            return (img ** 2).sum()

        xyz = np.asarray(g.xyz, np.float64)
        grad = np.asarray(jax.grad(loss)(jnp.asarray(xyz)))
        rng = np.random.RandomState(1)
        for trial in range(3):
            direction = rng.normal(size=grad.shape)
            direction /= np.linalg.norm(direction)
            eps = 1e-6
            fp = float(loss(jnp.asarray(xyz + eps * direction)))
            fm = float(loss(jnp.asarray(xyz - eps * direction)))
            fd = (fp - fm) / (2 * eps)
            ref = float((grad * direction).sum())
            assert abs(fd - ref) <= 1e-4 * max(1.0, abs(ref)), (trial, fd, ref)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_golden_render_stats():
    """Regression pin: fixed scene -> fixed image statistics (catches silent
    semantic drift in projection/binning/composite)."""
    cam = make_camera(64, 64)
    g = make_gaussians(256, seed=42)
    out = rasterize(g, cam, height=64, width=64, use_rgb=True,
                    background=jnp.array([0.25, 0.5, 0.75]), config=CFG)
    img = np.asarray(out["comp_rgb"])
    m = np.asarray(out["comp_mask"])
    # 544 rect pairs; the exact opacity cull (alpha can never reach 1/255 in
    # the dropped rect-corner tiles) trims 36 — image stats below unchanged.
    assert int(out["n_pairs"]) == 508
    np.testing.assert_allclose(img.mean(), 0.49906647, atol=1e-5)
    np.testing.assert_allclose(img.std(), 0.19043249, atol=1e-5)
    np.testing.assert_allclose(m.mean(), 0.17798567, atol=1e-5)
    np.testing.assert_allclose(
        img[32, 32], [0.3469450, 0.4358120, 0.4917480], atol=1e-5)


def test_binning_overflow_paths():
    """Each binning cap (enum cap, per-tile cap, slab budget) must degrade
    gracefully: overflow counted, render finite, no crash (VERDICT r1 #10;
    caps at ops/binning.py:150-165)."""
    from guassianhand_tpu.ops import binning as binning_lib
    from guassianhand_tpu.ops.binning import BinningConfig, bin_gaussians
    from guassianhand_tpu.ops.projection import project_gaussians
    from tests.utils import make_camera, make_gaussians

    hw = 64
    cam = make_camera(hw, hw)
    # big, overlapping gaussians -> huge tile rects
    g = make_gaussians(128, seed=0, scale_range=(0.2, 0.4))
    proj = project_gaussians(g.xyz, g.scaling, g.rotation, cam)

    def bins(cfg):
        return bin_gaussians(proj.mean2d, proj.depth, proj.radius,
                             proj.visible, height=hw, width=hw, cfg=cfg)

    # enum cap: every gaussian covers far more than 2 tiles
    b_enum = bins(BinningConfig(max_tiles_per_gaussian=2, block_size=32,
                                pairs_per_gaussian=8.0))
    assert int(b_enum.overflow) > 0
    assert int(b_enum.n_pairs) > 0

    # per-tile cap: tiny cap forces truncation of crowded tiles
    b_tile = bins(BinningConfig(max_tiles_per_gaussian=16, block_size=32,
                                max_blocks_per_tile=1, pairs_per_gaussian=16.0))
    assert int(b_tile.overflow) > 0
    counts = np.asarray(b_tile.counts)[:-1]
    assert counts.max() <= 32  # cap respected

    # slab budget: tiles beyond the budget dropped (counted, zeroed)
    b_budget = bins(BinningConfig(max_tiles_per_gaussian=16, block_size=32,
                                  pairs_per_gaussian=0.5))
    assert int(b_budget.overflow) > 0

    # reference no-cap run has strictly more pairs than every capped run
    b_free = bins(BinningConfig(max_tiles_per_gaussian=64, block_size=32,
                                pairs_per_gaussian=32.0,
                                max_blocks_per_tile=64))
    assert int(b_free.overflow) == 0
    for b in (b_enum, b_tile, b_budget):
        assert int(b.n_pairs) < int(b_free.n_pairs)

    # the degraded binning still renders finite images end to end
    cfg = RasterizeConfig(interpret=True, max_tiles_per_gaussian=2)
    out = rasterize(g, cam, height=hw, width=hw, use_rgb=True, config=cfg)
    assert int(out["overflow"]) > 0
    img = np.asarray(out["comp_rgb"])
    assert np.isfinite(img).all()
    m = np.asarray(out["comp_mask"])
    assert (m >= 0).all() and (m <= 1 + 1e-6).all()


def test_multiview_matches_per_view():
    """Stacked-canvas multi-view (one binning + one kernel launch) must agree
    with independent per-view rasterization — forward AND gradients
    (VERDICT r1 #8)."""
    from guassianhand_tpu.ops.rasterize import rasterize_multiview
    from guassianhand_tpu.core.camera import Camera

    hw = 48
    g = make_gaussians(160, seed=11, opacity_range=(0.2, 0.8))
    bg = jnp.array([0.1, 0.05, 0.2])

    # three cameras orbiting the cluster
    w2cs, Ks = [], []
    f = 1.2 * hw
    K = np.array([[f, 0, hw / 2], [0, f, hw / 2], [0, 0, 1]], np.float32)
    for ang in (0.0, 0.4, -0.7):
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = R
        w2c[2, 3] = 1.6
        w2cs.append(w2c)
        Ks.append(K)
    w2cs = jnp.asarray(np.stack(w2cs))
    Ks = jnp.asarray(np.stack(Ks))

    def mv(xyz):
        gg = g.__class__(xyz=xyz, opacity=g.opacity, rotation=g.rotation,
                         scaling=g.scaling, shs=g.shs)
        out = rasterize_multiview(gg, w2cs, Ks, height=hw, width=hw,
                                  background=bg, use_rgb=True, config=CFG)
        return out

    def pv(xyz):
        gg = g.__class__(xyz=xyz, opacity=g.opacity, rotation=g.rotation,
                         scaling=g.scaling, shs=g.shs)
        outs = [rasterize(gg, Camera.from_w2c(w2cs[i], Ks[i], hw, hw),
                          height=hw, width=hw, background=bg, use_rgb=True,
                          config=CFG) for i in range(3)]
        return outs

    out_mv = mv(g.xyz)
    assert int(out_mv["overflow"]) == 0
    outs_pv = pv(g.xyz)
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(out_mv["comp_rgb"][i]),
            np.asarray(outs_pv[i]["comp_rgb"]), atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out_mv["comp_mask"][i]),
            np.asarray(outs_pv[i]["comp_mask"]), atol=1e-5, rtol=1e-5)

    def loss_mv(xyz):
        out = mv(xyz)
        return jnp.abs(out["comp_rgb"]).mean() + (out["comp_mask"] ** 2).mean()

    def loss_pv(xyz):
        outs = pv(xyz)
        rgb = jnp.stack([o["comp_rgb"] for o in outs])
        mask = jnp.stack([o["comp_mask"] for o in outs])
        return jnp.abs(rgb).mean() + (mask ** 2).mean()

    g_mv = np.asarray(jax.grad(loss_mv)(g.xyz))
    g_pv = np.asarray(jax.grad(loss_pv)(g.xyz))
    scale = np.abs(g_pv).max() + 1e-12
    np.testing.assert_allclose(g_mv, g_pv, atol=1e-5 * scale, rtol=1e-4)


def test_multiview_band_isolation():
    """A gaussian near a view's top/bottom edge must not bleed into the
    vertically adjacent view on the stacked canvas (y_band clamp)."""
    from guassianhand_tpu.ops.rasterize import rasterize_multiview

    hw = 32
    # one big gaussian centered near the bottom edge of the image
    g = make_gaussians(1, seed=0, scale_range=(0.3, 0.3))
    g = g.__class__(xyz=jnp.array([[0.0, 0.45, 0.0]]),
                    opacity=jnp.ones((1, 1)) * 0.9,
                    rotation=jnp.array([[1.0, 0, 0, 0]]),
                    scaling=jnp.full((1, 3), 0.3),
                    shs=jnp.ones((1, 1, 3)))
    f = 1.2 * hw
    K = np.array([[f, 0, hw / 2], [0, f, hw / 2], [0, 0, 1]], np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 1.6
    # view 0 sees the gaussian; view 1 looks away (translated far off)
    w2c_away = w2c.copy()
    w2c_away[0, 3] = 100.0
    w2cs = jnp.asarray(np.stack([w2c, w2c_away]))
    Ks = jnp.asarray(np.stack([K, K]))
    out = rasterize_multiview(g, w2cs, Ks, height=hw, width=hw,
                              use_rgb=True, config=CFG)
    # view 0 renders something at the bottom; view 1 must stay empty
    assert float(out["comp_mask"][0].max()) > 0.1
    np.testing.assert_allclose(np.asarray(out["comp_mask"][1]), 0.0, atol=1e-6)


def test_opacity_cull_is_exact_and_reduces_pairs():
    """The opacity-aware tile cull (ops/common.opacity_cull_r2) must change
    NOTHING about outputs or gradients — it only drops (gaussian, tile) pairs
    that can never clear the alpha >= 1/255 acceptance gate — while reducing
    n_pairs on a translucent scene."""
    hw = 96
    cam = make_camera(hw, hw)
    g = make_gaussians(384, seed=11, opacity_range=(0.05, 0.6),
                       scale_range=(0.02, 0.1))
    bg = jnp.array([0.1, 0.0, 0.2])
    cfg_on = functools.partial(RasterizeConfig, interpret=True,
                               max_tiles_per_gaussian=16)
    tgt = jnp.asarray(np.random.RandomState(1).uniform(0, 1, (hw, hw, 3)),
                      jnp.float32)

    def run(cull):
        def loss(xyz, opacity):
            gg = g.__class__(xyz=xyz, opacity=opacity, rotation=g.rotation,
                             scaling=g.scaling, shs=g.shs)
            out = rasterize(gg, cam, height=hw, width=hw, background=bg,
                            use_rgb=True, config=cfg_on(opacity_cull=cull))
            return (jnp.abs(out["comp_rgb"] - tgt).mean()
                    + (out["comp_mask"] ** 2).mean())

        out = rasterize(g, cam, height=hw, width=hw, background=bg,
                        use_rgb=True, config=cfg_on(opacity_cull=cull))
        grads = jax.grad(loss, argnums=(0, 1))(g.xyz, g.opacity)
        return out, grads

    out_on, grads_on = run(True)
    out_off, grads_off = run(False)
    assert int(out_on["overflow"]) == 0 and int(out_off["overflow"]) == 0
    # the cull must actually fire on this translucent scene
    assert int(out_on["n_pairs"]) < int(out_off["n_pairs"]), (
        int(out_on["n_pairs"]), int(out_off["n_pairs"]))
    # Culling removes only zero-alpha slots, but their disappearance shifts
    # lane positions in the kernel's prefix-product tree — a different (still
    # exact-factor) association order, so equality holds to ~1 ulp, not bit.
    np.testing.assert_allclose(np.asarray(out_on["comp_rgb"]),
                               np.asarray(out_off["comp_rgb"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_on["final_t"]),
                               np.asarray(out_off["final_t"]), atol=1e-6)
    for a, b in zip(grads_on, grads_off):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, atol=1e-6 + 1e-5 * np.abs(b).max())

    # oracle with the cull == oracle without (same gate, tile granularity)
    img_c, alpha_c, t_c = _oracle_render(g, cam, hw, hw, bg)
    proj = project_gaussians(g.xyz, g.scaling, g.rotation, cam)
    img_n, alpha_n, t_n = composite_reference(
        proj.mean2d, proj.conic, g.shs[:, 0, :],
        g.effective_opacity()[:, 0], proj.depth, proj.radius, proj.visible,
        hw, hw, bg, CFG.tile_size, opacity_cull=False)
    np.testing.assert_array_equal(np.asarray(img_c), np.asarray(img_n))
    np.testing.assert_array_equal(np.asarray(t_c), np.asarray(t_n))


def test_pack_rgb_quantization_bound_and_exact_color_grads():
    """RasterizeConfig.pack_rgb rides r/g/b through the sort as one u10x3
    int32 lane (VERDICT r3 item 3a). Contract: the image differs from the
    unpacked render by at most the 1/1023 color quantum (accumulated weights
    sum to <= 1 per pixel), the mask is bit-identical (acceptance never
    reads color), and COLOR gradients are exactly equal (dL/dc = pair
    weight, independent of c). Other grads move only by the quantization."""
    cam = make_camera(96, 96)
    g = make_gaussians(512, seed=3, scale_range=(0.01, 0.05))
    base = RasterizeConfig(interpret=True, max_tiles_per_gaussian=8)
    packed = RasterizeConfig(interpret=True, max_tiles_per_gaussian=8,
                             pack_rgb=True)
    tgt = jnp.asarray(np.random.RandomState(0).uniform(
        0, 1, (96, 96, 3)).astype(np.float32))

    def render(cfg):
        return rasterize(g, cam, height=96, width=96, use_rgb=True,
                         config=cfg)

    o0, o1 = render(base), render(packed)
    assert np.array_equal(np.asarray(o0["comp_mask"]),
                          np.asarray(o1["comp_mask"]))
    delta = np.abs(np.asarray(o0["comp_rgb"]) - np.asarray(o1["comp_rgb"]))
    assert delta.max() <= 0.75 / 1023.0, delta.max()  # half-quantum rounding

    # a LINEAR image functional so dL/dpixel is a constant: under it the
    # color gradient dL/dc = sum of pair weights (alpha * transmittance),
    # which never reads color values -> must be EXACTLY equal. (A nonlinear
    # loss like L1 would flip sign bits wherever the 1/1023 forward
    # perturbation crosses the target.)
    def loss(shs, cfg):
        gg = dataclasses.replace(g, shs=shs)
        out = rasterize(gg, cam, height=96, width=96, use_rgb=True,
                        config=cfg)
        return jnp.sum(out["comp_rgb"] * tgt)

    gc0 = jax.grad(lambda s: loss(s, base))(g.shs)
    gc1 = jax.grad(lambda s: loss(s, packed))(g.shs)
    np.testing.assert_array_equal(np.asarray(gc0), np.asarray(gc1))

    def loss_op(op, cfg):
        gg = dataclasses.replace(g, opacity=op)
        out = rasterize(gg, cam, height=96, width=96, use_rgb=True,
                        config=cfg)
        return jnp.sum(out["comp_rgb"] * tgt)

    go0 = jax.grad(lambda o: loss_op(o, base))(g.opacity)
    go1 = jax.grad(lambda o: loss_op(o, packed))(g.opacity)
    rel = (np.linalg.norm(np.asarray(go0 - go1))
           / max(np.linalg.norm(np.asarray(go0)), 1e-12))
    assert rel < 2e-3, rel  # perturbed only by the 1/1023 color quanta


def test_grad_segsort_matches_scatter_reduction():
    """RasterizeConfig.grad_segsort reduces per-pair gradients to
    per-gaussian by sort-by-id + indices_are_sorted segment_sum instead of a
    random-order scatter-add. The two paths compute the SAME per-gaussian
    sums — only the fp32 summation order within each gaussian's pairs
    differs (the scatter path's own combining order is unspecified too), so
    gradients must agree to reassociation-level tolerance."""
    cam = make_camera(96, 96)
    g = make_gaussians(512, seed=7, scale_range=(0.01, 0.05))
    tgt = jnp.asarray(np.random.RandomState(1).uniform(
        0, 1, (96, 96, 3)).astype(np.float32))

    def grads(cfg):
        def loss(xyz, scaling, opacity):
            gg = dataclasses.replace(g, xyz=xyz, scaling=scaling,
                                     opacity=opacity)
            out = rasterize(gg, cam, height=96, width=96, use_rgb=True,
                            config=cfg)
            return (jnp.abs(out["comp_rgb"] - tgt).mean()
                    + (out["comp_mask"] ** 2).mean())

        return jax.grad(loss, argnums=(0, 1, 2))(g.xyz, g.scaling, g.opacity)

    g_scat = grads(RasterizeConfig(interpret=True, max_tiles_per_gaussian=8,
                                   grad_segsort=False))
    g_sort = grads(RasterizeConfig(interpret=True, max_tiles_per_gaussian=8,
                                   grad_segsort=True))
    for a, b, name in zip(g_scat, g_sort, ("xyz", "scaling", "opacity")):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-12)
        assert rel < 1e-5, (name, rel)


def test_compact_walk_enumeration_bit_identical():
    """BinningConfig.walk_cells (r5): culling every walked rect cell and
    compacting survivors into the M slots must produce BIT-identICAL images
    and gradients to the legacy walk at generous M, while allowing a tighter
    M (bounded by live need, not rect need) with overflow still 0."""
    import dataclasses

    from guassianhand_tpu.ops.rasterize import RasterizeConfig, rasterize
    from tests.utils import make_camera, make_gaussians

    hw = 96
    cam = make_camera(hw, hw)
    g = make_gaussians(512, seed=11, scale_range=(0.004, 0.05))
    base_cfg = RasterizeConfig(interpret=True, max_tiles_per_gaussian=16)

    tgt = jnp.asarray(np.random.RandomState(3).uniform(0, 1, (hw, hw, 3)),
                      jnp.float32)

    def run(cfg):
        def loss(xyz, shs, opacity):
            gg = g.__class__(xyz=xyz, opacity=opacity, rotation=g.rotation,
                             scaling=g.scaling, shs=shs)
            out = rasterize(gg, cam, height=hw, width=hw, use_rgb=True,
                            config=cfg)
            return (jnp.abs(out["comp_rgb"] - tgt).mean()
                    + (out["comp_mask"] ** 2).mean()), out
        (l, out), grads = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                             has_aux=True)(
            g.xyz, g.shs, g.opacity)
        return l, out, grads

    l0, out0, g0 = run(base_cfg)
    assert int(out0["overflow"]) == 0

    # same M, compact walk: identical live set -> bit-identical everything
    cfg_cw = dataclasses.replace(base_cfg, walk_cells=25)
    l1, out1, g1 = run(cfg_cw)
    assert int(out1["overflow"]) == 0
    np.testing.assert_array_equal(np.asarray(out1["comp_rgb"]),
                                  np.asarray(out0["comp_rgb"]))
    np.testing.assert_array_equal(float(l1), float(l0))
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g0)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # tighter M bounded by LIVE need: still overflow 0, still identical
    live_max = 0
    from guassianhand_tpu.ops import binning as binning_lib
    from guassianhand_tpu.ops.projection import project_gaussians
    proj = project_gaussians(g.xyz, g.scaling, g.rotation, cam)
    tile_flat, ov = binning_lib.enumerate_tiles(
        proj.mean2d, proj.radius, proj.visible, height=hw, width=hw,
        cfg=cfg_cw.binning(), opacity=g.effective_opacity()[:, 0])
    ntx, nty = binning_lib.grid_dims(hw, hw, 16)
    live_per_g = np.asarray(
        (tile_flat.reshape(512, -1) < ntx * nty).sum(axis=1))
    live_max = int(live_per_g.max())
    assert live_max < 16, live_max  # the cull genuinely tightens the bound
    cfg_tight = dataclasses.replace(base_cfg, walk_cells=25,
                                    max_tiles_per_gaussian=live_max)
    l2, out2, g2 = run(cfg_tight)
    assert int(out2["overflow"]) == 0
    np.testing.assert_array_equal(np.asarray(out2["comp_rgb"]),
                                  np.asarray(out0["comp_rgb"]))
    # image bit-identical; the per-gaussian grad reduction's padded length
    # is N*M so a different M re-parenthesizes the segment sums — measured
    # ~1e-9 abs (pure fp reassociation; values/pair sets identical)
    for a, b in zip(jax.tree_util.tree_leaves(g2),
                    jax.tree_util.tree_leaves(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-7, rtol=1e-5)

    # and M below live need must REPORT the loss, not hide it
    cfg_over = dataclasses.replace(base_cfg, walk_cells=25,
                                   max_tiles_per_gaussian=max(live_max - 2,
                                                              1))
    _, out3, _ = run(cfg_over)
    assert int(out3["overflow"]) > 0


def test_segment_reduce_sorted_matches_segment_sum():
    """ops/segreduce_pallas.segment_reduce_sorted (r5): the windowed one-hot
    MXU kernel computes the same per-segment sums as XLA's sorted
    segment_sum (reassociation-level tolerance — the products are exact at
    Precision.HIGHEST, only the addition order differs); a sparse id
    distribution whose chunk spans exceed the window must take the exact
    XLA fallback and match bit-for-bit."""
    from guassianhand_tpu.ops.segreduce_pallas import segment_reduce_sorted

    rng = np.random.RandomState(3)
    for n, pp in [(1000, 4096), (300, 512), (7000, 40000)]:
        ids = np.sort(rng.randint(0, n + 1, pp)).astype(np.int32)  # incl trash
        vals = rng.normal(size=(9, pp)).astype(np.float32)
        ref = jax.ops.segment_sum(jnp.asarray(vals).T, jnp.asarray(ids),
                                  num_segments=n + 1,
                                  indices_are_sorted=True)[:n]
        got = segment_reduce_sorted(jnp.asarray(ids), jnp.asarray(vals), n,
                                    interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    # spans >> window: the guard must reroute to the exact XLA path
    ids = np.sort(rng.choice(np.arange(0, 200000, 97), 4096)).astype(np.int32)
    vals = rng.normal(size=(9, 4096)).astype(np.float32)
    ref = jax.ops.segment_sum(jnp.asarray(vals).T, jnp.asarray(ids),
                              num_segments=200001,
                              indices_are_sorted=True)[:200000]
    got = segment_reduce_sorted(jnp.asarray(ids), jnp.asarray(vals), 200000,
                                interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_segreduce_pallas_grad_parity():
    """RasterizeConfig.segreduce_pallas: full backward through rasterize
    with the Pallas segment reduction matches the XLA segment_sum path to
    reassociation tolerance (same contract as grad_segsort itself)."""
    cam = make_camera(96, 96)
    g = make_gaussians(512, seed=11, scale_range=(0.01, 0.05))
    tgt = jnp.asarray(np.random.RandomState(2).uniform(
        0, 1, (96, 96, 3)).astype(np.float32))

    def grads(cfg):
        def loss(xyz, scaling, opacity):
            gg = dataclasses.replace(g, xyz=xyz, scaling=scaling,
                                     opacity=opacity)
            out = rasterize(gg, cam, height=96, width=96, use_rgb=True,
                            config=cfg)
            return (jnp.abs(out["comp_rgb"] - tgt).mean()
                    + (out["comp_mask"] ** 2).mean())

        return jax.grad(loss, argnums=(0, 1, 2))(g.xyz, g.scaling, g.opacity)

    g_xla = grads(RasterizeConfig(interpret=True, max_tiles_per_gaussian=8))
    g_pal = grads(RasterizeConfig(interpret=True, max_tiles_per_gaussian=8,
                                  segreduce_pallas=True))
    for a, b, name in zip(g_xla, g_pal, ("xyz", "scaling", "opacity")):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-12)
        assert rel < 1e-5, (name, rel)
