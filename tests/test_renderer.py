"""GSRenderer: appearance residuals + edit flags + validity/densify masking."""
import numpy as np
import jax
import jax.numpy as jnp

from guassianhand_tpu.core.gaussians import Gaussians
from guassianhand_tpu.render.renderer import EditConfig, GSRenderer, RendererConfig
from guassianhand_tpu.ops.rasterize import RasterizeConfig


def _mk_gs(uv):
    n = uv.shape[0]
    return Gaussians(
        xyz=jnp.zeros((n, 3)),
        opacity=jnp.full((n, 1), 0.5),
        rotation=jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1)),
        scaling=jnp.full((n, 3), 0.01),
        shs=jnp.full((n, 1, 3), 0.5),
        valid=jnp.ones((n,)))


def _renderer_and_params():
    r = GSRenderer(cfg=RendererConfig(raster=RasterizeConfig(interpret=True)))
    feats = jnp.zeros((8, 131))
    pts = jnp.zeros((8, 3))
    uv = jnp.zeros((8, 2))
    params = r.init(jax.random.PRNGKey(0), feats, pts, uv,
                    method=GSRenderer.build_gaussians)
    return r, params


def test_appearance_residuals_and_identity_color_w():
    r, params = _renderer_and_params()
    # two points: one on the right hand (u<0.5), one on the left (u>=0.5)
    uv = jnp.array([[0.25, 0.25], [0.75, 0.25]])
    gs = _mk_gs(uv)
    mh, mw = 8, 16
    color_b = jnp.zeros((48, mh, mw))
    # put +0.2 residual in the first rgb triple over the LEFT-hand half only
    color_b = color_b.at[0:3, :, mw // 2:].set(0.2)
    opacity_b = jnp.full((1, mh, mw), 0.1)
    color_w = jnp.ones((48,))  # identity gain/bias

    out = r.apply(params, gs, uv, color_w, None, color_b, opacity_b,
                  method=GSRenderer.apply_appearance)
    rgb = np.asarray(out.shs[:, 0])
    # identity color_w: rgb*1 + 1 - 1 = rgb; + residual on the left point only
    np.testing.assert_allclose(rgb[0], 0.5, atol=1e-5)
    np.testing.assert_allclose(rgb[1], 0.7, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.opacity)[:, 0], 0.6, atol=1e-5)


def test_edit_left_only_zeroes_right_hand():
    r, params = _renderer_and_params()
    uv = jnp.array([[0.25, 0.25], [0.75, 0.25]])
    gs = _mk_gs(uv)
    mh, mw = 8, 16
    color_b = jnp.full((48, mh, mw), 0.2)
    edit = EditConfig(enabled=True, edit_left_only=True)
    out = r.apply(params, gs, uv, None, None, color_b, None, edit,
                  method=GSRenderer.apply_appearance)
    rgb = np.asarray(out.shs[:, 0])
    np.testing.assert_allclose(rgb[0], 0.5, atol=1e-5)  # right hand untouched
    np.testing.assert_allclose(rgb[1], 0.7, atol=1e-5)  # left hand edited


def test_edit_duplication_shifts_right_hand_sampling():
    r, params = _renderer_and_params()
    uv = jnp.array([[0.25, 0.25], [0.75, 0.25]])
    gs = _mk_gs(uv)
    mh, mw = 8, 16
    color_b = jnp.zeros((48, mh, mw))
    color_b = color_b.at[0:3, :, mw // 2:].set(0.3)  # left-hand half only
    edit = EditConfig(enabled=True, duplication=True)
    out = r.apply(params, gs, uv, None, None, color_b, None, edit,
                  method=GSRenderer.apply_appearance)
    rgb = np.asarray(out.shs[:, 0])
    # the right-hand point now samples the left-hand half too
    np.testing.assert_allclose(rgb[0], 0.8, atol=1e-5)
    np.testing.assert_allclose(rgb[1], 0.8, atol=1e-5)


def test_per_hand_color_w_pairs_in_edit_mode():
    r, params = _renderer_and_params()
    uv = jnp.array([[0.25, 0.25], [0.75, 0.25]])
    gs = _mk_gs(uv)
    cw = jnp.ones((48,))
    cw = cw.at[0:3].set(2.0)    # right-hand gain
    cw = cw.at[3:6].set(1.5)    # right-hand bias
    cw = cw.at[6:9].set(0.5)    # left-hand gain
    cw = cw.at[9:12].set(1.2)   # left-hand bias
    edit = EditConfig(enabled=True)
    out = r.apply(params, gs, uv, cw, None, None, None, edit,
                  method=GSRenderer.apply_appearance)
    rgb = np.asarray(out.shs[:, 0])
    np.testing.assert_allclose(rgb[0], 0.5 * 2.0 + 1.5 - 1.0, atol=1e-5)
    np.testing.assert_allclose(rgb[1], 0.5 * 0.5 + 1.2 - 1.0, atol=1e-5)


def test_build_gaussians_capacity_and_masks():
    r, params = _renderer_and_params()
    feats = jnp.asarray(np.random.RandomState(0).normal(size=(8, 131)),
                        jnp.float32)
    pts = jnp.asarray(np.random.RandomState(1).normal(size=(8, 3)),
                      jnp.float32)
    uv = jnp.zeros((8, 2))
    gs, uv2 = r.apply(params, feats, pts, uv,
                      method=GSRenderer.build_gaussians)
    assert gs.xyz.shape == (16, 3)       # originals + duplicate slots
    assert uv2.shape == (16, 2)
    v = np.asarray(gs.valid)
    # duplicates can only be valid when the original is (score>0.9 => >0.1)
    assert ((v[8:] <= v[:8]) | (v[:8] > 0)).all()
    # refined duplicates stay within the refinement radius of the originals
    d = np.abs(np.asarray(gs.xyz[8:]) - np.asarray(pts))
    assert d.max() <= 1e-3 + 1e-6


def test_exact_duplicate_uv_reprojection():
    """exact_duplicate_uv re-projects all 2N points through the UV mesh
    (renderer_one_shot.py:481-487): on-mesh points recover their triangle's
    interpolated UV."""
    r = GSRenderer(cfg=RendererConfig(
        exact_duplicate_uv=True,
        raster=RasterizeConfig(interpret=True)))
    # one right triangle in the z=0 plane with known corner UVs
    tri_xyz = jnp.asarray([[[0.0, 0, 0], [1, 0, 0], [0, 1, 0]]])
    tri_uv = jnp.asarray([[[0.0, 0], [0.5, 0], [0.0, 1]]])
    pts = jnp.asarray([[0.25, 0.25, 0.0], [0.1, 0.2, 0.05],
                       [0.5, 0.0, 0.0], [0.0, 0.5, 0.0]])
    feats = jnp.zeros((4, 131))
    vert_uv = jnp.full((4, 2), 0.77)  # wrong on purpose; must be ignored
    params = r.init(jax.random.PRNGKey(0), feats, pts, vert_uv,
                    tri_xyz=tri_xyz, tri_uv=tri_uv,
                    method=GSRenderer.build_gaussians)
    gs, uv = r.apply(params, feats, pts, vert_uv, tri_xyz=tri_xyz,
                     tri_uv=tri_uv, method=GSRenderer.build_gaussians)
    assert uv.shape == (8, 2)
    # barycentric-exact for the first (on-plane) point: uv = 0.25*(b-a uv)
    # + 0.25*(c-a uv) from corners (0,0),(0.5,0),(0,1)
    np.testing.assert_allclose(np.asarray(uv[0]), [0.125, 0.25], atol=1e-5)
    # edge midpoints of ab / ac interpolate the corner uvs
    np.testing.assert_allclose(np.asarray(uv[2]), [0.25, 0.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(uv[3]), [0.0, 0.5], atol=1e-5)
    # off-plane point projects to the surface (finite uv inside the triangle)
    assert np.isfinite(np.asarray(uv)).all()
    # the duplicated half gets re-projected too (not the parent copy 0.77)
    assert abs(float(uv[4, 0]) - 0.77) > 0.1
