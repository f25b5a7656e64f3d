"""Fused Pallas projection vs the XLA oracle: values and hand-derived grads."""
import numpy as np
import jax
import jax.numpy as jnp

from tests.utils import make_camera, make_gaussians
from guassianhand_tpu.ops.projection import project_gaussians
from guassianhand_tpu.ops.projection_pallas import project_gaussians_pallas


def _scene(n=3000, seed=0):
    cam = make_camera(128, 160)
    g = make_gaussians(n, seed=seed, scale_range=(0.002, 0.05))
    return cam, g


def test_forward_matches_xla_oracle():
    cam, g = _scene()
    a = project_gaussians(g.xyz, g.scaling, g.rotation, cam)
    b = project_gaussians_pallas(g.xyz, g.scaling, g.rotation, cam,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(a.visible), np.asarray(b.visible))
    vis = np.asarray(a.visible)
    np.testing.assert_allclose(np.asarray(b.mean2d)[vis],
                               np.asarray(a.mean2d)[vis], rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b.depth), np.asarray(a.depth),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b.conic)[vis],
                               np.asarray(a.conic)[vis], rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(b.radius), np.asarray(a.radius))


def test_backward_matches_xla_autodiff():
    """The hand-derived adjoint equals jax.grad of the oracle (visible rows;
    cotangents only land on visible gaussians in the real pipeline)."""
    cam, g = _scene(n=1500, seed=3)
    vis = np.asarray(project_gaussians(g.xyz, g.scaling, g.rotation,
                                       cam).visible)
    rng = np.random.RandomState(0)
    cm = jnp.asarray((rng.normal(size=(1500, 2)) * vis[:, None])
                     .astype(np.float32))
    cc = jnp.asarray((rng.normal(size=(1500, 3)) * vis[:, None])
                     .astype(np.float32))

    def loss(fn, kw):
        def f(xyz, scaling, rotation):
            p = fn(xyz, scaling, rotation, cam, **kw)
            return jnp.sum(p.mean2d * cm) + jnp.sum(p.conic * cc)
        return jax.grad(f, argnums=(0, 1, 2))

    ga = loss(project_gaussians, {})(g.xyz, g.scaling, g.rotation)
    gb = loss(project_gaussians_pallas, {"interpret": True})(
        g.xyz, g.scaling, g.rotation)
    for name, x, y in zip(("xyz", "scaling", "rotation"), ga, gb):
        x, y = np.asarray(x)[vis], np.asarray(y)[vis]
        scale = np.abs(x).max() + 1e-6
        np.testing.assert_allclose(y, x, rtol=2e-4, atol=2e-5 * scale,
                                   err_msg=name)


def test_rasterize_grads_with_pallas_projection():
    """End-to-end: rasterize with projection_impl=pallas reproduces the XLA
    projection path (image + gradient) in interpret mode."""
    import dataclasses
    from guassianhand_tpu.ops.rasterize import RasterizeConfig, rasterize

    cam, g = _scene(n=800, seed=1)
    base = RasterizeConfig(interpret=True, projection_impl="xla")
    pall = dataclasses.replace(base, projection_impl="pallas")

    def run(cfg):
        def f(xyz):
            g2 = dataclasses.replace(g, xyz=xyz)
            out = rasterize(g2, cam, height=128, width=160, use_rgb=True,
                            config=cfg)
            return out["comp_rgb"].mean() + out["comp_mask"].mean()
        v, gr = jax.value_and_grad(f)(g.xyz)
        return np.asarray(v), np.asarray(gr)

    va, gra = run(base)
    vb, grb = run(pall)
    np.testing.assert_allclose(vb, va, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(grb, gra, rtol=1e-3,
                               atol=1e-4 * (np.abs(gra).max() + 1e-9))
