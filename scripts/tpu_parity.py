"""Compiled-mode (non-interpret) rasterizer parity check on the real TPU.

Runs the same oracle-vs-Pallas forward + gradient allclose as
tests/test_rasterize.py, but with interpret=False on the default (TPU)
backend — closing the interpret-mode/Mosaic gap: Mosaic block-shape and
DMA-alignment constraints are NOT checked by interpret mode, and this is the
only place the compiled kernel's numerics are compared against the oracle.

Exit code 0 = parity holds. Wired into the verify skill; run every round.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from guassianhand_tpu.core import sh as sh_lib
from guassianhand_tpu.ops.projection import project_gaussians
from guassianhand_tpu.ops.rasterize import RasterizeConfig, rasterize
from guassianhand_tpu.ops.rasterize_ref import composite_reference

from tests.utils import make_camera, make_gaussians

CFG = RasterizeConfig(interpret=False, max_tiles_per_gaussian=16)


def oracle_render(g, cam, hw, bg):
    proj = project_gaussians(g.xyz, g.scaling, g.rotation, cam)
    color = g.shs[:, 0, :]
    opacity = g.effective_opacity()[:, 0]
    return composite_reference(
        proj.mean2d, proj.conic, color, opacity, proj.depth, proj.radius,
        proj.visible, hw, hw, bg, CFG.tile_size)


def main():
    print(f"[t] backend: {jax.devices()[0].platform}", flush=True)
    hw = 96
    cam = make_camera(hw, hw)
    g = make_gaussians(512, seed=3)
    bg = jnp.array([0.1, 0.2, 0.3])

    t0 = time.time()
    out = jax.jit(lambda gg: rasterize(
        gg, cam, height=hw, width=hw, background=bg, use_rgb=True,
        config=CFG))(g)
    jax.block_until_ready(out)
    print(f"[t] fwd compile+run {time.time() - t0:.1f}s", flush=True)
    img_o, alpha_o, t_o = oracle_render(g, cam, hw, bg)
    assert int(out["overflow"]) == 0
    np.testing.assert_allclose(np.asarray(out["final_t"]), np.asarray(t_o),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["comp_rgb"]), np.asarray(img_o),
                               atol=5e-5, rtol=1e-4)
    print("[t] forward parity OK", flush=True)

    tgt = jnp.asarray(np.random.RandomState(0).uniform(0, 1, (hw, hw, 3)),
                      jnp.float32)

    def loss_pallas(xyz, scaling, rotation, opacity, shs):
        gg = g.__class__(xyz=xyz, opacity=opacity, rotation=rotation,
                         scaling=scaling, shs=shs)
        o = rasterize(gg, cam, height=hw, width=hw, background=bg,
                      use_rgb=True, config=CFG)
        return (jnp.abs(o["comp_rgb"] - tgt).mean()
                + 0.3 * (o["comp_mask"] ** 2).mean())

    def loss_oracle(xyz, scaling, rotation, opacity, shs):
        gg = g.__class__(xyz=xyz, opacity=opacity, rotation=rotation,
                         scaling=scaling, shs=shs)
        img, alpha, _ = oracle_render(gg, cam, hw, bg)
        return jnp.abs(img - tgt).mean() + 0.3 * (alpha ** 2).mean()

    args = (g.xyz, g.scaling, g.rotation, g.opacity, g.shs)
    t0 = time.time()
    gp = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4)))(*args)
    jax.block_until_ready(gp)
    print(f"[t] bwd compile+run {time.time() - t0:.1f}s", flush=True)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2, 3, 4))(*args)
    for name, a, b in zip(["xyz", "scaling", "rotation", "opacity", "shs"],
                          gp, go):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a, b, atol=2e-4 * scale, rtol=2e-3,
                                   err_msg=f"grad mismatch for {name}")
    print("[t] gradient parity OK — compiled TPU kernel matches oracle",
          flush=True)


if __name__ == "__main__":
    main()
