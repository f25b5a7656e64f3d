"""Compiled-mode (non-interpret) rasterizer parity check on the real TPU.

Three legs, run every round (wired into the verify skill):

1. FORWARD vs oracle, both on TPU, strict elementwise tolerances — proves the
   compiled Pallas forward against the dense reference compositor.
2. KERNEL fwd+bwd, compiled-TPU vs interpret-CPU on byte-identical inputs
   (scripts/probe_bwd_kernel.py, spawned here) — the discriminating gradient
   test. Mosaic block-shape/DMA constraints are NOT checked by interpret mode,
   and this leg is what caught the default-precision bf16-truncated fp32
   matmuls (3e-3 forward / 5e-2 gradient error vs the 4e-5 tolerance here).
3. GRADIENT vs oracle, normwise, LOOSE (<40%) — a catastrophe tripwire only.
   Elementwise gradient parity against the oracle is ill-posed across exp
   implementations: the Pallas VPU exp, the XLA TPU exp, and the CPU exp each
   differ by ~1 ulp, which flips the discrete acceptance gates
   (alpha >= 1/255, T >= T_EPS) on borderline pairs; every flip moves that
   pair's ENTIRE gradient. Measured flip noise at this scene: oracle-on-TPU
   vs oracle-on-CPU (pure XLA, zero kernel code) already deviates 5.6%
   normwise on d/dxyz; Pallas-vs-oracle sits ~25%. Leg 2 is the exact test.

Exit code 0 = parity holds.
"""
import os
import subprocess
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

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
    from guassianhand_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    print(f"[t] backend: {jax.devices()[0].platform}", flush=True)
    hw = 96
    cam = make_camera(hw, hw)
    g = make_gaussians(512, seed=3)
    bg = jnp.array([0.1, 0.2, 0.3])

    # --- Leg 1: compiled forward vs oracle (strict) ---
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
    print("[t] leg 1: forward parity vs oracle OK", flush=True)

    # --- Leg 2: kernel fwd+bwd on identical inputs (exact, discriminating) ---
    here = os.path.dirname(os.path.abspath(__file__))
    probe = os.path.join(here, "probe_bwd_kernel.py")
    r = subprocess.run([sys.executable, probe, "gen"], capture_output=True,
                       text=True, timeout=900)
    assert r.returncode == 0, f"probe gen failed:\n{r.stdout}\n{r.stderr}"
    sys.argv = ["probe", "tpu"]
    import importlib.util
    spec = importlib.util.spec_from_file_location("probe_bwd_kernel", probe)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    try:
        mod.main()
    except SystemExit as e:
        assert e.code in (0, None), "kernel compiled-vs-interpret MISMATCH"
    print("[t] leg 2: kernel compiled-vs-interpret parity OK", flush=True)

    # --- Leg 3: gradient vs oracle, loose normwise tripwire ---
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
        rel = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)
        print(f"[t] grad {name}: normwise rel vs oracle {rel:.2e}"
              " (gate-flip noise expected, see module docstring)", flush=True)
        assert rel < 0.4, f"catastrophic grad divergence for {name}: {rel:.3e}"
    print("[t] leg 3: gradient tripwire OK — all parity legs green", flush=True)


if __name__ == "__main__":
    main()
