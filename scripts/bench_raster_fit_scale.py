"""Decompose the FIT-path rasterizer cost (r4: 'project+bin+composite fwd'
is 13.9-14.0 ms at 256^2 inside the fit step — ~2x the 512^2 standalone
bench's forward half despite 1/4 the pixels. Which part is real workload
density and which is path overhead?)

Arms (chained timing, fwd and fwd+bwd) at the EXACT fit geometry: the
synthetic two-hand scene's 2N=30,808 gaussian slots (half invalid, as the
renderer's densify emits), 256^2, M=8:

  flat-N        rasterize() with the N=15,404 originals only
  flat-2N       rasterize() with all 30,808 slots (invalid ones opacity 0)
  mv-V1         rasterize_multiview() with V=1 (the renderer's batched path)
  flat-2N-M16   the fit config's default M sweep point

Usage: python scripts/bench_raster_fit_scale.py [--iters 10]
"""
import argparse
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from timing import chain_timed  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from guassianhand_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    from guassianhand_tpu.core.camera import Camera
    from guassianhand_tpu.core.gaussians import Gaussians
    from guassianhand_tpu.data.synthetic import SyntheticHandScene
    from guassianhand_tpu.ops.rasterize import (RasterizeConfig, rasterize,
                                                rasterize_multiview)

    hw = 256
    scene = SyntheticHandScene.build(n_vertices=778, subdivide=2, height=hw,
                                     width=hw)
    pts = np.asarray(scene.pose_points(jnp.zeros(48), jnp.zeros(48)))
    n = pts.shape[0]
    rng = np.random.RandomState(0)
    cam = Camera.from_w2c(scene.w2c, scene.K, hw, hw)
    tgt = jnp.asarray(rng.uniform(0, 1, (hw, hw, 3)).astype(np.float32))

    def make_gs(n_slots, n_live):
        xyz = np.zeros((n_slots, 3), np.float32)
        xyz[:n_live] = pts[:n_live]
        xyz[n_live:] = pts[: n_slots - n_live] + 1e-4
        op = np.zeros((n_slots, 1), np.float32)
        op[:n_live] = 0.7
        sigma = 2.0 * 0.6 / (0.9 * hw)
        return Gaussians(
            xyz=jnp.asarray(xyz),
            opacity=jnp.asarray(op),
            rotation=jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32),
                              (n_slots, 1)),
            scaling=jnp.full((n_slots, 3), sigma),
            shs=jnp.asarray(rng.uniform(0, 1, (n_slots, 1, 3))
                            .astype(np.float32)))

    print(f"[t] backend={jax.devices()[0].platform} n={n} hw={hw}",
          flush=True)

    def run(tag, gs, cfg, multiview=False):
        w2cs = jnp.asarray(scene.w2c)[None]
        Ks = jnp.asarray(scene.K)[None]

        def fwd(xyz, gs=gs):
            g = Gaussians(xyz=xyz, opacity=gs.opacity, rotation=gs.rotation,
                          scaling=gs.scaling, shs=gs.shs)
            if multiview:
                out = rasterize_multiview(g, w2cs, Ks, height=hw, width=hw,
                                          use_rgb=True, config=cfg)
                return out["comp_rgb"][0]
            out = rasterize(g, cam, height=hw, width=hw, use_rgb=True,
                            config=cfg)
            return out["comp_rgb"]

        def loss(xyz):
            r = fwd(xyz)
            return jnp.abs(r - tgt).mean()

        # one overflow probe so the arms are honest
        if multiview:
            ov = rasterize_multiview(gs, w2cs, Ks, height=hw, width=hw,
                                     use_rgb=True, config=cfg)["overflow"]
            npair = 0
        else:
            d = rasterize(gs, cam, height=hw, width=hw, use_rgb=True,
                          config=cfg)
            ov, npair = d["overflow"], d["n_pairs"]
        print(f"[t] {tag}: overflow={int(ov)} n_pairs={int(npair)}",
              flush=True)
        chain_timed(f"{tag} fwd", fwd, gs.xyz, iters=args.iters)
        chain_timed(f"{tag} fwd+bwd", jax.grad(loss), gs.xyz,
                    iters=args.iters)

    cfg8 = RasterizeConfig(max_tiles_per_gaussian=8)
    run("flat-N  M8", make_gs(n, n), cfg8)
    run("flat-2N M8", make_gs(2 * n, n), cfg8)
    run("mv-V1  M8", make_gs(2 * n, n), cfg8, multiview=True)
    cfg16 = RasterizeConfig(max_tiles_per_gaussian=16)
    run("flat-2N M16", make_gs(2 * n, n), cfg16)


if __name__ == "__main__":
    main()
