"""BASELINE.json config #2: ~100k-Gaussian posed hand, 512^2 novel-view render.

Builds the synthetic two-hand scene (MANO-shaped geometry; no licensed assets
needed), subdivided to ~100k Gaussians, and renders V novel views at 512^2
through the multiview stacked-canvas rasterizer. Prints one JSON line with
per-view forward latency on the current backend.

Usage:  python scripts/render_100k.py [--views 8] [--interpret]
(--interpret for a CPU smoke run at reduced size; real numbers need the TPU.)
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    from guassianhand_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke mode: small scene, Pallas interpret")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")

    from guassianhand_tpu.data.rays import orbit_cameras
    from guassianhand_tpu.data.synthetic import SyntheticHandScene
    from guassianhand_tpu.ops.rasterize import (RasterizeConfig,
                                                rasterize_multiview)

    hw = 128 if args.interpret else 512
    subdivide = 1 if args.interpret else 3   # 2 hands x 778 verts x 4^3 ~ 100k
    scene = SyntheticHandScene.build(n_vertices=778, subdivide=subdivide,
                                     height=hw, width=hw)
    # MANO-LBS-posed, subdivided vertices -> on-mesh Gaussians
    pose = jnp.zeros((16, 3)).at[3, 2].set(0.4)   # a bent-finger pose
    points = scene.pose_points(pose, pose)
    g = scene.decoration_gaussians(points)
    n = int(g.xyz.shape[0])

    center = np.asarray(jnp.mean(g.xyz, axis=0))
    radius = float(np.asarray(jnp.max(
        jnp.linalg.norm(g.xyz - center[None], axis=1)))) * 3.0
    w2cs, Ks = orbit_cameras(center, radius, scene.K, n_views=args.views)
    w2cs = jnp.asarray(w2cs)
    Ks = jnp.asarray(Ks)

    cfg = RasterizeConfig(interpret=args.interpret)
    fn = jax.jit(lambda w, k: rasterize_multiview(
        g, w, k, height=hw, width=hw, use_rgb=True, config=cfg))

    out = fn(w2cs, Ks)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 1 if args.interpret else 5
    for _ in range(reps):
        out = fn(w2cs, Ks)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps

    print(json.dumps({
        "metric": f"novel-view render {hw}x{hw}, {n} gaussians, "
                  f"{args.views} views (BASELINE config #2)",
        "ms_per_view": round(1e3 * dt / args.views, 2),
        "n_pairs": int(out["n_pairs"]),
        "overflow": int(out["overflow"]),
        "backend": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
