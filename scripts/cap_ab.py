"""interaction_cap A/B in the regime it targets (VERDICT r3 item 5).

The synthetic random-pose scene trips the order-sensitive kNN-agreement
detector (ops/knn.py::interaction_mask) on ~97% of points, so a cap can
only lose there (measured: 85.1 -> 92.8 ms/step at cap~=N). The regime the
reference's interacting-subset attention exploits
(renderer_one_shot.py:554-574) is a CONTACT BAND: a small fraction of
points near the other hand. This script prescribes such a band directly
(points within a slab around the inter-hand midplane), then A/Bs the fit
step capped vs uncapped at the same bf16 flagship config:

  - uncapped: blockwise attention over all N=15,404 rows, O(N^2)
  - cap=C:    gather first C interacting rows, attend O(C^2), scatter back

Exactness: with overflow == 0 the capped forward equals the uncapped one
on interacting rows (non-interacting rows pass through unchanged) — also
asserted here on the first step's loss.

Usage: python scripts/cap_ab.py [--steps 20] [--hw 256] [--band 0.02]
"""
import argparse
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def run(cap, steps, hw, batch, raster):
    from guassianhand_tpu.models.one_shot import (OneShotAvatarModel,
                                                  OneShotConfig)
    from guassianhand_tpu.render.renderer import RendererConfig
    from guassianhand_tpu.train.fit import (FitConfig, make_fit_step,
                                            make_optimizer)
    from guassianhand_tpu.train.losses import LossWeights
    from guassianhand_tpu.train.vgg import VGGLoss

    cfg = OneShotConfig(compute_dtype="bfloat16", interaction_cap=cap,
                        renderer=RendererConfig(raster=raster))
    model = OneShotAvatarModel(cfg=cfg)
    params = jax.jit(model.init, static_argnums=(2, 3))(
        jax.random.PRNGKey(0), batch, hw, hw)
    fit_cfg = FitConfig(weights=LossWeights(vgg=0.1))
    optimizer = make_optimizer(params, fit_cfg)
    opt_state = optimizer.init(params)
    step_fn = make_fit_step(lambda p, b: model.apply(p, b, hw, hw),
                            VGGLoss(), optimizer, fit_cfg)
    params, opt_state, loss0, err = step_fn(params, opt_state, batch)
    jax.block_until_ready(loss0)
    t0 = time.perf_counter()
    for _ in range(steps - 1):
        params, opt_state, loss, err = step_fn(params, opt_state, batch)
    jax.block_until_ready(loss)
    ms = 1e3 * (time.perf_counter() - t0) / max(steps - 1, 1)
    ov = float(err.get("interaction_overflow", 0.0))
    tag = f"cap={cap}" if cap else "uncapped"
    print(f"[cap_ab] {tag:12s} {ms:7.2f} ms/step  first-step loss "
          f"{float(loss0):.6f}  overflow {ov:.0f}", flush=True)
    return ms, float(loss0), ov


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--band", type=float, default=0.02)
    args = ap.parse_args()

    from guassianhand_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    from guassianhand_tpu.data.synthetic import (SyntheticHandScene,
                                                 synthetic_batch)
    from guassianhand_tpu.ops.rasterize import RasterizeConfig

    raster = RasterizeConfig(max_tiles_per_gaussian=8)
    scene = SyntheticHandScene.build(n_vertices=778, subdivide=2,
                                     height=args.hw, width=args.hw)
    batch = synthetic_batch(scene, seed=0, raster=raster)

    # Prescribe a contact band: points within +-band of the inter-hand
    # midplane in posed space (the slab where two near hands actually meet).
    pts = np.asarray(batch["points"][0])
    nr = scene.plans_r[-1].n_vertices_out
    mid = 0.5 * (pts[:nr, 0].max() + pts[nr:, 0].min())
    band_mask = np.abs(pts[:, 0] - mid) < args.band
    n_inter = int(band_mask.sum())
    batch["inter_mask"] = jnp.asarray(band_mask)[None]
    print(f"[cap_ab] backend={jax.devices()[0].platform} n={scene.n_points} "
          f"contact-band interacting={n_inter} "
          f"({100.0 * n_inter / scene.n_points:.1f}%)", flush=True)

    # cap: next multiple of 1024 above the band (the attention chunk size)
    cap = int(-(-n_inter // 1024) * 1024)
    ms_un, loss_un, _ = run(None, args.steps, args.hw, batch, raster)
    ms_cap, loss_cap, ov = run(cap, args.steps, args.hw, batch, raster)
    print(f"[cap_ab] speedup {ms_un / ms_cap:.2f}x  "
          f"first-step loss delta {abs(loss_un - loss_cap):.2e}  "
          f"(exact while overflow==0)", flush=True)
    assert ov == 0, "cap overflowed — raise cap"


if __name__ == "__main__":
    main()
