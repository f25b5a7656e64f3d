"""A/B the round-5 fit-step knobs end-to-end on the real chip, ONE process.

All arms run the SHIPPED flagship semantics (bf16 feature pipeline,
narrow_color_b, static prefix cache, vgg=0.1) and differ in exactly one
knob; losses must agree (to documented reassociation noise) and overflow
must stay 0 or the arm is invalid.

  base           GH_GRIDSAMPLE_SEGSORT=0 (autodiff scatter-add backward)
  gs_segsort     sorted segment-sum grid-sample backward (ops/grid_sample)
  + raster.budget  tighter fit-scene enumeration/slab budgets (overflow-
                   guarded: the err dict's overflow must be 0)
  + attn_chunk     interaction-attention chunk re-sweep under bf16

Usage: python scripts/ab_fit_knobs.py [--iters 10]
"""
import argparse
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def build(raster_kw, cfg_kw):
    from guassianhand_tpu.data.synthetic import (SyntheticHandScene,
                                                 synthetic_batch)
    from guassianhand_tpu.models.one_shot import (OneShotAvatarModel,
                                                  OneShotConfig)
    from guassianhand_tpu.ops.rasterize import RasterizeConfig
    from guassianhand_tpu.render.renderer import RendererConfig

    hw = 256
    raster = RasterizeConfig(**{"max_tiles_per_gaussian": 8, **raster_kw})
    cfg = OneShotConfig(compute_dtype="bfloat16", narrow_color_b=True,
                        renderer=RendererConfig(raster=raster), **cfg_kw)
    scene = SyntheticHandScene.build(n_vertices=778, subdivide=2, height=hw,
                                     width=hw)
    batch = synthetic_batch(scene, seed=0, raster=raster)
    model = OneShotAvatarModel(cfg=cfg)
    params = jax.jit(model.init, static_argnums=(2, 3))(
        jax.random.PRNGKey(0), batch, hw, hw)
    return model, params, batch, hw


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--arms", default=None)
    args = ap.parse_args()

    from guassianhand_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    from guassianhand_tpu.train.fit import (FitConfig, attach_static_features,
                                            make_fit_step, make_optimizer)
    from guassianhand_tpu.train.losses import LossWeights
    from guassianhand_tpu.train.vgg import VGGLoss

    fit_cfg = FitConfig(weights=LossWeights(vgg=0.1))
    vgg_fn = VGGLoss()
    rng = np.random.RandomState((os.getpid() * 2246822519 + int(time.time()))
                                % (2**31 - 1))

    # Fit-scene need analysis (compact-walk enumeration, CPU, init params):
    # live max 4, 61,447 live pairs = 2.0/gaussian. walk_cells=25 culls
    # every rect cell, so M bounds LIVE need: M5/b2.75 halves the sort rows
    # AND the slab budget vs legacy M8/b4.5 with 25%/37% headroom; M4/b2.5
    # is the measured-tight floor. Legacy M9 (overflow-0 without the walk)
    # measured 86.37 ms (+5.9) and is out. Backbone arms probe the two
    # attention-backward HBM knobs (nn/transformer.py).
    all_arms = [
        ("base M8 b4.5", "0", {}, {}),
        ("walk25 M5 b2.75 pk", "0",
         {"max_tiles_per_gaussian": 5, "pairs_per_gaussian": 2.75,
          "walk_cells": 25, "pack_rgb": True}, {}),
        ("walk25 M4 b2.5 pk", "0",
         {"max_tiles_per_gaussian": 4, "pairs_per_gaussian": 2.5,
          "walk_cells": 25, "pack_rgb": True}, {}),
        ("sm_bf16", "0", {}, {"backbone_softmax_fp32": False}),
        ("attn_remat", "0", {}, {"backbone_attn_remat": True}),
        ("sm_bf16+remat", "0", {}, {"backbone_softmax_fp32": False,
                                    "backbone_attn_remat": True}),
        ("walk4+sm_bf16+remat", "0",
         {"max_tiles_per_gaussian": 4, "pairs_per_gaussian": 2.5,
          "walk_cells": 25, "pack_rgb": True},
         {"backbone_softmax_fp32": False, "backbone_attn_remat": True}),
        ("walk4+remat", "0",
         {"max_tiles_per_gaussian": 4, "pairs_per_gaussian": 2.5,
          "walk_cells": 25, "pack_rgb": True},
         {"backbone_attn_remat": True}),
        ("walk4+smr+segred", "0",
         {"max_tiles_per_gaussian": 4, "pairs_per_gaussian": 2.5,
          "walk_cells": 25, "pack_rgb": True, "segreduce_pallas": True},
         {"backbone_softmax_fp32": False, "backbone_attn_remat": True}),
        ("walk4+smr+chunk512", "0",
         {"max_tiles_per_gaussian": 4, "pairs_per_gaussian": 2.5,
          "walk_cells": 25, "pack_rgb": True},
         {"backbone_softmax_fp32": False, "backbone_attn_remat": True,
          "attn_chunk": 512}),
        ("walk4b2.25+smr", "0",
         {"max_tiles_per_gaussian": 4, "pairs_per_gaussian": 2.25,
          "walk_cells": 25, "pack_rgb": True},
         {"backbone_softmax_fp32": False, "backbone_attn_remat": True}),
    ]
    # --arms lets a follow-up process rerun a SUBSET (comma-separated
    # substrings) with one already-measured anchor arm for cross-process
    # comparability — full-program recompiles after a source edit don't fit
    # one timeout window otherwise.
    if args.arms:
        keys = [k.strip() for k in args.arms.split(",")]
        arms = [a for a in all_arms
                if any(k in a[0] for k in keys)]
    else:
        arms = all_arms

    print(f"[t] backend={jax.devices()[0].platform} iters={args.iters}",
          flush=True)
    for name, seg, raster_kw, cfg_kw in arms:
        os.environ["GH_GRIDSAMPLE_SEGSORT"] = seg
        model, params, batch, hw = build(raster_kw, cfg_kw)
        batch = attach_static_features(model, params, batch)
        optimizer = make_optimizer(params, fit_cfg)
        opt_state = optimizer.init(params)
        step_fn = make_fit_step(lambda p, b: model.apply(p, b, hw, hw),
                                vgg_fn, optimizer, fit_cfg)
        varied = []
        for _ in range(args.iters):
            b = dict(batch)
            b["points"] = batch["points"] + 1e-6 * jnp.asarray(
                rng.normal(size=batch["points"].shape).astype(np.float32))
            varied.append(b)
        params, opt_state, loss, err = step_fn(params, opt_state, varied[0])
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for b in varied:
            params, opt_state, loss, err = step_fn(params, opt_state, b)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        ov = int(err.get("overflow", jnp.zeros(()))) if err else 0
        print(f"[t] {name:22s} {dt:7.2f} ms  loss {float(loss):.5f} "
              f"overflow {ov}", flush=True)


if __name__ == "__main__":
    main()
