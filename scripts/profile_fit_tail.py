"""Decompose the fit-step backward tail with end-to-end A/B deltas
(VERDICT r4 item 1a).

The per-op device trace CANNOT decompose this program: per-op tracing
inflates the 6000-op unrolled fit step ~4.5x (docs/TRACE_FIT_STEP.md), so
per-op percentages come from a perturbed schedule. This script instead
times VARIANTS of the real step end-to-end in ONE process (relay-proof:
salted varied inputs, sequential arms) and reports the deltas, which sum
against the full step:

  full            the shipped fit step (bf16, vgg, static prefix cache)
  fwd_loss        forward + loss only (no grad, no update)
  no_vgg          full step with the VGG term off
  detach_feats    full step with stop_gradient at the feature/render
                  boundary (no feature-pipeline dX backward)
  grad_only       value_and_grad but NO optimizer update/apply
  narrow_cb       full step with OneShotConfig.narrow_color_b (color_b
                  stored as the consumed rgb triple: 16x less Adam traffic)

Derived attribution:
  backward+opt total   = full - fwd_loss
  VGG fwd+bwd          = full - no_vgg
  feature-pipeline dX  = full - detach_feats
  optimizer update     = full - grad_only
  color_b Adam churn   = full - narrow_cb
  render+loss backward = (full - fwd_loss) - (full - detach_feats)
                          - (full - grad_only)   [remainder]

Usage: python scripts/profile_fit_tail.py [--iters 10]
Env:   GH_PROF_BF16=0  fp32 feature pipeline (default bf16 = shipped)
       GH_PROF_VGG=0   drop the VGG arm entirely
"""
import argparse
import dataclasses
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def build(cfg_overrides=None):
    from guassianhand_tpu.data.synthetic import (SyntheticHandScene,
                                                 synthetic_batch)
    from guassianhand_tpu.models.one_shot import (OneShotAvatarModel,
                                                  OneShotConfig)
    from guassianhand_tpu.ops.rasterize import RasterizeConfig
    from guassianhand_tpu.render.renderer import RendererConfig

    tiny = os.environ.get("GH_PROF_TINY", "0") == "1"  # CPU smoke only
    hw = 64 if tiny else 256
    raster = RasterizeConfig(max_tiles_per_gaussian=8, interpret=tiny)
    bf16 = os.environ.get("GH_PROF_BF16", "1") == "1"
    cfg = OneShotConfig(compute_dtype="bfloat16" if bf16 else None,
                        renderer=RendererConfig(raster=raster),
                        **(cfg_overrides or {}))
    scene = SyntheticHandScene.build(n_vertices=778, subdivide=1 if tiny
                                     else 2, height=hw, width=hw)
    batch = synthetic_batch(scene, seed=0, raster=raster)
    model = OneShotAvatarModel(cfg=cfg)
    params = jax.jit(model.init, static_argnums=(2, 3))(
        jax.random.PRNGKey(0), batch, hw, hw)
    return model, params, batch, scene, hw


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from guassianhand_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    from guassianhand_tpu.train.fit import (FitConfig, attach_static_features,
                                            make_fit_step, make_optimizer)
    from guassianhand_tpu.train.losses import LossWeights, compute_error

    model, params, batch, scene, hw = build()
    print(f"[t] backend={jax.devices()[0].platform} n={scene.n_points} "
          f"iters={args.iters}", flush=True)

    vgg_on = os.environ.get("GH_PROF_VGG", "1") == "1"
    vgg_fn = None
    if vgg_on:
        from guassianhand_tpu.train.vgg import VGGLoss
        vgg_fn = VGGLoss()
    fit_cfg = FitConfig(weights=LossWeights(vgg=0.1 if vgg_on else 0.0))

    # shipped fit semantics: static prefix cached once per fit
    batch = attach_static_features(model, params, batch)

    # per-process salt (the relay caches identical execute requests)
    rng = np.random.RandomState((os.getpid() * 2246822519 + int(time.time()))
                                % (2**31 - 1))
    varied = []
    for _ in range(args.iters):
        b = dict(batch)
        b["points"] = batch["points"] + 1e-6 * jnp.asarray(
            rng.normal(size=batch["points"].shape).astype(np.float32))
        varied.append(b)

    def timed_step(name, step_fn, params0, opt_state0):
        pack = (jax.tree.map(jnp.copy, params0),
                jax.tree.map(jnp.copy, opt_state0))
        pack_p, pack_s, loss, _ = step_fn(pack[0], pack[1], varied[0])
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for b in varied:
            pack_p, pack_s, loss, _ = step_fn(pack_p, pack_s, b)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / len(varied) * 1e3
        print(f"[t] {name:16s} {dt:7.2f} ms  (loss {float(loss):.5f})",
              flush=True)
        return dt

    results = {}

    def arm(name, model_arm, params_arm, fit_cfg_arm, vgg_arm,
            grad_only=False, detach=False):
        def model_apply(p, b):
            return model_arm.apply(p, b, hw, hw, detach_features=detach)

        optimizer = make_optimizer(params_arm, fit_cfg_arm)
        opt_state = optimizer.init(params_arm)
        if grad_only:
            from guassianhand_tpu.train.fit import stop_frozen

            def loss_fn(p, b):
                p = stop_frozen(p)
                out = model_apply(p, b)
                total, err = compute_error(
                    out["comp_rgb"][:, 0], b["target_rgb"],
                    out["comp_mask"][:, 0], b["target_mask"],
                    vgg_arm, fit_cfg_arm.weights)
                return total, err

            @jax.jit
            def step_fn(p, s, b):
                (loss, err), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(p, b)
                # grads RETURNED (fully materialized, exactly as Adam would
                # consume them — returning them stops XLA dead-code-
                # eliminating the backward) but no update/apply; params
                # pass through so the timing loop threads identically
                return p, s, loss, grads
        else:
            step_fn = make_fit_step(model_apply, vgg_arm, optimizer,
                                    fit_cfg_arm)
        results[name] = timed_step(name, step_fn, params_arm, opt_state)

    # forward + loss only
    def fwd_loss(p, b):
        out = model.apply(p, b, hw, hw)
        total, _ = compute_error(out["comp_rgb"][:, 0], b["target_rgb"],
                                 out["comp_mask"][:, 0], b["target_mask"],
                                 vgg_fn, fit_cfg.weights)
        return total

    jfwd = jax.jit(fwd_loss)
    loss = jfwd(params, varied[0])
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for b in varied:
        loss = jfwd(params, b)
    jax.block_until_ready(loss)
    results["fwd_loss"] = (time.perf_counter() - t0) / len(varied) * 1e3
    print(f"[t] {'fwd_loss':16s} {results['fwd_loss']:7.2f} ms", flush=True)

    arm("full", model, params, fit_cfg, vgg_fn)
    if vgg_on:
        arm("no_vgg", model, params,
            dataclasses.replace(fit_cfg, weights=LossWeights(vgg=0.0)), None)
        from guassianhand_tpu.train.vgg import VGGLoss as _VGG
        arm("vgg_bf16", model, params, fit_cfg,
            _VGG(compute_dtype="bfloat16"))
    arm("detach_feats", model, params, fit_cfg, vgg_fn, detach=True)
    arm("grad_only", model, params, fit_cfg, vgg_fn, grad_only=True)

    # narrow color_b arm: same model family, 16x less optimizer traffic
    model_n, params_n, batch_n, _, _ = build({"narrow_color_b": True})
    batch_n = attach_static_features(model_n, params_n, batch_n)
    varied_n = []
    for i in range(args.iters):
        b = dict(batch_n)
        b["points"] = batch_n["points"] + 1e-6 * jnp.asarray(
            rng.normal(size=batch_n["points"].shape).astype(np.float32))
        varied_n.append(b)
    varied, _varied_keep = varied_n, varied  # arm() reads `varied`
    arm("narrow_cb", model_n, params_n, fit_cfg, vgg_fn)
    varied = _varied_keep

    full = results["full"]
    print("[t] ---- attribution (end-to-end deltas vs full) ----",
          flush=True)
    print(f"[t] backward+optimizer total   "
          f"{full - results['fwd_loss']:7.2f} ms", flush=True)
    if "no_vgg" in results:
        print(f"[t] VGG fwd+bwd               "
              f"{full - results['no_vgg']:7.2f} ms", flush=True)
        print(f"[t] VGG bf16 saving           "
              f"{full - results['vgg_bf16']:7.2f} ms", flush=True)
    print(f"[t] feature-pipeline dX       "
          f"{full - results['detach_feats']:7.2f} ms", flush=True)
    print(f"[t] optimizer update          "
          f"{full - results['grad_only']:7.2f} ms", flush=True)
    print(f"[t] color_b Adam churn        "
          f"{full - results['narrow_cb']:7.2f} ms", flush=True)
    rem = ((full - results["fwd_loss"])
           - (full - results["detach_feats"])
           - (full - results["grad_only"]))
    print(f"[t] render+loss bwd remainder {rem:7.2f} ms", flush=True)
    print(f"[t] steps/s full: {1e3 / full:.2f}", flush=True)


if __name__ == "__main__":
    main()
