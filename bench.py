"""Headline benchmark: fwd+bwd differentiable splatting throughput at 512^2.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Metric: rays/s/chip (pixels rendered per second through a full forward +
backward of the rasterizer), the north star in BASELINE.json. The reference
repo publishes no numbers (BASELINE.md); ``vs_baseline`` is computed against a
nominal 100 fps fwd+bwd at 512^2 for the CUDA reference rasterizer on a
contemporary GPU (2.62e7 rays/s) — the typical published throughput class for
diff-gaussian-rasterization training workloads at this resolution.

``value`` is the mean over GH_BENCH_REPEATS (default 5) independent timed
blocks of 20 varied-input iterations each; ``step_ms_sigma`` is the
between-block standard deviation of the per-step time — round-over-round
deltas within ~2 sigma are noise, not regressions (VERDICT r3 weak-item 2).

The object also carries the model-level number users feel (VERDICT r3
item 6): ``fit_step_ms`` / ``fit_steps_per_s`` — one full one-shot fitting
step (fwd + bwd + Adam) at the reference workload (256^2 render, two
subdivided hands, ~15.4k query points, lambda_vgg=0.1 as in
config/one_shot.json) on the flagship model config. GH_BENCH_FIT=0 skips it
(e.g. for quick rasterizer-only A/Bs).
"""
from __future__ import annotations

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from guassianhand_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

BASELINE_RAYS_PER_S = 512 * 512 * 100.0


def main():
    from guassianhand_tpu.core.gaussians import Gaussians
    from guassianhand_tpu.core.camera import Camera
    from guassianhand_tpu.ops.rasterize import RasterizeConfig, rasterize

    hw = 512
    n = 49152  # two-hand workload at the "hd" subdivision (SURVEY.md §0)
    rng = np.random.RandomState(0)
    xyz = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    gs = Gaussians(
        xyz=jnp.asarray(xyz),
        opacity=jnp.asarray(rng.uniform(0.3, 0.9, (n, 1)).astype(np.float32)),
        rotation=jnp.asarray(q),
        scaling=jnp.asarray(rng.uniform(0.002, 0.01, (n, 3)).astype(np.float32)),
        shs=jnp.asarray(rng.uniform(0, 1, (n, 1, 3)).astype(np.float32)),
    )
    f = 1.1 * hw
    K = np.array([[f, 0, hw / 2], [0, f, hw / 2], [0, 0, 1]], np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 1.8
    cam = Camera.from_w2c(w2c, K, hw, hw)
    import os

    # Tuned to this scene's measured tile-overlap stats (max need == 9 at
    # these scales; see memory: M=16 was 44% enumeration waste). The
    # overflow == 0 assertion below guards the honesty of the tuning: a cap
    # too small for the scene fails the bench instead of dropping work.
    cfg = RasterizeConfig(
        max_tiles_per_gaussian=int(os.environ.get("GH_BENCH_M", "9")),
        pairs_per_gaussian=float(os.environ.get("GH_BENCH_BUDGET", "3.0")),
        block_size=int(os.environ.get("GH_BENCH_BLOCK", "128")),
        tile_size=int(os.environ.get("GH_BENCH_TILE", "16")),
        sort_stable=os.environ.get("GH_SORT_STABLE", "1") != "0",
        # default ON since r4: 15.17 -> 14.89 ms (~9 sigma). Colors ride the
        # sort u10x3-quantized (1/1023 — under half the reference eval's
        # uint8 quantum); gradients provably exact (test_rasterize.py),
        # acceptance semantics untouched (opacity/conic stay fp32).
        pack_rgb=os.environ.get("GH_PACK_RGB", "1") == "1",
        # r5: reduce sorted pair-grads with the Pallas windowed one-hot MXU
        # kernel instead of the XLA segment_sum expansion (trace rank 3).
        # Same-process A/B (scripts/bench_segreduce.py, real v5e): 14.43 ->
        # 12.41 ms/step (+16%), gradient norms at reassociation level
        # (1e-7). Span-guarded lax.cond falls back to the exact XLA path on
        # id distributions the window can't cover (correct, just slower).
        segreduce_pallas=os.environ.get("GH_SEGREDUCE", "1") == "1")
    tgt = jnp.asarray(rng.uniform(0, 1, (hw, hw, 3)).astype(np.float32))

    def loss_fn(xyz, scaling, rotation, opacity1d, shs):
        # opacity crosses the jit boundary as (N,) — a (N, 1) f32 parameter
        # gets a degenerate T(1,128) tiling (one payload element per 128-lane
        # tile) and its entry/grad DMAs cost ~0.65 ms/step (device trace
        # rank 5, docs/TRACE_BENCH_STEP.md); the 1-D layout is dense.
        g = Gaussians(xyz=xyz, opacity=opacity1d[:, None], rotation=rotation,
                      scaling=scaling, shs=shs)
        out = rasterize(g, cam, height=hw, width=hw, use_rgb=True, config=cfg)
        return (jnp.abs(out["comp_rgb"] - tgt).mean()
                + (out["comp_mask"] ** 2).mean())

    # GH_BENCH_FWD=1: time the forward render alone (no grad) — diagnostic
    # for attributing step time between the kernels' fwd and bwd halves.
    fwd_only = os.environ.get("GH_BENCH_FWD", "0") == "1"
    step = jax.jit(loss_fn if fwd_only
                   else jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
    args = (gs.xyz, gs.scaling, gs.rotation, gs.opacity[:, 0], gs.shs)

    # The throughput claim is only honest if no (gaussian, tile) pairs were
    # dropped by the binning caps — assert, don't just count.
    diag = jax.jit(lambda xyz: rasterize(
        Gaussians(xyz=xyz, opacity=gs.opacity, rotation=gs.rotation,
                  scaling=gs.scaling, shs=gs.shs),
        cam, height=hw, width=hw, use_rgb=True, config=cfg))(gs.xyz)
    overflow = int(diag["overflow"])
    n_pairs = int(diag["n_pairs"])
    assert overflow == 0, f"binning dropped {overflow} pairs — raise caps"
    # Vary the inputs each iteration (precomputed OUTSIDE the timed loop):
    # the serving stack may cache identical execute requests, silently
    # turning a repeated-same-input loop into a no-op, and eager per-iter
    # arithmetic triggers fresh remote compiles. Verified: same-input 786k
    # sort "costs" 0.035 ms vs 22.9 ms varying; precomputed-varied full step
    # matches the same-input timing (the pipeline itself is not cacheable at
    # this size), so this measurement is honest either way.
    n_iters = 20
    repeats = int(os.environ.get("GH_BENCH_REPEATS", "5"))
    # Salt the perturbations per-process: the relay caches identical execute
    # requests ACROSS processes too (measured: a re-run with fixed-seed
    # varied inputs reported 0.04 ms/step — pure cache hits), so fixed-seed
    # perturbations make a re-run of the same bench silently free. The
    # 1e-6 jitter doesn't change the workload, only the request bytes.
    salt = np.random.RandomState((os.getpid() * 2654435761 + int(time.time()))
                                 % (2**31 - 1))
    varied = [jnp.asarray(np.asarray(gs.xyz)
                          + 1e-6 * salt.normal(size=gs.xyz.shape)
                          .astype(np.float32))
              for i in range(n_iters * repeats)]
    jax.block_until_ready(varied)
    grads = step(varied[0], *args[1:])
    jax.block_until_ready(grads)

    # >=5 independent timed blocks -> mean +- sigma, so a 1% round-over-round
    # delta is distinguishable from noise (VERDICT r3 weak-item 2). Every
    # block gets its own perturbations (no repeated requests anywhere).
    block_ms = []
    for r in range(repeats):
        t0 = time.perf_counter()
        for i in range(n_iters):
            grads = step(varied[r * n_iters + i], *args[1:])
        jax.block_until_ready(grads)
        block_ms.append(1e3 * (time.perf_counter() - t0) / n_iters)
    step_ms = float(np.mean(block_ms))
    step_sigma = float(np.std(block_ms))
    rays_per_s = hw * hw / (step_ms * 1e-3)

    result = {
        "metric": ("rays/s/chip fwd-only splatting 512^2 (49k gaussians)"
                   if fwd_only else
                   "rays/s/chip fwd+bwd splatting 512^2 (49k gaussians)"),
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        # the baseline constant is a fwd+bwd figure — a fwd-only ratio
        # against it would be a non-comparable, inflated claim
        "vs_baseline": (None if fwd_only
                        else round(rays_per_s / BASELINE_RAYS_PER_S, 4)),
        "n_pairs": n_pairs,
        "overflow": overflow,
        "step_ms": round(step_ms, 2),
        "step_ms_sigma": round(step_sigma, 3),
        "step_ms_blocks": [round(b, 2) for b in block_ms],
        "pack_rgb": cfg.pack_rgb,
    }
    if os.environ.get("GH_BENCH_FIT", "1") == "1" and not fwd_only:
        try:
            result.update(bench_fit_step())
        except Exception as e:  # never let the model leg kill the headline
            result["fit_error"] = repr(e)[:200]
    print(json.dumps(result))


def bench_fit_step(iters: int = 10):
    """One-shot fitting throughput at the reference workload: 256^2 render,
    two subdivided MANO hands (~15.4k query points), full loss incl.
    lambda_vgg=0.1 (config/one_shot.json; random-init VGG19 — identical
    FLOPs to pretrained), Adam on the per-identity leaves. This is the
    model-level number a reference user feels during one-shot fitting
    (infer_one_shot.py:314-524)."""
    from guassianhand_tpu.data.synthetic import (SyntheticHandScene,
                                                 synthetic_batch)
    from guassianhand_tpu.models.one_shot import (OneShotAvatarModel,
                                                  OneShotConfig)
    from guassianhand_tpu.render.renderer import RendererConfig
    from guassianhand_tpu.ops.rasterize import RasterizeConfig
    from guassianhand_tpu.train.fit import (FitConfig, attach_static_features,
                                            make_fit_step, make_optimizer)
    from guassianhand_tpu.train.losses import LossWeights
    from guassianhand_tpu.train.vgg import VGGLoss

    hw = 256
    # flagship raster (configs/one_shot.yaml): r5 compact-walk enumeration —
    # M bounds LIVE tile need (measured max 4 at this scene), overflow is an
    # exact live count (the legacy M8 leg silently dropped 202 rect
    # cells/step), and the pair sort halves its rows. A/B: 81.2 -> 70.5 ms.
    # GH_BENCH_FIT_WALK=0 restores the legacy M8 enumeration.
    if os.environ.get("GH_BENCH_FIT_WALK", "1") == "1":
        raster = RasterizeConfig(max_tiles_per_gaussian=4,
                                 pairs_per_gaussian=2.5, walk_cells=25,
                                 pack_rgb=True)
    else:
        raster = RasterizeConfig(max_tiles_per_gaussian=8)
    dt = os.environ.get("GH_BENCH_FIT_DTYPE", "bfloat16") or None
    # narrow color_b (flagship default, configs/one_shot.yaml): bit-identical
    # fit (tests/test_model.py::test_narrow_color_b_equivalence), 16x less
    # Adam HBM traffic on the 1024x2048 residual map. GH_BENCH_FIT_NARROW=0
    # benches the reference 48-channel layout.
    narrow = os.environ.get("GH_BENCH_FIT_NARROW", "1") == "1"
    cfg = OneShotConfig(compute_dtype=None if dt in ("", "none", "fp32")
                        else dt, narrow_color_b=narrow,
                        # flash-style attention-core remat in the backbone
                        # backward (bit-exact; configs/one_shot.yaml)
                        backbone_attn_remat=os.environ.get(
                            "GH_BENCH_FIT_REMAT", "1") == "1",
                        # bf16 backbone softmax: quality-gated like the rest
                        # of the bf16 pipeline (scripts/bf16_psnr_gate.py)
                        backbone_softmax_fp32=os.environ.get(
                            "GH_BENCH_FIT_SMFP32", "0") == "1",
                        renderer=RendererConfig(raster=raster))
    scene = SyntheticHandScene.build(n_vertices=778, subdivide=2, height=hw,
                                     width=hw)
    batch = synthetic_batch(scene, seed=0, raster=raster)
    model = OneShotAvatarModel(cfg=cfg)
    params = jax.jit(model.init, static_argnums=(2, 3))(
        jax.random.PRNGKey(0), batch, hw, hw)
    fit_cfg = FitConfig(weights=LossWeights(vgg=0.1))
    optimizer = make_optimizer(params, fit_cfg)
    opt_state = optimizer.init(params)
    step_fn = make_fit_step(lambda p, b: model.apply(p, b, hw, hw),
                            VGGLoss(), optimizer, fit_cfg)
    static_cache = (os.environ.get("GH_BENCH_FIT_STATIC", "1") == "1"
                    and fit_cfg.static_prefix_cache)
    if static_cache:
        # fit-loop semantics: the frozen prefix is computed once per fit
        # (one-shot refits one constant frame), not once per step
        batch = attach_static_features(model, params, batch)

    # per-process salt: see the rasterizer leg — a re-run replays the same
    # deterministic request sequence otherwise, which the relay can cache
    rng = np.random.RandomState((os.getpid() * 2246822519 + int(time.time()))
                                % (2**31 - 1))
    varied = []
    for _ in range(iters):
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
    ms = 1e3 * (time.perf_counter() - t0) / iters
    return {"fit_step_ms": round(ms, 2),
            "fit_steps_per_s": round(1e3 / ms, 2),
            "fit_overflow": int(err.get("overflow", jnp.zeros(())))
            if err else 0,
            "fit_workload": f"{hw}^2, n={scene.n_points}, vgg=0.1, "
                            f"dtype={cfg.compute_dtype or 'float32'}, "
                            f"static_cache={int(static_cache)}, "
                            f"narrow_cb={int(narrow)}, "
                            f"walk={raster.walk_cells}/M{raster.max_tiles_per_gaussian}, "
                            f"attn_remat={int(cfg.backbone_attn_remat)}, "
                            f"sm_fp32={int(cfg.backbone_softmax_fp32)}"}


if __name__ == "__main__":
    main()
