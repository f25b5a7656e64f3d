"""End-to-end stage deltas for the 512^2/49k bench workload on TPU.

Stage-decomposition via SEPARATE jits systematically overstates op costs
(fusion changes); this script instead times nested prefixes of the real
pipeline end-to-end and reports deltas. Varied inputs are precomputed outside
the timed loop (the axon relay caches identical execute requests).
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from guassianhand_tpu.core.gaussians import Gaussians
from guassianhand_tpu.core.camera import Camera
from guassianhand_tpu.ops.rasterize import RasterizeConfig, rasterize
from guassianhand_tpu.ops import binning as binning_lib
from guassianhand_tpu.ops.projection import project_gaussians

HW = 512
N = 49152
ITERS = 10


def make_inputs():
    rng = np.random.RandomState(0)
    xyz = rng.uniform(-0.5, 0.5, (N, 3)).astype(np.float32)
    q = rng.normal(size=(N, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    gs = Gaussians(
        xyz=jnp.asarray(xyz),
        opacity=jnp.asarray(rng.uniform(0.3, 0.9, (N, 1)).astype(np.float32)),
        rotation=jnp.asarray(q),
        scaling=jnp.asarray(rng.uniform(0.002, 0.01, (N, 3)).astype(np.float32)),
        shs=jnp.asarray(rng.uniform(0, 1, (N, 1, 3)).astype(np.float32)),
    )
    f = 1.1 * HW
    K = np.array([[f, 0, HW / 2], [0, f, HW / 2], [0, 0, 1]], np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 1.8
    cam = Camera.from_w2c(w2c, K, HW, HW)
    tgt = jnp.asarray(rng.uniform(0, 1, (HW, HW, 3)).astype(np.float32))
    # per-process salt: the relay caches identical execute requests across
    # processes, so fixed-seed perturbations make a RE-run of this script
    # silently free (returns cached results; timings collapse to ~0)
    salt = np.random.RandomState((os.getpid() * 2654435761 + int(time.time()))
                                 % (2**31 - 1))
    varied = [jnp.asarray(xyz + 1e-6 * salt.normal(size=xyz.shape)
                          .astype(np.float32)) for _ in range(ITERS)]
    return gs, cam, tgt, varied


def timed(name, fn, varied):
    out = fn(varied[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for v in varied:
        out = fn(v)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / len(varied) * 1e3
    print(f"[t] {name:28s} {dt:7.2f} ms", flush=True)
    return dt


def main():
    from guassianhand_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    # the bench.py configuration (M=9, 3.0-pair budget) so stage deltas
    # decompose the SAME 15 ms step the headline number reports
    cfg = RasterizeConfig(max_tiles_per_gaussian=9, pairs_per_gaussian=3.0)
    gs, cam, tgt, varied = make_inputs()
    print(f"[t] backend: {jax.devices()[0].platform}", flush=True)

    def full_grad(xyz):
        def loss(xyz, scaling, rotation, opacity, shs):
            g = Gaussians(xyz=xyz, opacity=opacity, rotation=rotation,
                          scaling=scaling, shs=shs)
            out = rasterize(g, cam, height=HW, width=HW, use_rgb=True,
                            config=cfg)
            return (jnp.abs(out["comp_rgb"] - tgt).mean()
                    + (out["comp_mask"] ** 2).mean())
        return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
            xyz, gs.scaling, gs.rotation, gs.opacity, gs.shs)

    def fwd_only(xyz):
        g = Gaussians(xyz=xyz, opacity=gs.opacity, rotation=gs.rotation,
                      scaling=gs.scaling, shs=gs.shs)
        out = rasterize(g, cam, height=HW, width=HW, use_rgb=True, config=cfg)
        return (jnp.abs(out["comp_rgb"] - tgt).mean()
                + (out["comp_mask"] ** 2).mean())

    def proj_binning(xyz):
        proj = project_gaussians(xyz, gs.scaling, gs.rotation, cam)
        b = binning_lib.bin_gaussians(
            proj.mean2d, proj.depth, proj.radius, proj.visible,
            height=HW, width=HW, cfg=cfg.binning())
        return (b.n_pairs, b.overflow,
                jnp.sum(proj.conic) + jnp.sum(proj.mean2d),
                jnp.sum(b.pair_gidx))

    def proj_binning_grad(xyz):
        # projection fwd+bwd + binning. The binning outputs must feed the
        # RETURNED value with a real (non-multiplied-by-zero) dependency or
        # XLA dead-code-eliminates the whole sort and the delta lies.
        def loss(xyz, scaling, rotation):
            proj = project_gaussians(xyz, scaling, rotation, cam)
            b = binning_lib.bin_gaussians(
                proj.mean2d, proj.depth, proj.radius, proj.visible,
                height=HW, width=HW, cfg=cfg.binning())
            return (jnp.sum(proj.conic) + jnp.sum(proj.mean2d),
                    jnp.sum(b.pair_gidx))
        g, aux = jax.grad(loss, argnums=(0, 1, 2), has_aux=True)(
            xyz, gs.scaling, gs.rotation)
        return g, aux

    def proj_only(xyz):
        proj = project_gaussians(xyz, gs.scaling, gs.rotation, cam)
        return jnp.sum(proj.conic) + jnp.sum(proj.mean2d) + jnp.sum(proj.depth)

    t_full = timed("full grad step", jax.jit(full_grad), varied)
    t_fwd = timed("forward only", jax.jit(fwd_only), varied)
    t_pbg = timed("proj(fwd+bwd)+binning", jax.jit(proj_binning_grad), varied)
    t_pb = timed("proj+binning fwd", jax.jit(proj_binning), varied)
    t_p = timed("proj fwd only", jax.jit(proj_only), varied)

    print(f"[t] ---- deltas ----", flush=True)
    print(f"[t] composite+glue fwd       {t_fwd - t_pb:7.2f} ms", flush=True)
    print(f"[t] full bwd tail            {t_full - t_fwd:7.2f} ms", flush=True)
    print(f"[t] binning (incl sort)      {t_pb - t_p:7.2f} ms", flush=True)
    print(f"[t] rays/s full: {HW * HW / t_full * 1e3 / 1e6:.2f} M", flush=True)


def model_profile():
    """Full fit-step stage breakdown (VERDICT r2 weak-item 6): nested
    prefixes of the one-shot model pipeline, timed end-to-end on the bench
    scene (256^2, two subdivided hands, ~24.7k query points — the
    reference's fitting workload, dataset_one_shot.py:321-325,797).
    Reports model-level steps/s alongside the rasterizer rays/s."""
    from guassianhand_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    from guassianhand_tpu.data.synthetic import (SyntheticHandScene,
                                                 synthetic_batch)
    from guassianhand_tpu.models.one_shot import (OneShotAvatarModel,
                                                  OneShotConfig)
    from guassianhand_tpu.render.renderer import RendererConfig
    from guassianhand_tpu.train.fit import (FitConfig, make_fit_step,
                                            make_optimizer)
    from guassianhand_tpu.train.losses import LossWeights

    hw = 256
    raster = RasterizeConfig(max_tiles_per_gaussian=8)
    # GH_PROF_SCAN=1 runs the lax.scan transformer stacks (several-fold
    # faster compile, same math — but the scan backward costs ~14 ms/step:
    # carries re-materialize and cross-layer fusion is blocked). Default
    # matches OneShotConfig.backbone_scan=False, the deploy configuration.
    scan = os.environ.get("GH_PROF_SCAN", "0") == "1"
    # GH_PROF_BF16=1 measures the mixed-precision feature pipeline
    # (OneShotConfig.compute_dtype="bfloat16"; VERDICT r3 item 1)
    bf16 = os.environ.get("GH_PROF_BF16", "0") == "1"
    cfg = OneShotConfig(backbone_scan=scan,
                        compute_dtype="bfloat16" if bf16 else None,
                        renderer=RendererConfig(raster=raster))
    scene = SyntheticHandScene.build(n_vertices=778, subdivide=2, height=hw,
                                     width=hw)
    print(f"[t] backend: {jax.devices()[0].platform}  "
          f"n_points={scene.n_points}", flush=True)
    batch = synthetic_batch(scene, seed=0, raster=raster)
    model = OneShotAvatarModel(cfg=cfg)
    # jit the init: eager-mode init materializes every intermediate of the
    # full forward at once (no liveness analysis) and can OOM the chip
    params = jax.jit(model.init, static_argnums=(2, 3))(
        jax.random.PRNGKey(0), batch, hw, hw)

    # The reference applies lambda_vgg=0.1 on EVERY fitting step
    # (config/one_shot.json lambdas; utils.py:120-280), so the profiled step
    # includes it by default — pretrained weights are not needed to MEASURE
    # it (a random-init VGG19 has identical FLOPs). GH_PROF_VGG=0 reproduces
    # the round-3 vgg-less row.
    vgg_on = os.environ.get("GH_PROF_VGG", "1") == "1"
    vgg_fn = None
    if vgg_on:
        from guassianhand_tpu.train.vgg import VGGLoss
        vgg_fn = VGGLoss()
        print(f"[t] vgg loss: ON (pretrained={vgg_fn.pretrained})",
              flush=True)
    fit_cfg = FitConfig(weights=LossWeights(vgg=0.1 if vgg_on else 0.0))
    optimizer = make_optimizer(params, fit_cfg)
    opt_state = optimizer.init(params)
    step_fn = make_fit_step(lambda p, b: model.apply(p, b, hw, hw), vgg_fn,
                            optimizer, fit_cfg)

    # Varied batches so the relay cannot cache identical executions —
    # salted per process (a fixed seed is still cacheable across re-runs).
    rng = np.random.RandomState((os.getpid() * 2246822519 + int(time.time()))
                                % (2**31 - 1))
    # GH_PROF_STATIC=1: fit-loop semantics — the fit-constant frozen prefix
    # (frame embeddings + shade branch) is computed ONCE per fit, not per
    # step (train/fit.py::attach_static_features); every stage below then
    # measures the cached per-step cost a user sees during one-shot fitting.
    static_on = os.environ.get("GH_PROF_STATIC", "0") == "1"
    static_feats = None
    if static_on:
        from guassianhand_tpu.train.fit import attach_static_features
        static_feats = attach_static_features(model, params,
                                              batch)["static_feats"]
        print("[t] static prefix cache: ON", flush=True)
    varied = []
    for _ in range(ITERS):
        b = dict(batch)
        b["points"] = batch["points"] + 1e-6 * jnp.asarray(
            rng.normal(size=batch["points"].shape).astype(np.float32))
        if static_feats is not None:
            b["static_feats"] = static_feats
        varied.append(b)

    # --- nested prefixes of the pipeline (each is a strict superset) ---
    # params MUST be a jit argument, not a closed-over constant: closing
    # over them bakes every weight into the serialized HLO as literals,
    # which blows past the remote-compile tunnel's request-size limit
    # (HTTP 413) and defeats the compilation cache.
    def enc_prefix(p, b):
        # embedders + PE + identity sample + BOTH pointnets + transformers
        # (stop before the renderer/rasterizer)
        return model.apply(p, b, method="features")["hidden"]

    def gauss_prefix(p, b):
        # features + Gaussian build (GSLayer heads, validity/densify,
        # appearance) — everything except projection/binning/composite
        def m_gauss(m, bb):
            feats = m.features(bb)
            qp = bb.get("points_tar", bb["points"])
            gs, uv2 = m.renderer.build_gaussians(
                feats["hidden"][0], qp[0], bb["vert_uv"][0])
            return gs.xyz, gs.opacity, gs.shs

        return model.apply(p, b, method=m_gauss)

    def fwd_full(p, b):
        out = model.apply(p, b, hw, hw)
        return out["comp_rgb"], out["comp_mask"]

    def one_step(pack, b):
        p, s = pack
        p2, s2, loss, err = step_fn(p, s, b)
        return (p2, s2), loss

    def feat_grad(p, b):
        return jax.grad(
            lambda pp: jnp.sum(model.apply(pp, b, method="features")
                               ["hidden"] ** 2))(p)

    jfeat = jax.jit(enc_prefix)
    jgauss = jax.jit(gauss_prefix)
    jfwd = jax.jit(fwd_full)
    jfgrad = jax.jit(feat_grad)
    t_feat = timed("features fwd (enc+tf+attn)",
                   lambda b: jfeat(params, b), varied)
    t_gauss = timed("features + gaussian build",
                    lambda b: jgauss(params, b), varied)
    t_fwd = timed("model fwd (.. + render)", lambda b: jfwd(params, b),
                  varied)
    t_fgrad = timed("features fwd+bwd", lambda b: jfgrad(params, b), varied)

    # fit step: donated params/opt_state thread through the loop
    pack = (jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, opt_state))
    pack, _ = one_step(pack, varied[0])
    jax.block_until_ready(pack)
    t0 = time.perf_counter()
    for b in varied:
        pack, loss = one_step(pack, b)
    jax.block_until_ready(loss)
    t_step = (time.perf_counter() - t0) / len(varied) * 1e3
    print(f"[t] {'full fit step':28s} {t_step:7.2f} ms", flush=True)

    # compiled-cost MFU estimate for the feature pipeline (flops from XLA's
    # own cost model; v5e bf16-class peak for default-precision matmuls)
    try:
        ca = jfeat.lower(params, varied[0]).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = ca.get("flops", 0.0)
        print(f"[t] features fwd: {flops/1e9:.1f} GFLOP -> "
              f"{flops / (t_feat * 1e-3) / 1e12:.2f} TFLOP/s achieved",
              flush=True)
    except Exception as e:
        print(f"[t] cost_analysis unavailable: {e!r}", flush=True)

    print("[t] ---- deltas ----", flush=True)
    print(f"[t] gaussian build fwd       {t_gauss - t_feat:7.2f} ms",
          flush=True)
    print(f"[t] project+bin+composite    {t_fwd - t_gauss:7.2f} ms",
          flush=True)
    print(f"[t] renderer+rasterizer fwd  {t_fwd - t_feat:7.2f} ms", flush=True)
    print(f"[t] features bwd tail        {t_fgrad - t_feat:7.2f} ms",
          flush=True)
    print(f"[t] render+loss bwd + opt    {t_step - t_fwd - (t_fgrad - t_feat):7.2f} ms",
          flush=True)
    print(f"[t] model steps/s: {1e3 / t_step:.2f}", flush=True)


if __name__ == "__main__":
    if "--model" in sys.argv:
        model_profile()
    else:
        main()
