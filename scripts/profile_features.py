"""Per-stage fwd and fwd+bwd timings for the FEATURE pipeline (the 62.7 ms
backward tail in the r4 bf16 profile — docs/TRACE_FIT_STEP.md is too
distorted by per-op tracing to decompose it, so this measures each stage as
its own jit on realistic shapes).

Isolated jits overstate absolute costs (lost fusion) — read as a RANKING.

Usage: python scripts/profile_features.py            # bf16 (flagship)
       GH_PROF_BF16=0 python scripts/profile_features.py
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


sys.path.insert(0, "/root/repo/scripts")
from timing import chain_timed  # noqa: E402  (relay-proof chained timing)

_SALT = np.random.RandomState()


def main():
    from guassianhand_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    from guassianhand_tpu.data.synthetic import (SyntheticHandScene,
                                                 synthetic_batch)
    from guassianhand_tpu.models.one_shot import (OneShotAvatarModel,
                                                  OneShotConfig)
    from guassianhand_tpu.render.renderer import RendererConfig
    from guassianhand_tpu.ops.rasterize import RasterizeConfig

    hw = 256
    raster = RasterizeConfig(max_tiles_per_gaussian=8)
    bf16 = os.environ.get("GH_PROF_BF16", "1") == "1"
    cfg = OneShotConfig(compute_dtype="bfloat16" if bf16 else None,
                        renderer=RendererConfig(raster=raster))
    scene = SyntheticHandScene.build(n_vertices=778, subdivide=2, height=hw,
                                     width=hw)
    batch = synthetic_batch(scene, seed=0, raster=raster)
    model = OneShotAvatarModel(cfg=cfg)
    params = jax.jit(model.init, static_argnums=(2, 3))(
        jax.random.PRNGKey(0), batch, hw, hw)
    n = scene.n_points
    b = 1
    s = cfg.plane_size
    print(f"[f] backend={jax.devices()[0].platform} n={n} "
          f"dtype={cfg.compute_dtype or 'float32'}", flush=True)

    rng = np.random.RandomState(0)

    def arr(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32))

    tex_in = arr(b, n, 53)
    shade_in = arr(b, n, 1587)
    cond = arr(b, 512, s, s)
    tokens = arr(b, 512, cfg.n_plane * s * s)
    planes = arr(b, cfg.n_plane, 512, s, s)
    add_in = arr(b, n, 852)
    hidden = arr(b, n, 131)
    mask = batch["inter_mask"]

    def stage(name, method, x, grad_wrt_x=True):
        # each leg guarded: the remote XLA compiler reproducibly SIGILLs on
        # the ISOLATED grad-of-self_attn HLO (TpuPriorityFusionQueue crash;
        # the same attention backward compiles fine inside the full fit
        # step) — keep profiling the remaining stages
        try:
            chain_timed(f"{name} fwd",
                        lambda v, p: model.apply(p, v, method=method),
                        x, params)
        except Exception as e:
            print(f"[t] {name} fwd FAILED: {repr(e)[:120]}", flush=True)
        if grad_wrt_x:
            try:
                g = jax.grad(
                    lambda v, p: jnp.sum(model.apply(p, v, method=method)
                                         .astype(jnp.float32)), argnums=0)
                chain_timed(f"{name} fwd+bwd(dX)", g, x, params)
            except Exception as e:
                print(f"[t] {name} fwd+bwd FAILED: {repr(e)[:120]}",
                      flush=True)

    stage("point_encoder_texture (N,53)",
          lambda m, v: m.point_encoder_texture(v), tex_in)
    stage("point_encoder_shade (N,1587)",
          lambda m, v: m.point_encoder_shade(v), shade_in)
    stage("tokenizer_texture (tokenize)",
          lambda m, v: m.tokenizer_texture(v), cond)
    stage("backbone (512 x 2048 tokens, 10L)",
          lambda m, v: m.backbone(v), tokens)
    stage("backbone_shade",
          lambda m, v: m.backbone_shade(v), tokens)
    stage("detokenize+post_processor",
          lambda m, v: m.post_processor_texture(v), planes)
    stage("additional_features_fc (N,852)",
          lambda m, v: m.additional_features_fc(v), add_in)
    stage("self_attn (N,131)",
          lambda m, v: m.self_attn_layer(v, mask=mask), hidden)

    # the composed pipeline, for the isolated-sum vs end-to-end gap
    from guassianhand_tpu.train.fit import stop_frozen

    chain_timed("features fwd (end-to-end)",
                lambda bb, p: model.apply(p, bb, method="features")["hidden"],
                batch, params)
    chain_timed("features fwd+bwd dALL-PARAMS (e2e)",
                lambda bb, p: jax.grad(
                    lambda pp: jnp.sum(model.apply(
                        pp, bb, method="features")["hidden"]))(p),
                batch, params)
    # the FIT-path backward: frozen base stop_gradient'd (dW skipped),
    # only per-identity leaves differentiated — what the 87 ms step pays
    chain_timed("features fwd+bwd FIT-path (frozen dW)",
                lambda bb, p: jax.grad(
                    lambda pp: jnp.sum(model.apply(
                        stop_frozen(pp), bb, method="features")["hidden"]))(p),
                batch, params)


if __name__ == "__main__":
    main()
