"""One-process TPU A/B of RasterizeConfig.segreduce_pallas at the bench shape.

Arms share the client + scene; each pays only its own compile. Every arm's
gradient norms are cross-checked against the XLA segment_sum base (a kernel
that silently fell back — or dropped pairs — would otherwise still post a
number). Also prints whether the sorted-id spans actually fit the window at
this shape, i.e. whether the kernel path (not the lax.cond fallback) is the
one being timed.

Usage: timeout 3000 python scripts/bench_segreduce.py [n_iters]
"""
from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from guassianhand_tpu.core.gaussians import Gaussians
from guassianhand_tpu.core.camera import Camera
from guassianhand_tpu.ops.rasterize import RasterizeConfig, rasterize

BASELINE_RAYS_PER_S = 512 * 512 * 100.0


def main():
    from guassianhand_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    hw, n = 512, 49152
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rng = np.random.RandomState(0)
    xyz = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    gs = Gaussians(
        xyz=jnp.asarray(xyz),
        opacity=jnp.asarray(rng.uniform(0.3, 0.9, (n, 1)).astype(np.float32)),
        rotation=jnp.asarray(q),
        scaling=jnp.asarray(rng.uniform(0.002, 0.01, (n, 3))
                            .astype(np.float32)),
        shs=jnp.asarray(rng.uniform(0, 1, (n, 1, 3)).astype(np.float32)))
    f = 1.1 * hw
    K = np.array([[f, 0, hw / 2], [0, f, hw / 2], [0, 0, 1]], np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 1.8
    cam = Camera.from_w2c(w2c, K, hw, hw)
    base = RasterizeConfig(max_tiles_per_gaussian=9, pairs_per_gaussian=3.0,
                           pack_rgb=True)
    tgt = jnp.asarray(rng.uniform(0, 1, (hw, hw, 3)).astype(np.float32))

    # Would the kernel path engage? Replicate the span check on this scene.
    from guassianhand_tpu.ops import binning as binning_lib
    from guassianhand_tpu.ops.projection import project_gaussians
    proj = jax.jit(lambda x: project_gaussians(x, gs.scaling, gs.rotation,
                                               cam))(gs.xyz)
    tile_flat, _ = binning_lib.enumerate_tiles(
        proj.mean2d, proj.radius, proj.visible, height=hw, width=hw,
        cfg=base.binning(), opacity=gs.effective_opacity()[:, 0])
    ntx, nty = binning_lib.grid_dims(hw, hw, 16)
    tf = np.asarray(tile_flat).reshape(n, -1)
    m = tf.shape[1]
    ids = np.repeat(np.arange(n, dtype=np.int64), m)[tf.flatten() < ntx * nty]
    ids.sort()
    for c, w in [(2048, 512), (512, 256)]:
        pad = (-len(ids)) % c
        idp = np.concatenate([ids, np.full(pad, n, np.int64)])
        span = (np.minimum(idp[c - 1::c], n - 1)
                - (idp[::c] // 128) * 128)
        print(json.dumps({"span_check": {"chunk": c, "window": w,
                                         "max_span": int(span.max()),
                                         "kernel_engages":
                                         bool((span < w).all())}}),
              flush=True)

    salt = np.random.RandomState((int(time.time()) * 2654435761)
                                 % (2 ** 31 - 1))
    varied = [jnp.asarray(np.asarray(gs.xyz)
                          + 1e-6 * salt.normal(size=gs.xyz.shape)
                          .astype(np.float32)) for _ in range(n_iters)]
    jax.block_until_ready(varied)

    arms = [
        ("xla_segsort", dict()),
        ("segred_w512_c2048", dict(segreduce_pallas=True)),
        ("segred_w256_c512", dict(segreduce_pallas=True,
                                  segreduce_window=256,
                                  segreduce_chunk=512)),
    ]
    ref_gnorms = None
    for name, kw in arms:
        cfg = dataclasses.replace(base, **kw)

        def loss_fn(xyz, scaling, rotation, opacity1d, shs, cfg=cfg):
            g = Gaussians(xyz=xyz, opacity=opacity1d[:, None],
                          rotation=rotation, scaling=scaling, shs=shs)
            out = rasterize(g, cam, height=hw, width=hw, use_rgb=True,
                            config=cfg)
            return (jnp.abs(out["comp_rgb"] - tgt).mean()
                    + (out["comp_mask"] ** 2).mean())

        step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
        args = (gs.scaling, gs.rotation, gs.opacity[:, 0], gs.shs)
        t0 = time.perf_counter()
        grads = step(varied[0], *args)
        jax.block_until_ready(grads)
        compile_s = time.perf_counter() - t0
        gnorms = np.array([float(jnp.linalg.norm(g)) for g in grads])
        checks = {}
        if ref_gnorms is None:
            ref_gnorms = gnorms
        else:
            checks["gnorm_maxrel_vs_base"] = float(
                np.abs(gnorms / ref_gnorms - 1.0).max())
        t0 = time.perf_counter()
        for i in range(n_iters):
            grads = step(varied[i], *args)
        jax.block_until_ready(grads)
        dt = time.perf_counter() - t0
        rays = hw * hw * n_iters / dt
        print(json.dumps({
            "arm": name, "rays_per_s": round(rays, 1),
            "vs_baseline": round(rays / BASELINE_RAYS_PER_S, 4),
            "step_ms": round(1e3 * dt / n_iters, 2),
            "compile_s": round(compile_s, 1), **checks}), flush=True)


if __name__ == "__main__":
    main()
