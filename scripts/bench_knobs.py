"""Multi-arm TPU bench for the rasterizer perf knobs, one process.

The knobs (GH_BWD_MOMENTS, GH_FWD_POWER_MXU, GH_SUFFIX_BF16X3) are module
constants read at trace time, so arms monkeypatch them and re-jit — the TPU
client and the scene are built once, and each arm pays only its own compile.
Every arm's forward image and gradient norms are cross-checked against the
base arm (a knob that silently broke on compiled Mosaic would otherwise
still post a throughput number).

Usage: timeout 3000 python scripts/bench_knobs.py [n_iters] [arm1,arm2,...]
Prints one JSON line per arm. The optional second argument restricts the run
to the named arms (base always runs first — it is the parity reference).
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
import guassianhand_tpu.ops.rasterize_pallas as kern

BASELINE_RAYS_PER_S = 512 * 512 * 100.0


def main():
    from guassianhand_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    hw = 512
    n = 49152
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
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
    cfg = RasterizeConfig(max_tiles_per_gaussian=9, pairs_per_gaussian=3.0)
    tgt = jnp.asarray(rng.uniform(0, 1, (hw, hw, 3)).astype(np.float32))

    def loss_fn(xyz, scaling, rotation, opacity, shs):
        g = Gaussians(xyz=xyz, opacity=opacity, rotation=rotation,
                      scaling=scaling, shs=shs)
        out = rasterize(g, cam, height=hw, width=hw, use_rgb=True, config=cfg)
        return (jnp.abs(out["comp_rgb"] - tgt).mean()
                + (out["comp_mask"] ** 2).mean())

    args = (gs.xyz, gs.scaling, gs.rotation, gs.opacity, gs.shs)
    varied = [jnp.asarray(np.asarray(gs.xyz)
                          + 1e-6 * rng.normal(size=gs.xyz.shape)
                          .astype(np.float32)) for _ in range(n_iters)]
    jax.block_until_ready(varied)

    # (name, _BWD_MOMENTS, FWD_POWER_MXU, _SUFFIX_BF16X3, sort_stable)
    ARMS = [
        ("base", False, False, False, True),
        ("moments", True, False, False, True),
        ("powermxu", False, True, False, True),
        ("mom+pow", True, True, False, True),
        ("suffix_bf16x3", False, False, True, True),
        ("all3", True, True, True, True),
        ("unstable_sort", False, False, False, False),
    ]
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    ref_img = None
    ref_gnorms = None
    for name, mom, pmxu, bf16x3, stable in ARMS:
        if only and name not in only and name != "base":
            continue
        kern._BWD_MOMENTS = mom
        kern.FWD_POWER_MXU = pmxu
        kern._SUFFIX_BF16X3 = bf16x3
        cfg = dataclasses.replace(cfg, sort_stable=stable)
        try:
            step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
            fwd = jax.jit(lambda x: rasterize(
                Gaussians(xyz=x, opacity=gs.opacity, rotation=gs.rotation,
                          scaling=gs.scaling, shs=gs.shs),
                cam, height=hw, width=hw, use_rgb=True, config=cfg))
            t0 = time.perf_counter()
            diag = fwd(gs.xyz)
            img = np.asarray(diag["comp_rgb"])
            overflow = int(diag["overflow"])
            grads = step(varied[0], *args[1:])
            jax.block_until_ready(grads)
            compile_s = time.perf_counter() - t0
            gnorms = np.array([float(jnp.linalg.norm(g)) for g in grads])

            checks = {}
            if ref_img is None:
                ref_img, ref_gnorms = img, gnorms
            else:
                checks["img_maxabs_vs_base"] = float(
                    np.abs(img - ref_img).max())
                checks["gnorm_maxrel_vs_base"] = float(
                    np.abs(gnorms / ref_gnorms - 1.0).max())

            t0 = time.perf_counter()
            for i in range(n_iters):
                grads = step(varied[i], *args[1:])
            jax.block_until_ready(grads)
            dt = time.perf_counter() - t0
            rays = hw * hw * n_iters / dt
            print(json.dumps({
                "arm": name, "rays_per_s": round(rays, 1),
                "vs_baseline": round(rays / BASELINE_RAYS_PER_S, 4),
                "step_ms": round(1e3 * dt / n_iters, 2),
                "overflow": overflow, "compile_s": round(compile_s, 1),
                **checks}), flush=True)
        except Exception as e:  # an arm failing must not hide the others
            print(json.dumps({"arm": name, "error": repr(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
