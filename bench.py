"""Headline benchmark: fwd+bwd differentiable splatting throughput at 512^2.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: rays/s/chip (pixels rendered per second through a full forward +
backward of the rasterizer), the north star in BASELINE.json. The reference
repo publishes no numbers (BASELINE.md); ``vs_baseline`` is computed against a
nominal 100 fps fwd+bwd at 512^2 for the CUDA reference rasterizer on a
contemporary GPU (2.62e7 rays/s) — the typical published throughput class for
diff-gaussian-rasterization training workloads at this resolution.
"""
from __future__ import annotations

import json
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
        sort_stable=os.environ.get("GH_SORT_STABLE", "1") != "0")
    tgt = jnp.asarray(rng.uniform(0, 1, (hw, hw, 3)).astype(np.float32))

    def loss_fn(xyz, scaling, rotation, opacity, shs):
        g = Gaussians(xyz=xyz, opacity=opacity, rotation=rotation,
                      scaling=scaling, shs=shs)
        out = rasterize(g, cam, height=hw, width=hw, use_rgb=True, config=cfg)
        return (jnp.abs(out["comp_rgb"] - tgt).mean()
                + (out["comp_mask"] ** 2).mean())

    # GH_BENCH_FWD=1: time the forward render alone (no grad) — diagnostic
    # for attributing step time between the kernels' fwd and bwd halves.
    fwd_only = os.environ.get("GH_BENCH_FWD", "0") == "1"
    step = jax.jit(loss_fn if fwd_only
                   else jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
    args = (gs.xyz, gs.scaling, gs.rotation, gs.opacity, gs.shs)

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
    varied = [jnp.asarray(np.asarray(gs.xyz)
                          + 1e-6 * rng.normal(size=gs.xyz.shape)
                          .astype(np.float32)) for i in range(n_iters)]
    jax.block_until_ready(varied)
    grads = step(varied[0], *args[1:])
    jax.block_until_ready(grads)

    t0 = time.perf_counter()
    for i in range(n_iters):
        grads = step(varied[i], *args[1:])
    jax.block_until_ready(grads)
    dt = time.perf_counter() - t0

    rays_per_s = hw * hw * n_iters / dt
    print(json.dumps({
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
        "step_ms": round(1e3 * dt / n_iters, 2),
    }))


if __name__ == "__main__":
    main()
