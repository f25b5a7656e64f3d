"""End-to-end stage deltas for the 512^2/49k bench workload on TPU.

Stage-decomposition via SEPARATE jits systematically overstates op costs
(fusion changes); this script instead times nested prefixes of the real
pipeline end-to-end and reports deltas. Varied inputs are precomputed outside
the timed loop (the axon relay caches identical execute requests).
"""
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
    varied = [jnp.asarray(xyz + 1e-6 * rng.normal(size=xyz.shape)
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
    cfg = RasterizeConfig()
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
        # projection fwd+bwd + binning (binning has no grads)
        def loss(xyz, scaling, rotation):
            proj = project_gaussians(xyz, scaling, rotation, cam)
            b = binning_lib.bin_gaussians(
                proj.mean2d, proj.depth, proj.radius, proj.visible,
                height=HW, width=HW, cfg=cfg.binning())
            return (jnp.sum(proj.conic) + jnp.sum(proj.mean2d)
                    + jnp.sum(b.pair_gidx).astype(jnp.float32) * 0.0)
        return jax.grad(loss, argnums=(0, 1, 2))(xyz, gs.scaling, gs.rotation)

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


if __name__ == "__main__":
    main()
