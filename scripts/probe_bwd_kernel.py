"""Isolate the composite_backward kernel: interpret-on-CPU vs compiled-on-TPU
on IDENTICAL inputs.

Usage:
  python scripts/probe_bwd_kernel.py gen   # CPU: dump inputs + reference grads
  python scripts/probe_bwd_kernel.py tpu   # TPU: run compiled, compare
"""
import sys

sys.path.insert(0, "/root/repo")

NPZ = "/tmp/bwd_probe.npz"
HW = 64
N = 256


def build_inputs():
    import numpy as np
    import jax.numpy as jnp
    from tests.utils import make_camera, make_gaussians
    from guassianhand_tpu.ops.projection import project_gaussians
    from guassianhand_tpu.ops import binning as binning_lib
    from guassianhand_tpu.ops.rasterize import (RasterizeConfig, _build_attr,
                                                _block_offsets)
    import guassianhand_tpu.ops.rasterize as rl

    cfg = RasterizeConfig(max_tiles_per_gaussian=8)
    cam = make_camera(HW, HW)
    g = make_gaussians(N, seed=3)
    proj = project_gaussians(g.xyz, g.scaling, g.rotation, cam)
    b = binning_lib.bin_gaussians(proj.mean2d, proj.depth, proj.radius,
                                  proj.visible, height=HW, width=HW,
                                  cfg=cfg.binning())
    ntx, nty = binning_lib.grid_dims(HW, HW, cfg.tile_size)
    num_tiles = ntx * nty
    color = g.shs[:, 0, :]
    opacity = g.effective_opacity()[:, 0]
    attr = _build_attr(proj.mean2d, proj.conic, color, opacity, b.pair_gidx)
    block_off = _block_offsets(b.counts, num_tiles, cfg.block_size)
    rng = np.random.RandomState(0)
    p = cfg.tile_size * cfg.tile_size
    gtiles = rng.normal(size=(num_tiles, 8, p)).astype(np.float32)
    return (cfg, np.asarray(attr), np.asarray(block_off),
            np.asarray(b.counts), np.asarray(b.tile_of_block),
            np.asarray(b.base_of_block), gtiles, num_tiles, ntx)


def run(interpret):
    import numpy as np
    import jax.numpy as jnp
    from guassianhand_tpu.ops import rasterize_pallas as kern

    (cfg, attr, block_off, counts, tob, bob, gtiles, num_tiles,
     ntx) = build_inputs()
    tiles, tchk = kern.composite_forward(
        jnp.asarray(attr), jnp.asarray(block_off), jnp.asarray(counts),
        num_tiles=num_tiles, ntx=ntx, tile_size=cfg.tile_size,
        block_size=cfg.block_size, max_blocks_per_tile=cfg.max_blocks_per_tile,
        interpret=interpret)
    gt = np.array(gtiles)
    gt[:, 4, :] = np.asarray(tiles[:, 3])  # row 4 must be T_final
    grads = kern.composite_backward(
        jnp.asarray(attr), tchk, jnp.asarray(gt), jnp.asarray(block_off),
        jnp.asarray(counts), jnp.asarray(tob), jnp.asarray(bob),
        num_tiles=num_tiles, ntx=ntx, tile_size=cfg.tile_size,
        block_size=cfg.block_size, max_blocks_per_tile=cfg.max_blocks_per_tile,
        interpret=interpret)
    # only slots with real pairs are defined; mask via counts-driven layout
    return (np.asarray(tiles), np.asarray(tchk), np.asarray(grads),
            block_off, counts, cfg.block_size, num_tiles)


def main():
    import numpy as np

    mode = sys.argv[1]
    if mode == "gen":
        import jax
        jax.config.update("jax_platforms", "cpu")
        tiles, tchk, grads, block_off, counts, g, num_tiles = run(True)
        np.savez(NPZ, tiles=tiles, tchk=tchk, grads=grads,
                 block_off=block_off, counts=counts, g=g,
                 num_tiles=num_tiles)
        print("[t] saved reference", flush=True)
    else:
        import time
        import jax
        print("[t] backend:", jax.devices()[0].platform, flush=True)
        ref = np.load(NPZ)
        t0 = time.time()
        tiles, tchk, grads, block_off, counts, g, num_tiles = run(False)
        print(f"[t] compiled run {time.time() - t0:.1f}s", flush=True)

        # valid slab slots mask
        nb = -(-ref["counts"][:int(ref["num_tiles"])] // int(ref["g"]))
        mask = np.zeros(grads.shape[1], bool)
        bo = ref["block_off"]
        for t in range(int(ref["num_tiles"])):
            base = bo[t] * int(ref["g"])
            mask[base: base + ref["counts"][t]] = True

        for name, a, b in [("tiles", tiles, ref["tiles"]),
                           ("tchk", tchk, ref["tchk"]),
                           ("grads", grads[:, mask],
                            ref["grads"][:, mask])]:
            d = np.abs(a - b)
            rel = d / (np.abs(b) + 1e-6)
            print(f"[t] {name}: max abs {d.max():.3e} max rel {rel.max():.3e}"
                  f" mismatch@1e-4rel {(rel > 1e-4).mean():.4f}", flush=True)


if __name__ == "__main__":
    main()
