"""Isolate the composite kernels: interpret-on-CPU vs compiled-on-TPU on
IDENTICAL inputs (saved to npz by `gen`, loaded by `tpu`).

Usage:
  python scripts/probe_bwd_kernel.py gen   # CPU: dump inputs + reference outs
  python scripts/probe_bwd_kernel.py tpu   # TPU: run compiled on saved inputs
"""
import sys

sys.path.insert(0, "/root/repo")

NPZ = "/tmp/bwd_probe.npz"
HW = 96
N = 512


def build_inputs():
    import numpy as np
    import jax.numpy as jnp
    from tests.utils import make_camera, make_gaussians
    from guassianhand_tpu.ops.projection import project_gaussians
    from guassianhand_tpu.ops import binning as binning_lib
    from guassianhand_tpu.ops.rasterize import (RasterizeConfig,
                                                _sorted_attr_table)

    cfg = RasterizeConfig(max_tiles_per_gaussian=16)
    bcfg = cfg.binning()
    cam = make_camera(HW, HW)
    g = make_gaussians(N, seed=3)
    proj = project_gaussians(g.xyz, g.scaling, g.rotation, cam)
    ntx, nty = binning_lib.grid_dims(HW, HW, cfg.tile_size)
    num_tiles = ntx * nty
    _, _, total_blocks = binning_lib.static_sizes(N, HW, HW, bcfg)
    tile_flat, _ov = binning_lib.enumerate_tiles(
        proj.mean2d, proj.radius, proj.visible, height=HW, width=HW, cfg=bcfg)
    color = g.shs[:, 0, :]
    opacity = g.effective_opacity()[:, 0]
    tile_s, attr_sorted = _sorted_attr_table(
        proj.mean2d, proj.conic, color, opacity, tile_flat, proj.depth,
        cfg.max_tiles_per_gaussian, cfg.block_size)
    (_, counts, block_off, tob, bob, src_base, _oc, _ob) = \
        binning_lib.slab_layout(tile_s, num_tiles, total_blocks, bcfg)
    rng = np.random.RandomState(0)
    p = cfg.tile_size * cfg.tile_size
    gtiles = rng.normal(size=(num_tiles, 8, p)).astype(np.float32)
    return dict(attr=np.asarray(attr_sorted), block_off=np.asarray(block_off),
                counts=np.asarray(counts), tob=np.asarray(tob),
                bob=np.asarray(bob), src_base=np.asarray(src_base),
                total_blocks=total_blocks, gtiles=gtiles,
                num_tiles=num_tiles, ntx=ntx, tile_size=cfg.tile_size,
                block_size=cfg.block_size,
                max_blocks_per_tile=cfg.max_blocks_per_tile)


def run(inp, interpret):
    import numpy as np
    import jax.numpy as jnp
    from guassianhand_tpu.ops import rasterize_pallas as kern

    num_tiles = int(inp["num_tiles"])
    total_blocks = int(inp["total_blocks"])
    kw = dict(num_tiles=num_tiles, ntx=int(inp["ntx"]),
              tile_size=int(inp["tile_size"]),
              block_size=int(inp["block_size"]),
              max_blocks_per_tile=int(inp["max_blocks_per_tile"]),
              interpret=interpret)
    tiles, tchk, cpx = kern.composite_forward(
        jnp.asarray(inp["attr"]), jnp.asarray(inp["block_off"]),
        jnp.asarray(inp["counts"]), jnp.asarray(inp["src_base"]),
        total_blocks, store_cpx=True, **kw)
    gt = np.array(inp["gtiles"])
    gt[:, 4, :] = np.asarray(tiles[:num_tiles, 3])  # row 4 must be T_final
    cpxb = jnp.arange(total_blocks, dtype=jnp.int32)  # no compaction here
    grads = kern.composite_backward(
        jnp.asarray(inp["attr"]), cpx, jnp.asarray(gt),
        jnp.asarray(inp["block_off"]), jnp.asarray(inp["counts"]),
        jnp.asarray(inp["tob"]), jnp.asarray(inp["bob"]),
        jnp.asarray(inp["src_base"]), cpxb, total_blocks, **kw)
    return np.asarray(tiles), np.asarray(tchk), np.asarray(grads)


def valid_masks(inp):
    """(pair_mask over PP, block_mask over TB) for defined slots."""
    import numpy as np
    g = int(inp["block_size"])
    bo = inp["block_off"]
    counts = inp["counts"]
    num_tiles = int(inp["num_tiles"])
    pp = int(inp["total_blocks"]) * g
    pair_mask = np.zeros(pp, bool)
    nblocks = 0
    for t in range(num_tiles):
        base = int(bo[t]) * g
        pair_mask[base: base + int(counts[t])] = True
        nblocks = max(nblocks, int(bo[t + 1]))
    return pair_mask, nblocks


def main():
    import numpy as np

    mode = sys.argv[1]
    if mode == "gen":
        import jax
        jax.config.update("jax_platforms", "cpu")
        inp = build_inputs()
        tiles, tchk, grads = run(inp, True)
        np.savez(NPZ, tiles=tiles, tchk=tchk, grads=grads, **inp)
        print(f"[t] saved reference: {int(inp['counts'][:int(inp['num_tiles'])].sum())} pairs",
              flush=True)
    else:
        import time
        import jax
        print("[t] backend:", jax.devices()[0].platform, flush=True)
        ref = dict(np.load(NPZ))
        t0 = time.time()
        tiles, tchk, grads = run(ref, False)
        print(f"[t] compiled run {time.time() - t0:.1f}s", flush=True)

        pair_mask, nblocks = valid_masks(ref)
        num_tiles = int(ref["num_tiles"])
        checks = [
            ("tiles[0:4]", tiles[:num_tiles, :4], ref["tiles"][:num_tiles, :4]),
            ("tchk", tchk[:nblocks], ref["tchk"][:nblocks]),
            ("grads[0:9]", grads[:9, pair_mask], ref["grads"][:9, pair_mask]),
        ]
        bad = False
        for name, a, b in checks:
            d = np.abs(a - b)
            rel = d / (np.abs(b) + 1e-6)
            frac = (rel > 1e-3).mean()
            print(f"[t] {name}: max abs {d.max():.3e} max rel {rel.max():.3e}"
                  f" mismatch@1e-3rel {frac:.4f}", flush=True)
            if d.max() > 1e-3 * (np.abs(b).max() + 1e-6):
                bad = True
        print("[t]", "MISMATCH" if bad else "parity OK", flush=True)
        sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
