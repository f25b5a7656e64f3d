"""Turntable rendering of a fitted avatar.

Counterpart of the reference's 360-degree camera path renders
(utils.py:24-95 + the edit CLI's video dumps):

  python -m guassianhand_tpu.cli.render_360 --ckpt run/ckpts/last.ckpt \
      [--views 60] [--out dir] [--synthetic]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv=None):
    from guassianhand_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    parser = argparse.ArgumentParser("guassianhand-tpu 360 render")
    parser.add_argument("--config", default=None)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--views", type=int, default=60)
    parser.add_argument("--out", default=None)
    parser.add_argument("--synthetic", action="store_true", default=True)
    args, extras = parser.parse_known_args(argv)

    import jax
    import jax.numpy as jnp

    from guassianhand_tpu.config import load_config
    from guassianhand_tpu.data.rays import orbit_cameras
    from guassianhand_tpu.data.synthetic import (SyntheticHandScene,
                                                 synthetic_batch)
    from guassianhand_tpu.models.one_shot import OneShotAvatarModel
    from guassianhand_tpu.train import checkpoints as ckpt_lib
    from guassianhand_tpu.utils.saving import (save_gif, save_video,
                                               save_video_frames)

    cfg = load_config(args.config, extras)
    hw_h, hw_w = cfg.data.height, cfg.data.width
    out_dir = args.out or os.path.join(cfg.out_dir, cfg.expname, "video")

    scene = SyntheticHandScene.build(
        n_vertices=778, subdivide=min(cfg.data.edge_subdivide, 1),
        height=hw_h, width=hw_w)
    batch = synthetic_batch(scene, seed=cfg.seed,
                            raster=cfg.model.renderer.raster,
                            with_target=False)

    model = OneShotAvatarModel(cfg=cfg.model)
    params = jax.jit(model.init, static_argnums=(2, 3))(
        jax.random.PRNGKey(cfg.seed), batch, hw_h, hw_w)  # jitted: eager
    # init stalls on the remote-TPU backend (see fit_one_shot.py)
    if args.ckpt and os.path.exists(args.ckpt):
        restored = ckpt_lib.load_checkpoint(
            args.ckpt, {"params": params, "opt_state": None, "step": 0})
        params = restored["params"]

    center = np.asarray(batch["points"][0]).mean(0)
    w2cs, Ks = orbit_cameras(center, radius=0.6, K=np.asarray(scene.K),
                             n_views=args.views)

    render = jax.jit(lambda p, b: model.apply(p, b, hw_h, hw_w)["comp_rgb"])
    frames = []
    for v in range(args.views):
        b = dict(batch)
        b["w2c_render"] = jnp.asarray(w2cs[v])[None, None]
        b["K_render"] = jnp.asarray(Ks[v])[None, None]
        frames.append(np.asarray(render(params, b)[0, 0]))
        if v % 10 == 0:
            print(f"view {v}/{args.views}")
    paths = save_video_frames(out_dir, frames)
    save_gif(os.path.join(out_dir, "turntable.gif"), frames)
    vid = save_video(os.path.join(out_dir, "turntable.mp4"), frames)
    print(f"wrote {len(paths)} frames + turntable.gif + {vid} to {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
