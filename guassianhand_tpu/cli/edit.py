"""Texture edit / avatar drive CLI.

Counterpart of ``python infer_one_shot_edit.py`` (infer_one_shot_edit.py:548-636):
fit the appearance residual maps against a custom edit image (e.g. a painted
texture or a style image), then render novel poses/views with the edit flags:

  python -m guassianhand_tpu.cli.edit --image example.png [--mask m.png]
      [--left-only] [--duplication] [--steps 1000] [--ckpt fitted.ckpt]

Differences from the one-shot fit mirror the reference: lr 0.001, 10x100
steps (config/one_shot_edit.json), identity code taken from the codebook
(infer_one_shot_edit.py:208), and the edit renderer semantics
(renderer_one_shot_edit.py:489-510).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv=None):
    from guassianhand_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    parser = argparse.ArgumentParser("guassianhand-tpu texture edit")
    parser.add_argument("--config", default=None)
    parser.add_argument("--image", default=None,
                        help="edit target image (synthetic target if omitted)")
    parser.add_argument("--mask", default=None)
    parser.add_argument("--left-only", action="store_true")
    parser.add_argument("--duplication", action="store_true")
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--ckpt", default=None,
                        help="fitted one-shot checkpoint to start from")
    parser.add_argument("--identity", type=int, default=None,
                        help="identity index from the codebook")
    args, extras = parser.parse_known_args(argv)

    import jax
    import jax.numpy as jnp

    from guassianhand_tpu.config import load_config
    from guassianhand_tpu.data.native_loader import decode_image
    from guassianhand_tpu.data.synthetic import (SyntheticHandScene,
                                                 synthetic_batch)
    from guassianhand_tpu.models.one_shot import OneShotAvatarModel
    from guassianhand_tpu.render.renderer import EditConfig
    from guassianhand_tpu.train import checkpoints as ckpt_lib
    from guassianhand_tpu.train.fit import (FitConfig, make_fit_step,
                                            make_optimizer)
    from guassianhand_tpu.train.losses import LossWeights
    from guassianhand_tpu.utils.saving import Saver

    cfg = load_config(args.config, extras)
    hw_h, hw_w = cfg.data.height, cfg.data.width
    run_dir = os.path.join(cfg.out_dir, cfg.expname + "_edit")
    saver = Saver(run_dir)

    edit = EditConfig(enabled=True, edit_left_only=args.left_only,
                      duplication=args.duplication)

    scene = SyntheticHandScene.build(
        n_vertices=778, subdivide=min(cfg.data.edge_subdivide, 1),
        height=hw_h, width=hw_w)
    batch = synthetic_batch(scene, seed=cfg.seed,
                            raster=cfg.model.renderer.raster)
    if args.image:
        img = decode_image(args.image)
        import PIL.Image

        img = np.asarray(PIL.Image.fromarray(
            (img * 255).astype(np.uint8)).resize((hw_w, hw_h)),
            np.float32) / 255.0
        batch["target_rgb"] = jnp.asarray(img)[None]
        if args.mask:
            m = decode_image(args.mask).mean(-1)
            m = np.asarray(PIL.Image.fromarray(
                (m * 255).astype(np.uint8)).resize((hw_w, hw_h)),
                np.float32) / 255.0
            batch["target_mask"] = jnp.asarray((m > 0.4).astype(np.float32))[None]

    model = OneShotAvatarModel(cfg=cfg.model)
    params = jax.jit(model.init, static_argnums=(2, 3))(
        jax.random.PRNGKey(cfg.seed), batch, hw_h, hw_w)  # jitted: eager
    # init stalls on the remote-TPU backend (see fit_one_shot.py)
    if args.ckpt and os.path.exists(args.ckpt):
        restored = ckpt_lib.load_checkpoint(
            args.ckpt, {"params": params, "opt_state": None, "step": 0})
        params = restored["params"]
        print(f"starting from {args.ckpt}")

    # edit schedule: lr 0.001, 10 epochs x 100 steps (one_shot_edit.json)
    fit_cfg = FitConfig(lr=0.001, epochs=max(1, args.steps // 100),
                        steps_per_epoch=min(100, args.steps),
                        weights=LossWeights(vgg=0.0))
    optimizer = make_optimizer(params, fit_cfg)
    opt_state = optimizer.init(params)

    def model_apply(p, b):
        return model.apply(p, b, hw_h, hw_w, edit=edit,
                           identity_from_book=args.identity)

    step_fn = make_fit_step(model_apply, None, optimizer, fit_cfg)
    if fit_cfg.static_prefix_cache:
        # the edit fit also refits one pinned frame (frame-11388): the
        # frozen prefix (shade branch + embeddings) is per-fit constant
        from guassianhand_tpu.train.fit import attach_static_features
        batch = attach_static_features(model, params, batch)
    n_steps = fit_cfg.epochs * fit_cfg.steps_per_epoch
    for i in range(n_steps):
        params, opt_state, loss, err = step_fn(params, opt_state, batch)
        if i % 50 == 0 or i == n_steps - 1:
            print(f"edit step {i}/{n_steps} loss={float(loss):.5f}")
            out = model_apply(params, batch)
            saver.save_rgb(f"vis/edit{i:04d}.png",
                           np.asarray(out["comp_rgb"][0, 0]))

    ckpt_lib.save_checkpoint(os.path.join(run_dir, "ckpts", "edit.ckpt"),
                             params, opt_state, n_steps)
    print(f"edit fit done; artifacts in {run_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
