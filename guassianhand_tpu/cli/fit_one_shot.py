"""One-shot avatar fitting / evaluation CLI.

Counterpart of ``python infer_one_shot.py --config ... [--run_val]``
(infer_one_shot.py:558-650):

  python -m guassianhand_tpu.cli.fit_one_shot [--config cfg.yaml] [--run_val]
      [--synthetic] [key.sub=value ...]

--synthetic runs the full loop on the synthetic two-hand scene (no licensed
assets needed); otherwise the InterHand2.6M pipeline is used. Fitting writes
per-step visual dumps (vis/<expname>/), checkpoints (auto-resume from
last.ckpt), a fitted-Gaussian PLY, and --run_val dumps PSNR/SSIM/(LPIPS)
metrics to YAML like the reference test_epoch_end (infer_one_shot.py:391-402).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import yaml


def main(argv=None):
    from guassianhand_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    parser = argparse.ArgumentParser("guassianhand-tpu one-shot fitting")
    parser.add_argument("--config", default=None)
    parser.add_argument("--run_val", action="store_true")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--steps", type=int, default=None,
                        help="override total fit steps")
    parser.add_argument("--height", type=int, default=None)
    parser.add_argument("--width", type=int, default=None)
    parser.add_argument("--val_frames", type=int, default=1,
                        help="with --synthetic --run_val: evaluate over this "
                        "many pose-varied synthetic frames (349 = the "
                        "reference test-split length, "
                        "dataset_one_shot.py:443-451)")
    parser.add_argument("--no_images", action="store_true",
                        help="skip per-frame PNG dumps during --run_val "
                        "(metrics only; the reference always writes them)")
    args, extras = parser.parse_known_args(argv)

    import jax
    import jax.numpy as jnp

    from guassianhand_tpu.config import (ExperimentConfig, load_config,
                                         save_config_snapshot)
    from guassianhand_tpu.models.one_shot import OneShotAvatarModel
    from guassianhand_tpu.train import checkpoints as ckpt_lib
    from guassianhand_tpu.train.fit import (FitConfig, make_fit_step,
                                            make_optimizer)
    from guassianhand_tpu.train.metrics import bbox_crop, psnr, ssim
    from guassianhand_tpu.train.vgg import VGGLoss
    from guassianhand_tpu.utils.logging import RunLogger
    from guassianhand_tpu.utils.saving import Saver

    cfg: ExperimentConfig = load_config(args.config, extras)
    run_dir = os.path.join(cfg.out_dir, cfg.expname)
    save_config_snapshot(cfg, run_dir)
    saver = Saver(run_dir)
    hw_h = args.height or cfg.data.height
    hw_w = args.width or cfg.data.width

    if args.synthetic or cfg.data.dataset == "synthetic":
        from guassianhand_tpu.data.synthetic import (SyntheticHandScene,
                                                     synthetic_batch)

        scene = SyntheticHandScene.build(
            n_vertices=778, subdivide=min(cfg.data.edge_subdivide, 1),
            height=hw_h, width=hw_w)
        batch = synthetic_batch(scene, seed=cfg.seed,
                                raster=cfg.model.renderer.raster)
        batch_fn = lambda step: batch  # noqa: E731 — one-shot refits one frame
        if args.run_val and args.val_frames > 1:
            # synthetic stand-in for the reference's 349-frame test split
            # (dataset_one_shot.py:443-451): per-frame pose variation with
            # a per-frame bbox mask so the full eval protocol (bbox-crop
            # SSIM, PNG round-trip LPIPS) runs at production shape.
            from guassianhand_tpu.data.rays import (bounds_from_points,
                                                    get_mask_at_box)

            def synth_eval_batches():
                w2c_np = np.asarray(scene.w2c)
                for i in range(args.val_frames):
                    b = synthetic_batch(scene, seed=cfg.seed + i,
                                        raster=cfg.model.renderer.raster)
                    bounds = bounds_from_points(np.asarray(b["points"][0]))
                    mab, _, _ = get_mask_at_box(
                        bounds, np.asarray(scene.K), w2c_np[:3, :3],
                        w2c_np[:3, 3], hw_h, hw_w)
                    b["mask_at_box"] = mab.reshape(hw_h, hw_w)
                    yield b

            eval_batches = synth_eval_batches()
        else:
            eval_batches = [batch]
    else:
        from guassianhand_tpu.data.interhand import (InterHandConfig,
                                                     InterHandDataset)

        ds_cfg = InterHandConfig(
            data_root=cfg.data.data_root, annot_path=cfg.data.annot_path,
            split="train" if not args.run_val else "test",
            pose_sequence=cfg.data.pose_sequence,
            edge_subdivide=cfg.data.edge_subdivide,
            mask_sa=cfg.data.mask_sa, render_mask=cfg.data.render_mask,
            height=hw_h, width=hw_w,
            mano_models_path=cfg.data.mano_models_path,
            mano_uv_path=cfg.data.mano_uv_path,
            color_jitter=cfg.data.color_jitter,
            use_native_loader=cfg.data.use_native_loader,
            edit=cfg.data.edit, image_path=cfg.data.image_path,
            mask_path=cfg.data.mask_path)
        dataset = InterHandDataset(ds_cfg)
        train_batch = dataset.load_sample(0)
        batch_fn = lambda step: train_batch  # noqa: E731
        eval_batches = None  # loaded lazily below

    model = OneShotAvatarModel(cfg=cfg.model)
    # jit the init: eager init on the remote-TPU backend dispatches every
    # layer op as its own tunnel round-trip and stalls for tens of minutes
    # at the full model size (measured r5); one compiled program is fast.
    params = jax.jit(model.init, static_argnums=(2, 3))(
        jax.random.PRNGKey(cfg.seed), batch_fn(0), hw_h, hw_w)
    if cfg.pretrained and os.path.exists(cfg.pretrained):
        params = ckpt_lib.load_params_partial(cfg.pretrained, params)
        print(f"loaded pretrained weights from {cfg.pretrained}")

    ckpt_dir = os.path.join(run_dir, "ckpts")
    last = ckpt_lib.latest_checkpoint(ckpt_dir) if cfg.resume else None

    def model_apply(p, b):
        return model.apply(p, b, hw_h, hw_w)

    # jitted forward for vis/eval renders — raw model.apply dispatches
    # eagerly (one tunnel round-trip per op on the remote-TPU backend)
    jit_apply = jax.jit(model_apply)

    vgg = VGGLoss(cfg.vgg_weights) if cfg.fit.weights.vgg > 0 else None
    if vgg is not None and not vgg.pretrained:
        print("warning: VGG19 weights unavailable; using fixed random "
              "features for the perceptual loss")

    if not args.run_val:
        fit_cfg = cfg.fit
        if args.steps:
            fit_cfg = FitConfig(lr=fit_cfg.lr, epochs=1,
                                steps_per_epoch=args.steps,
                                weights=fit_cfg.weights)
        optimizer = make_optimizer(params, fit_cfg)
        opt_state = optimizer.init(params)
        start = 0
        if last:
            restored = ckpt_lib.load_checkpoint(
                last, {"params": params, "opt_state": opt_state, "step": 0})
            params, opt_state = restored["params"], restored["opt_state"]
            start = int(restored["step"])
            print(f"resumed from {last} at step {start}")
        step_fn = make_fit_step(model_apply,
                                vgg if vgg and vgg.pretrained else None,
                                optimizer, fit_cfg)
        if fit_cfg.static_prefix_cache:
            # one-shot refits ONE constant frame: precompute the frozen
            # prefix (shade branch + embeddings) once, not every step
            from guassianhand_tpu.train.fit import attach_static_features
            cached = attach_static_features(model, params, batch_fn(0))
            batch_fn = lambda step: cached  # noqa: E731
        logger = RunLogger(run_dir)
        n_steps = fit_cfg.epochs * fit_cfg.steps_per_epoch
        for i in range(start, n_steps):
            batch = batch_fn(i)
            params, opt_state, loss, err = step_fn(params, opt_state, batch)
            if i % 10 == 0 or i == n_steps - 1:
                logger.log(i, {"loss": float(loss),
                               **{k: float(v) for k, v in err.items()}})
                out = jit_apply(params, batch)
                saver.save_rgb(f"vis/step{i:04d}_pred.png",
                               np.asarray(out["comp_rgb"][0, 0]))
                saver.save_rgb(f"vis/step{i:04d}_ref.png",
                               np.asarray(batch["target_rgb"][0]))
        ckpt_lib.save_checkpoint(
            os.path.join(ckpt_dir, f"model-{n_steps:05d}.ckpt"), params,
            opt_state, n_steps)
        out = jit_apply(params, batch_fn(0))
        gs0 = jax.tree_util.tree_map(lambda x: x[0], out["3dgs"])
        saver.save_ply("3dgs/fitted.ply", gs0)
        print(f"fit done; artifacts in {run_dir}")
        return 0

    # --run_val: evaluate
    if last:
        restored = ckpt_lib.load_checkpoint(
            last, {"params": params, "opt_state": None, "step": 0})
        params = restored["params"]
        print(f"evaluating checkpoint {last}")
    # LPIPS (evaluator.py:48-65): scored only when real alexnet weights are
    # available; otherwise omitted AND the omission is stamped into the YAML
    # so random-weight runs are never mistaken for protocol-comparable ones.
    from guassianhand_tpu.train.lpips import LPIPS, lpips_from_01
    lpips_metric = LPIPS(cfg.lpips_weights)

    results = []
    if eval_batches is None:
        eval_batches = (dataset.load_sample(i) for i in range(len(dataset)))
    import time
    t_eval0 = time.perf_counter()
    for i, batch in enumerate(eval_batches):
        out = jit_apply(params, batch)
        pred = np.asarray(out["comp_rgb"][0, 0])
        tgt = np.asarray(batch["target_rgb"][0])
        if "bbox_mask" in batch:
            bm = np.asarray(batch["bbox_mask"])[..., None]
            pred = pred * (bm > 0)
        scores = {"psnr": float(psnr(jnp.asarray(pred), jnp.asarray(tgt))),
                  "mse": float(((pred - tgt) ** 2).mean())}
        if "mask_at_box" in batch:
            pc = bbox_crop(pred, batch["mask_at_box"])
            tc = bbox_crop(tgt, batch["mask_at_box"])
            scores["ssim"] = float(ssim(jnp.asarray(pc), jnp.asarray(tc)))
        else:
            scores["ssim"] = float(ssim(jnp.asarray(pred), jnp.asarray(tgt)))
        if lpips_metric.pretrained:
            # Protocol fidelity: the reference scores LPIPS on RELOADED
            # PNGs (evaluator.py:48-65), i.e. on uint8-quantized images —
            # quantize the same way before scoring.
            pq = np.round(np.clip(pred, 0, 1) * 255.0) / 255.0
            tq = np.round(np.clip(tgt, 0, 1) * 255.0) / 255.0
            scores["lpips"] = float(lpips_from_01(
                lpips_metric, jnp.asarray(pq)[None].astype(jnp.float32),
                jnp.asarray(tq)[None].astype(jnp.float32)))
        results.append(scores)
        if i % 50 == 0:
            print(f"[eval] frame {i}: psnr {scores['psnr']:.2f} "
                  f"({time.perf_counter() - t_eval0:.0f}s elapsed)",
                  flush=True)
        if not args.no_images:
            saver.save_rgb(f"images/frame{i:04d}_pred.png", pred)
            saver.save_rgb(f"images/frame{i:04d}_gt.png", tgt)
    eval_wall_s = time.perf_counter() - t_eval0
    mean = {k: float(np.mean([r[k] for r in results])) for k in results[0]}
    # protocol run metadata (VERDICT r4 item 6): eval-path throughput and
    # device memory at the production shape
    mean["eval_frames"] = len(results)
    mean["eval_wall_s"] = round(eval_wall_s, 2)
    mean["eval_frames_per_s"] = round(len(results) / max(eval_wall_s, 1e-9), 3)
    try:
        ms = jax.local_devices()[0].memory_stats() or {}
        if "peak_bytes_in_use" in ms:
            mean["device_peak_bytes"] = int(ms["peak_bytes_in_use"])
    except Exception:
        pass
    # Provenance stamp: metrics from random-weight perceptual nets are not
    # comparable to the reference protocol — record it in the artifact.
    mean["weights_provenance"] = {
        "vgg19": "pretrained" if (vgg is not None and vgg.pretrained)
                 else "absent_or_random",
        "lpips_alex": "pretrained" if lpips_metric.pretrained else
                      "absent (lpips omitted)",
    }
    out_path = os.path.join(run_dir, "test_metrics.yml")
    with open(out_path, "w") as f:
        yaml.safe_dump(mean, f)
    print("results:", mean, "->", out_path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
