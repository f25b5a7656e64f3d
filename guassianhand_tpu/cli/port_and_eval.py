"""One-command real-artifact runbook: port the reference checkpoint, fit the
one-shot avatar on InterHand2.6M, and evaluate PSNR/SSIM/LPIPS.

Counterpart of the reference's full inference recipe
(infer_one_shot.py:337-339 checkpoint load + :558-650 fit-and-test driver),
packaged as the single command a reference user runs the moment they have
the real artifacts (which this zero-egress build environment lacks):

    python -m guassianhand_tpu.cli.port_and_eval \
        --torch_ckpt ./EXPERIMENTS/pretrain_model.ckpt \
        --data_root ./processed_dataset \
        --annot_path ./InterHand2.6M/annotations \
        [--mano ./assets/mano] [--uv ./assets/mano_uv] \
        [--dinov2 dinov2_base.bin] [--vgg19 vgg19.pth] [--lpips lpips.pth] \
        [--dry_run] [--steps N] [key.sub=value ...]

``--dry_run`` validates every on-disk artifact this pipeline consumes —
checkpoint keys actually map, dataset layout directories, annotation JSONs,
MANO pickles, UV atlas, metric weights — and prints a checklist of exactly
what is present and what is missing (with the expected path for each), then
exits 0/2. Without ``--dry_run`` it executes the three stages:

  1. port   — ``compat.torch_port.port_reference_checkpoint`` on the torch
              state_dict (plus the optional DINOv2 tree) -> .gh.ckpt
  2. fit    — ``cli.fit_one_shot`` on the pinned one-shot frame with
              ``pretrained:`` pointing at the ported checkpoint
  3. eval   — ``cli.fit_one_shot --run_val`` over the 349-frame test split
              (dataset_one_shot.py:443-451) -> metrics YAML

Each stage is idempotent (the port is skipped if the output exists and is
newer than the source; the fit auto-resumes from last.ckpt).
"""
from __future__ import annotations

import argparse
import os
import sys

OK, MISS, WARN = "ok", "MISSING", "warn"


class Check:
    def __init__(self, name, path, status, detail="", required=True):
        self.name, self.path = name, path
        self.status, self.detail, self.required = status, detail, required

    def row(self):
        flag = {OK: " ok ", MISS: "MISS", WARN: "warn"}[self.status]
        det = f"  ({self.detail})" if self.detail else ""
        return f"[{flag}] {self.name:34s} {self.path}{det}"


def _file(name, path, required=True, detail_missing=""):
    if path and os.path.exists(path):
        return Check(name, path, OK)
    return Check(name, path or "<not given>", MISS if required else WARN,
                 detail_missing, required)


def validate(args, extras):
    """Build the artifact checklist. Touches disk only (no device compute)
    except the checkpoint key-mapping proof, which runs the real converter
    mapping on the real state_dict when the file is present."""
    checks = []

    # 1. the pretrained torch checkpoint, and proof the keys map
    c = _file("pretrain_model.ckpt (torch)", args.torch_ckpt,
              detail_missing="infer_one_shot.py:337 load path")
    if c.status == OK:
        try:
            import torch

            from guassianhand_tpu.compat.torch_port import (
                port_reference_checkpoint)

            raw = torch.load(args.torch_ckpt, map_location="cpu",
                             weights_only=False)
            sd = raw.get("state_dict", raw)
            params, unmapped = port_reference_checkpoint(
                sd, backbone_layers=args.backbone_layers)
            n_src = len(sd)
            c.detail = (f"{n_src} source keys, {len(unmapped)} unmapped "
                        f"(expected: dead reference modules, see PARITY.md)")
        except Exception as e:  # corrupt / wrong file
            c.status, c.detail = MISS, f"loads but does not map: {e!r}"
    checks.append(c)

    # 2. annotations — fit + eval run in mode="test" (InterHandConfig
    #    default); mode="train" is consumed only by the edit pipeline
    for mode, required in (("test", True), ("train", False)):
        ann = os.path.join(args.annot_path, mode)
        for stem in (f"InterHand2.6M_{mode}_joint_3d.json",
                     f"InterHand2.6M_{mode}_MANO_NeuralAnnot.json"):
            checks.append(_file(
                f"annotation ({mode})", os.path.join(ann, stem),
                required=required,
                detail_missing="" if required else "needed only for cli.edit"))

    # 3. processed dataset layout (dataset_one_shot.py:435-481 index files
    #    + per-frame annotation/image/mask trees)
    test_base = os.path.join(args.data_root, "test")
    checks.append(_file("one-shot fit frame index",
                        os.path.join(test_base,
                                     "index_identity_test_i_one_shot",
                                     "2.pkl")))
    checks.append(_file("test split index (stride 10, 349 frames)",
                        os.path.join(test_base,
                                     "index_identity_test_i_one_shot",
                                     "10.pkl")))
    checks.append(_file(
        "novel-view index", os.path.join(
            test_base, "index_identity_os_i_test_nv", "0.pkl"),
        required=False,
        detail_missing="needed only for pose_sequence=oneshot_nv"))
    checks.append(_file(
        "edit fit frame index", os.path.join(
            args.data_root, "train", "index_identity0_train_i", "11388.pkl"),
        required=False, detail_missing="needed only for cli.edit"))
    for kind in ("annotation", "image", "mask"):
        checks.append(_file(f"{kind}/ tree (test)",
                            os.path.join(test_base, kind)))
    for kind in ("mask_sa", "bbox_mask"):
        checks.append(_file(f"{kind}/ tree (test)",
                            os.path.join(test_base, kind), required=False,
                            detail_missing="optional mask flavor"))

    # deep-check one actual frame through the index record, if readable
    idx_path = os.path.join(test_base, "index_identity_test_i_one_shot",
                            "2.pkl")
    if os.path.exists(idx_path):
        try:
            import pickle

            with open(idx_path, "rb") as f:
                rec = pickle.load(f)
            cap, cam, frame = (rec.get("capture_id", rec.get("capture")),
                               rec.get("cam"), rec.get("frame_idx",
                                                       rec.get("frame")))
            stem = f"capture{cap}/cam{cam}/frame{frame}"
            checks.append(_file("fit frame annotation pkl",
                                os.path.join(test_base, "annotation",
                                             f"{stem}.pkl")))
            checks.append(_file("fit frame image",
                                os.path.join(test_base, "image",
                                             f"{stem}.jpg")))
        except Exception as e:
            checks.append(Check("fit frame record", idx_path, MISS,
                                f"unreadable: {e!r}"))

    # 4. MANO + UV assets
    from guassianhand_tpu.mano.model import load_mano_model

    for hand in ("right", "left"):
        m = load_mano_model(hand, args.mano)
        checks.append(Check(
            f"MANO_{hand.upper()}.pkl",
            args.mano or os.environ.get("MANO_MODELS_PATH", "./assets/mano"),
            OK if m is not None else MISS,
            "" if m is not None else "licensed asset; set --mano or "
                                     "$MANO_MODELS_PATH"))
    from guassianhand_tpu.mano.uv import load_uv_atlas

    atlas = load_uv_atlas(args.uv)
    checks.append(Check(
        "UV atlas (hand.obj + change_*.npy)",
        args.uv or os.environ.get("GH_MANO_UV_PATH", "./assets/mano_uv"),
        OK if atlas is not None else WARN,
        "" if atlas is not None else "falls back to synthetic per-vertex UV "
        "(geometry ok, texture layout differs from the reference atlas)",
        required=False))

    # 5. metric / tokenizer weights (optional but needed for parity numbers)
    checks.append(_file("VGG19 weights (loss + eval)",
                        args.vgg19 or os.environ.get("GH_VGG19_WEIGHTS"),
                        required=False,
                        detail_missing="vgg loss term disabled without it"))
    checks.append(_file("LPIPS (alex) weights",
                        args.lpips or os.environ.get("GH_LPIPS_WEIGHTS"),
                        required=False,
                        detail_missing="LPIPS falls back to provenance-"
                                       "stamped random net"))
    checks.append(_file("DINOv2 state_dict", args.dinov2, required=False,
                        detail_missing="image tokenizer keeps the ported "
                                       "reference weights if the ckpt has "
                                       "them; else random init"))
    return checks


def main(argv=None):
    parser = argparse.ArgumentParser("guassianhand-tpu port-and-eval")
    parser.add_argument("--torch_ckpt", required=True)
    parser.add_argument("--data_root", default="./processed_dataset")
    parser.add_argument("--annot_path", default="./InterHand2.6M/annotations")
    parser.add_argument("--mano", default=None,
                        help="dir holding MANO_RIGHT.pkl / MANO_LEFT.pkl")
    parser.add_argument("--uv", default=None, help="mano_uv asset dir")
    parser.add_argument("--dinov2", default=None)
    parser.add_argument("--vgg19", default=None)
    parser.add_argument("--lpips", default=None)
    parser.add_argument("--backbone_layers", type=int, default=10)
    parser.add_argument("--out", default=None,
                        help="ported checkpoint path (default: "
                             "<torch_ckpt>.gh.ckpt)")
    parser.add_argument("--expname", default="port_and_eval")
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--dry_run", action="store_true")
    args, extras = parser.parse_known_args(argv)

    checks = validate(args, extras)
    print("== port-and-eval artifact checklist ==")
    for c in checks:
        print(c.row())
    missing = [c for c in checks if c.status == MISS and c.required]
    warns = [c for c in checks if c.status in (MISS, WARN) and not c.required]
    print(f"== {len(checks) - len(missing) - len(warns)} ok, "
          f"{len(missing)} missing (required), {len(warns)} degraded ==")
    if missing:
        print("Cannot run: supply the required artifacts above.")
        return 2
    if args.dry_run:
        print("Dry run: all required artifacts present — ready to execute.")
        return 0

    # ---- stage 1: port --------------------------------------------------
    out_ckpt = args.out or (args.torch_ckpt + ".gh.ckpt")
    if (os.path.exists(out_ckpt)
            and os.path.getmtime(out_ckpt) >= os.path.getmtime(
                args.torch_ckpt)):
        print(f"[1/3] port: {out_ckpt} is up to date, skipping")
    else:
        print(f"[1/3] port: {args.torch_ckpt} -> {out_ckpt}")
        from guassianhand_tpu.cli import port_checkpoint

        pc_argv = ["--torch_ckpt", args.torch_ckpt, "--out", out_ckpt,
                   "--backbone_layers", str(args.backbone_layers)]
        if args.dinov2:
            pc_argv += ["--dinov2", args.dinov2]
        port_checkpoint.main(pc_argv)

    # ---- stages 2+3: fit, then eval -------------------------------------
    from guassianhand_tpu.cli import fit_one_shot

    overrides = [
        f"pretrained={out_ckpt}",
        f"data.data_root={args.data_root}",
        f"data.annot_path={args.annot_path}",
        f"expname={args.expname}",
    ]
    if args.mano:
        overrides.append(f"data.mano_models_path={args.mano}")
    if args.uv:
        overrides.append(f"data.mano_uv_path={args.uv}")
    if args.vgg19:
        overrides.append(f"vgg_weights={args.vgg19}")
    if args.lpips:
        overrides.append(f"lpips_weights={args.lpips}")
    overrides += extras

    fit_argv = overrides[:]
    if args.steps is not None:
        fit_argv = ["--steps", str(args.steps)] + fit_argv
    print("[2/3] fit: cli.fit_one_shot", " ".join(fit_argv))
    fit_one_shot.main(fit_argv)

    print("[3/3] eval: cli.fit_one_shot --run_val")
    fit_one_shot.main(["--run_val"] + overrides)
    print(f"done — metrics YAML under EXPERIMENTS/{args.expname}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
