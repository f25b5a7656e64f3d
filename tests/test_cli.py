"""CLI smoke tests (tiny configs, CPU interpret mode)."""
import json
import os

import numpy as np
import pytest

TINY_OVERRIDES = [
    "model.camera_embed_dim=32", "model.pose_embed_dim=32",
    "model.plane_size=8", "model.token_channels=32",
    "model.backbone_layers=1", "model.backbone_heads=2",
    "model.backbone_head_dim=16", "model.residual_map_hw=[32,64]",
    "model.interaction_k=8",
    "model.renderer.raster.interpret=true",
    "model.renderer.raster.max_tiles_per_gaussian=4",
    "model.renderer.raster.max_blocks_per_tile=16",
    "data.height=32", "data.width=32", "data.edge_subdivide=0",
    "fit.epochs=1", "fit.steps_per_epoch=2", "fit.weights.vgg=0",
]


def test_config_overrides_reach_nested_dataclasses():
    from guassianhand_tpu.config import load_config

    cfg = load_config(None, TINY_OVERRIDES)
    assert cfg.model.plane_size == 8
    assert cfg.model.renderer.raster.interpret is True
    assert cfg.model.residual_map_hw == (32, 64)
    assert cfg.fit.weights.vgg == 0


@pytest.mark.slow
def test_fit_cli_synthetic_smoke(tmp_path, monkeypatch):
    from guassianhand_tpu.cli import fit_one_shot

    # Small synthetic scene: the CLI builds 778-vert hands; subdivide=0 keeps
    # it manageable on CPU.
    rc = fit_one_shot.main(
        ["--synthetic", "--steps", "2",
         f"out_dir={tmp_path}", "expname=smoke"] + TINY_OVERRIDES)
    assert rc == 0
    run = tmp_path / "smoke"
    assert (run / "config_snapshot.yaml").exists()
    assert (run / "metrics.jsonl").exists()
    assert (run / "3dgs" / "fitted.ply").exists()
    assert (run / "ckpts" / "last.ckpt").exists()
    rec = json.loads((run / "metrics.jsonl").read_text().splitlines()[0])
    assert np.isfinite(rec["loss"])


@pytest.mark.slow
def test_edit_cli_smoke(tmp_path, monkeypatch):
    """Edit CLI end-to-end (infer_one_shot_edit.py:548-636 counterpart):
    the edit flags must reach the renderer's EditConfig and frames + a
    checkpoint must be written."""
    import guassianhand_tpu.render.renderer as renderer_mod
    from guassianhand_tpu.cli import edit

    captured = {}
    real_edit_config = renderer_mod.EditConfig

    def spy_edit_config(*a, **kw):
        cfg = real_edit_config(*a, **kw)
        if kw.get("enabled"):
            captured["edit"] = cfg
        return cfg

    monkeypatch.setattr(renderer_mod, "EditConfig", spy_edit_config)

    rc = edit.main(
        ["--left-only", "--duplication", "--steps", "2", "--identity", "1",
         f"out_dir={tmp_path}", "expname=esmoke"] + TINY_OVERRIDES)
    assert rc == 0
    assert captured["edit"].enabled
    assert captured["edit"].edit_left_only
    assert captured["edit"].duplication
    run = tmp_path / "esmoke_edit"
    assert (run / "vis" / "edit0000.png").exists()
    assert (run / "ckpts" / "edit.ckpt").exists()


@pytest.mark.slow
def test_render_360_cli_smoke(tmp_path):
    from guassianhand_tpu.cli import render_360

    rc = render_360.main(
        ["--views", "3", f"--out={tmp_path}/video",
         f"out_dir={tmp_path}", "expname=r360"] + TINY_OVERRIDES)
    assert rc == 0
    assert os.path.exists(tmp_path / "video" / "0000.png")
    assert os.path.exists(tmp_path / "video" / "turntable.gif")


def test_port_and_eval_dry_run_reports_missing(tmp_path, capsys):
    """The one-command runbook's --dry_run validator (VERDICT r3 item 8):
    with no artifacts on disk it must print the full checklist and exit 2,
    naming the expected path of each missing required artifact
    (infer_one_shot.py:337 ckpt, dataset_one_shot.py:435-481 layout)."""
    from guassianhand_tpu.cli import port_and_eval

    rc = port_and_eval.main(
        ["--torch_ckpt", str(tmp_path / "pretrain_model.ckpt"),
         "--data_root", str(tmp_path / "processed"),
         "--annot_path", str(tmp_path / "annotations"),
         "--mano", str(tmp_path / "mano"), "--dry_run"])
    assert rc == 2
    out = capsys.readouterr().out
    assert "pretrain_model.ckpt" in out
    assert "MISS" in out
    assert "index_identity_test_i_one_shot" in out
    assert "Cannot run" in out


def test_port_and_eval_dry_run_ready(tmp_path, capsys):
    """With a complete (synthetic) artifact tree the dry run must exercise
    the real checkpoint key-mapping and the frame deep-check and exit 0 —
    this is the CI guard that keeps the real-artifact runbook from rotting
    while weights/data stay unavailable (VERDICT r3 item 8)."""
    import pickle

    import PIL.Image
    import torch
    from test_interhand import _write_fake_mano

    from guassianhand_tpu.cli import port_and_eval
    from guassianhand_tpu.mano.model import synthetic_mano_model

    # torch checkpoint whose keys run through the real converter mapping
    ckpt = tmp_path / "pretrain_model.ckpt"
    sd = {"model.camera_embedder.layers.0.weight": torch.zeros(32, 25),
          "model.camera_embedder.layers.0.bias": torch.zeros(32)}
    torch.save({"state_dict": sd}, ckpt)

    # annotations
    ann = tmp_path / "annotations" / "test"
    ann.mkdir(parents=True)
    for stem in ("InterHand2.6M_test_joint_3d.json",
                 "InterHand2.6M_test_MANO_NeuralAnnot.json"):
        (ann / stem).write_text("{}")

    # processed layout + index records the deep-check follows
    proc = tmp_path / "processed" / "test"
    idx = proc / "index_identity_test_i_one_shot"
    idx.mkdir(parents=True)
    rec = {"capture": 0, "cam": 7, "frame": 123}
    for name in ("2.pkl", "10.pkl"):
        with open(idx / name, "wb") as f:
            pickle.dump(rec, f)
    (proc / "annotation" / "capture0" / "cam7").mkdir(parents=True)
    with open(proc / "annotation" / "capture0" / "cam7" / "frame123.pkl",
              "wb") as f:
        pickle.dump({"camera": {}}, f)
    (proc / "image" / "capture0" / "cam7").mkdir(parents=True)
    PIL.Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
        proc / "image" / "capture0" / "cam7" / "frame123.jpg")
    (proc / "mask").mkdir()

    # MANO assets
    mano = tmp_path / "mano"
    mano.mkdir()
    _write_fake_mano(mano / "MANO_RIGHT.pkl", synthetic_mano_model(64, 0))
    _write_fake_mano(mano / "MANO_LEFT.pkl", synthetic_mano_model(64, 1))

    rc = port_and_eval.main(
        ["--torch_ckpt", str(ckpt),
         "--data_root", str(tmp_path / "processed"),
         "--annot_path", str(tmp_path / "annotations"),
         "--mano", str(mano), "--dry_run"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "ready to execute" in out
    assert "source keys" in out  # the key-mapping proof actually ran


@pytest.mark.slow
def test_run_val_protocol_smoke(tmp_path):
    """Eval-protocol smoke (VERDICT r4 item 6): --run_val over a multi-frame
    synthetic split must run the full protocol (per-frame pose variation,
    bbox-crop SSIM via mask_at_box, throughput/memory stamps) and write the
    mean-metric YAML like the reference test_epoch_end
    (infer_one_shot.py:391-402, evaluator.py:85-118)."""
    import yaml
    from guassianhand_tpu.cli import fit_one_shot

    rc = fit_one_shot.main(
        ["--synthetic", "--run_val", "--val_frames", "3", "--no_images",
         f"out_dir={tmp_path}", "expname=valsmoke"] + TINY_OVERRIDES)
    assert rc == 0
    out = yaml.safe_load((tmp_path / "valsmoke" / "test_metrics.yml")
                         .read_text())
    assert out["eval_frames"] == 3
    assert np.isfinite(out["psnr"])
    assert np.isfinite(out["ssim"])  # computed on the bbox crop
    assert out["eval_wall_s"] > 0
    assert "weights_provenance" in out
