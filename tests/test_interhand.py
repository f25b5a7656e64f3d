"""InterHand2.6M pipeline, exercised end-to-end against a synthetic on-disk
dataset (fake MANO pkls + processed layout), so the loader logic is tested
without the licensed assets."""
import json
import os
import pickle

import numpy as np
import jax.numpy as jnp
import pytest

from guassianhand_tpu.mano.model import MANO_PARENTS, synthetic_mano_model


def _write_fake_mano(path, model):
    """Write a smplx-layout MANO pkl from a synthetic ManoModel."""
    kintree = np.stack([MANO_PARENTS.astype(np.int64),
                        np.arange(16, dtype=np.int64)])
    data = {
        "v_template": np.asarray(model.v_template),
        "shapedirs": np.asarray(model.shapedirs),
        "posedirs": np.asarray(model.posedirs).reshape(
            model.v_template.shape[0] * 3, 135).reshape(
            model.v_template.shape[0], 3, 135),
        "J_regressor": np.asarray(model.j_regressor),
        "weights": np.asarray(model.lbs_weights),
        "kintree_table": kintree,
        "f": np.asarray(model.faces),
    }
    with open(path, "wb") as f:
        pickle.dump(data, f)


@pytest.fixture(scope="module")
def fake_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ih")
    mano_dir = root / "mano"
    mano_dir.mkdir()
    model = synthetic_mano_model(64, seed=0)
    _write_fake_mano(mano_dir / "MANO_RIGHT.pkl", model)
    _write_fake_mano(mano_dir / "MANO_LEFT.pkl", synthetic_mano_model(64, 1))

    mode = "test"
    ann = root / "annotations" / mode
    ann.mkdir(parents=True)
    rng = np.random.RandomState(0)
    manos = {"0": {"123": {
        h: {"pose": rng.uniform(-0.2, 0.2, 48).tolist(),
            "shape": rng.uniform(-0.5, 0.5, 10).tolist(),
            "trans": [0.0, 0.0, 0.0]} for h in ("right", "left")}}}
    joints = {"0": {"123": {"world_coord": (np.zeros((42, 3))).tolist()}}}
    (ann / f"InterHand2.6M_{mode}_MANO_NeuralAnnot.json").write_text(
        json.dumps(manos))
    (ann / f"InterHand2.6M_{mode}_joint_3d.json").write_text(
        json.dumps(joints))

    proc = root / "processed" / mode
    idx_dir = proc / "index_identity_test_i_one_shot"
    idx_dir.mkdir(parents=True)
    for i in (0, 2):
        with open(idx_dir / f"{i}.pkl", "wb") as f:
            pickle.dump({"idx": i, "frame": 123, "capture": 0, "cam": 7}, f)

    anno_dir = proc / "annotation" / "capture0" / "cam7"
    anno_dir.mkdir(parents=True)
    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]], np.float32)
    anno = {"camera": {"R": np.eye(3, dtype=np.float32),
                       "t": np.array([0, 0, 1.0], np.float32),
                       "in_K": K, "campos": np.zeros(3), "camrot": np.eye(3)},
            "image_info": {}}
    with open(anno_dir / "frame123.pkl", "wb") as f:
        pickle.dump(anno, f)

    import PIL.Image

    for kind, arr in [("image", rng.randint(0, 255, (64, 64, 3))),
                      ("mask", np.where(rng.uniform(size=(64, 64)) > 0.5,
                                        255, 0)),
                      ("bbox_mask", np.full((64, 64), 255))]:
        d = proc / kind / "capture0" / "cam7"
        d.mkdir(parents=True)
        PIL.Image.fromarray(arr.astype(np.uint8)).save(d / "frame123.jpg")

    return {"root": str(root), "proc": str(proc.parent),
            "ann": str(root / "annotations"), "mano": str(mano_dir)}


def test_interhand_load_sample(fake_dataset):
    from guassianhand_tpu.data.interhand import (InterHandConfig,
                                                 InterHandDataset)

    cfg = InterHandConfig(
        data_root=fake_dataset["proc"], annot_path=fake_dataset["ann"],
        split="train", edge_subdivide=1, mask_sa=False, render_mask=True,
        mano_models_path=fake_dataset["mano"])
    ds = InterHandDataset(cfg)
    assert len(ds) == 50  # one-shot refit epochs (dataset_one_shot.py:435-439)

    batch = ds.load_sample(0)
    n = batch["points"].shape[1]
    assert batch["points"].shape == (1, n, 3)
    assert batch["vert_uv"].shape == (1, n, 2)
    assert batch["inter_mask"].shape == (1, n)
    assert batch["mano_pose"].shape == (1, 96)
    assert batch["target_rgb"].shape == (1, 64, 64, 3)
    assert batch["target_mask"].shape == (1, 64, 64)
    assert batch["w2c_render"].shape == (1, 1, 4, 4)
    uv = np.asarray(batch["vert_uv"][0])
    assert uv.min() >= 0.0 and uv.max() <= 1.0
    assert np.isfinite(np.asarray(batch["points"])).all()
    # background is zeroed where the mask is off
    img = np.asarray(batch["target_rgb"][0])
    msk = np.asarray(batch["target_mask"][0])
    assert np.abs(img[msk == 0]).max() == 0.0
