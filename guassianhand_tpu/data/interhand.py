"""InterHand2.6M one-shot data pipeline.

Counterpart of the reference Dataset (dataset_one_shot.py:84-798), consuming
the same processed layout:

  processed_dataset/{mode}/index_identity_*/{i}.pkl       index records
  processed_dataset/{mode}/annotation/capture{c}/cam{cam}/frame{f}.pkl
  processed_dataset/{mode}/{image,mask,mask_sa,bbox_mask}/capture{c}/...jpg
  InterHand2.6M/annotations/{mode}/InterHand2.6M_{mode}_joint_3d.json
  InterHand2.6M/annotations/{mode}/InterHand2.6M_{mode}_MANO_NeuralAnnot.json

TPU-first split of responsibilities (SURVEY.md §7.1): the host loads pickles,
images and MANO parameters; MANO LBS + edge subdivision + UV lookup run as a
jitted function of (betas, pose, trans) on device (``pose_sample``), instead of
per-sample CPU work in dataloader workers. Static topology (subdivision plans,
barycentric UV tables) is precomputed once at construction.

Split/epoch semantics mirror the reference: 'train' = refit the single
one-shot reference frame (index 2) for 50 steps/epoch; test sequences
'oneshot_reg_i' (14) / 'oneshot_nv' (50) / default (349, stride 10)
(dataset_one_shot.py:435-481).
"""
from __future__ import annotations

import dataclasses
import functools
import json
import os
import pickle
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from guassianhand_tpu.mano.lbs import ManoModel, lbs
from guassianhand_tpu.mano.model import load_mano_model
from guassianhand_tpu.mano.uv import load_uv_atlas, static_vertex_uv
from guassianhand_tpu.ops.knn import interaction_mask
from guassianhand_tpu.ops.subdivision import (build_subdivision_plans,
                                              subdivide_n)
from guassianhand_tpu.data.native_loader import decode_image, native_available
from guassianhand_tpu.data.rays import bounds_from_points, get_mask_at_box


def color_jitter(img: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    """Brightness/contrast/saturation jitter for fitting augmentation
    (dataset_one_shot.py:154-161 ranges). img: (H, W, 3) float [0,1]."""
    b = rng.uniform(0.2, 2.0)
    c = rng.uniform(0.3, 2.0)
    s = rng.uniform(0.2, 2.0)
    out = np.clip(img * b, 0, 1)
    mean = out.mean()
    out = np.clip((out - mean) * c + mean, 0, 1)
    gray = out.mean(-1, keepdims=True)
    return np.clip((out - gray) * s + gray, 0, 1).astype(np.float32)


def fill_holes(mask: np.ndarray) -> np.ndarray:
    """Flood-fill hole closing (FillHole, dataset_one_shot.py:65-82) without
    cv2: fill the background from the border; everything not reached is hole."""
    from scipy import ndimage

    m = mask.astype(bool)
    filled = ndimage.binary_fill_holes(m)
    return filled.astype(mask.dtype)


@dataclasses.dataclass
class InterHandConfig:
    data_root: str = "./processed_dataset"
    annot_path: str = "./InterHand2.6M/annotations"
    mode: str = "test"
    split: str = "train"                  # train/val/test
    pose_sequence: Optional[str] = None   # oneshot_reg_i / oneshot_nv / ...
    edge_subdivide: int = 2
    mask_sa: bool = True
    render_mask: bool = True
    ratio: float = 1.0
    height: int = 256
    width: int = 256
    mano_models_path: Optional[str] = None
    mano_uv_path: Optional[str] = None
    # Edit mode (dataset_one_shot.py:443-481 edit branches + dataset_edit.py):
    # fit frame pinned to index_identity0_train_i/11388.pkl on the train
    # split; the edit target image/mask may come from custom paths (RGBA
    # alpha becomes the mask); test drives index_identity_all_train_i.
    edit: bool = False
    image_path: Optional[str] = None
    mask_path: Optional[str] = None
    color_jitter: bool = False            # one_shot.json "color_jitter"
    use_native_loader: bool = True        # native/gh_loader.cpp decode pool


class InterHandDataset:
    """Host-side loader + device-side posing for the one-shot pipeline."""

    def __init__(self, cfg: InterHandConfig):
        if cfg.edit and cfg.mode != "train":
            # the reference forces mode='train' when editing
            # (dataset_one_shot.py:91-93)
            cfg = dataclasses.replace(cfg, mode="train")
        self.cfg = cfg
        self._rng = np.random.RandomState(0)
        self.mano = {
            "right": load_mano_model("right", cfg.mano_models_path),
            "left": load_mano_model("left", cfg.mano_models_path),
        }
        if self.mano["right"] is None or self.mano["left"] is None:
            raise FileNotFoundError(
                "MANO model pickles not found (set $MANO_MODELS_PATH or "
                "cfg.mano_models_path)")

        ann = os.path.join(cfg.annot_path, cfg.mode)
        with open(os.path.join(
                ann, f"InterHand2.6M_{cfg.mode}_joint_3d.json")) as f:
            self.joints = json.load(f)
        with open(os.path.join(
                ann, f"InterHand2.6M_{cfg.mode}_MANO_NeuralAnnot.json")) as f:
            self.manos = json.load(f)

        # static topology: subdivision plans per hand + packed UV tables
        self._build_topology()

    # ------------------------------------------------------------------ setup
    def _build_topology(self):
        cfg = self.cfg
        self.plans = {}
        self.uv_tables = {}
        atlas = load_uv_atlas(cfg.mano_uv_path)
        for hand in ("right", "left"):
            model: ManoModel = self.mano[hand]
            faces = np.asarray(model.faces)
            nv = model.v_template.shape[0]
            plans = build_subdivision_plans(faces, nv, cfg.edge_subdivide)
            self.plans[hand] = plans
            rest_sub = np.asarray(
                subdivide_n(model.v_template, plans))
            if atlas is not None and "change_r" in atlas:
                # coarse UV mesh from the packed atlas assets
                # (dataset_one_shot.py:141-152): change_* maps UV-vertex ->
                # mesh-vertex; ft_* are faces over UV vertices.
                change = atlas["change_r" if hand == "right" else "change_l"]
                ft = atlas["ft_r"] if hand == "right" else atlas.get(
                    "face_left", atlas["ft_r"])
                vt = atlas["vt"]
                n_uv = vt.shape[0] // 2
                vt_hand = vt[:n_uv] if hand == "right" else vt[n_uv:]
                uv_verts_xyz = np.asarray(model.v_template)[
                    np.asarray(change).astype(int)]
                tri_xyz = uv_verts_xyz[np.asarray(ft).astype(int)]
                tri_uv = vt_hand[np.asarray(ft).astype(int)]
            else:
                from guassianhand_tpu.mano.uv import synthetic_uv_atlas

                uv = synthetic_uv_atlas(np.asarray(model.v_template),
                                        right=(hand == "right"))
                tri_xyz = np.asarray(model.v_template)[faces]
                tri_uv = uv[faces]
            self.uv_tables[hand] = static_vertex_uv(rest_sub, tri_xyz, tri_uv)

        self.vert_uv = np.concatenate(
            [self.uv_tables["right"], self.uv_tables["left"]], axis=0)

    # -------------------------------------------------------------- epochs
    def __len__(self) -> int:
        cfg = self.cfg
        if cfg.split == "train":
            return 100 if cfg.edit else 50
        if cfg.split == "val":
            return 1
        if cfg.pose_sequence == "oneshot_reg_i":
            return 14
        if cfg.pose_sequence == "oneshot_nv":
            return 50
        if cfg.pose_sequence == "oneshot_train":
            return 1
        if cfg.edit:
            return 10000
        return 349

    def _index_record(self, index: int) -> Dict:
        cfg = self.cfg
        base = os.path.join(cfg.data_root, cfg.mode)
        if cfg.split in ("train", "val") or cfg.pose_sequence == "oneshot_train":
            if cfg.edit:
                # fixed edit fit frame (dataset_one_shot.py:474-479)
                sub, idx = "index_identity0_train_i", 11388
            else:
                sub, idx = "index_identity_test_i_one_shot", 2
        elif cfg.pose_sequence == "oneshot_nv":
            sub, idx = "index_identity_os_i_test_nv", index
        elif cfg.edit:
            # edit drive split (dataset_one_shot.py:470-472)
            sub, idx = "index_identity_all_train_i", index * 10
        else:
            sub, idx = "index_identity_test_i_one_shot", index * 10
        with open(os.path.join(base, sub, f"{idx}.pkl"), "rb") as f:
            return pickle.load(f)

    # -------------------------------------------------------------- posing
    @functools.partial(jax.jit, static_argnums=(0,))
    def pose_sample(self, params: Dict[str, jax.Array]) -> jax.Array:
        """Device-side: MANO params -> (N_sub_total, 3) posed points.

        params: dict with {hand}_{pose,shape,trans} arrays."""
        outs = []
        for hand in ("right", "left"):
            v, _ = lbs(self.mano[hand], params[f"{hand}_shape"],
                       params[f"{hand}_pose"], params[f"{hand}_trans"])
            outs.append(subdivide_n(v, self.plans[hand]))
        return jnp.concatenate(outs, axis=0)

    def _mano_params(self, capture_id, frame_idx, t_pose: bool = False):
        rec = self.manos[str(capture_id)][str(frame_idx)]
        out = {}
        for hand in ("right", "left"):
            h = rec[hand]
            if h is None:
                pose = np.zeros(48, np.float32)
                shape = np.zeros(10, np.float32)
                trans = np.zeros(3, np.float32)
            else:
                pose = np.asarray(h["pose"], np.float32).reshape(-1)[:48]
                shape = np.asarray(h["shape"], np.float32).reshape(-1)[:10]
                trans = np.asarray(h["trans"], np.float32).reshape(-1)[:3]
            if t_pose:
                # canonical comparison pose (dataset_one_shot.py:302-308):
                # zero pose, left hand offset so the hands never overlap
                pose = np.zeros(48, np.float32)
                trans = (np.full(3, 0.5, np.float32) if hand == "left"
                         else np.zeros(3, np.float32))
            out[f"{hand}_pose"] = jnp.asarray(pose)
            out[f"{hand}_shape"] = jnp.asarray(shape)
            out[f"{hand}_trans"] = jnp.asarray(trans)
        return out

    # -------------------------------------------------------------- samples
    def _load_images(self, capture_id, cam, frame_idx):
        import PIL.Image

        cfg = self.cfg
        base = os.path.join(cfg.data_root, cfg.mode)
        stem = f"capture{capture_id}/cam{cam}/frame{frame_idx}.jpg"

        use_native = cfg.use_native_loader and native_available()

        def read(kind):
            p = os.path.join(base, kind, stem)
            if not os.path.exists(p):
                return None
            if use_native:
                # native decode pool path (native/gh_loader.cpp); masks are
                # thresholded below so float RGB is fine for them too
                return (decode_image(p) * 255.0).astype(np.uint8)
            return np.asarray(PIL.Image.open(p))

        alpha_mask = None
        if cfg.edit and cfg.image_path:
            # custom edit target (dataset_edit.py image_path/mask_path);
            # RGBA alpha doubles as the mask when no mask_path is given
            pim = PIL.Image.open(cfg.image_path)
            if pim.size != (cfg.width, cfg.height):
                # the reference forces 256^2 for edit targets (dataset_edit.py)
                pim = pim.resize((cfg.width, cfg.height))
            arr = np.asarray(pim)
            if arr.ndim == 3 and arr.shape[-1] == 4:
                alpha_mask = arr[..., 3]  # 0-255; thresholded below
                arr = arr[..., :3]
            img = arr.astype(np.float32) / 255.0
        else:
            img = read("image").astype(np.float32) / 255.0
        if cfg.color_jitter and cfg.split == "train" and not cfg.edit:
            # fitting augmentation (dataset_one_shot.py:154-161)
            img = color_jitter(img, self._rng)
        if alpha_mask is not None and not cfg.mask_path:
            mask = alpha_mask
        elif cfg.edit and cfg.mask_path:
            mask = np.asarray(PIL.Image.open(cfg.mask_path))
        elif cfg.edit:
            # edit mode reads the plain mask dir (dataset_one_shot.py:509-511)
            mask = read("mask")
        else:
            mask_kind = "mask_sa" if cfg.mask_sa else "mask"
            mask = read(mask_kind)
            if mask is None:
                mask = read("mask")
        mask = (mask >= 100).astype(np.uint8)
        if mask.ndim == 3:
            mask = (mask.mean(-1) > 0.5).astype(np.uint8)
        if cfg.render_mask:
            mask = fill_holes(mask)
            mask_mano = read("mask")
            if mask_mano is not None:
                mm = (mask_mano >= 100).astype(np.uint8)
                if mm.ndim == 3:
                    mm = mm[..., 0]
                mask[mm == 0] = 0
        bbox_mask = read("bbox_mask")
        if bbox_mask is None:
            bbox_mask = np.ones_like(mask)
        else:
            bbox_mask = (bbox_mask >= 100).astype(np.uint8)
            if bbox_mask.ndim == 3:
                bbox_mask = bbox_mask[..., 0]

        if cfg.ratio != 1.0:
            import PIL.Image

            h, w = img.shape[:2]
            nh, nw = int(h * cfg.ratio), int(w * cfg.ratio)
            img = np.asarray(PIL.Image.fromarray(
                (img * 255).astype(np.uint8)).resize((nw, nh)),
                np.float32) / 255.0
            mask = np.asarray(PIL.Image.fromarray(
                (mask * 255).astype(np.uint8)).resize(
                    (nw, nh), PIL.Image.NEAREST)) > 127
            mask = mask.astype(np.uint8)
            bbox_mask = np.asarray(PIL.Image.fromarray(
                (bbox_mask * 255).astype(np.uint8)).resize(
                    (nw, nh), PIL.Image.NEAREST)).astype(np.float32) / 255.0

        img = img * (mask > 0)[..., None]  # black background
        return img, mask.astype(np.float32), bbox_mask.astype(np.float32)

    def load_sample(self, index: int) -> Dict:
        """Full batch (B=1) for OneShotAvatarModel + targets + eval extras."""
        cfg = self.cfg
        rec = self._index_record(index)
        capture_id, frame_idx, cam = rec["capture"], rec["frame"], rec["cam"]

        base = os.path.join(cfg.data_root, cfg.mode)
        with open(os.path.join(
                base, "annotation",
                f"capture{capture_id}/cam{cam}/frame{frame_idx}.pkl"),
                "rb") as f:
            anno = pickle.load(f)
        in_R = np.asarray(anno["camera"]["R"], np.float32).reshape(3, 3)
        in_t = np.asarray(anno["camera"]["t"], np.float32).reshape(3)
        K = np.asarray(anno["camera"]["in_K"], np.float32).reshape(3, 3)

        img, mask, bbox_mask = self._load_images(capture_id, cam, frame_idx)
        h, w = img.shape[:2]

        mp = self._mano_params(capture_id, frame_idx)
        mp_t = self._mano_params(capture_id, frame_idx, t_pose=True)
        points = self.pose_sample(mp)
        points_t = self.pose_sample(mp_t)
        inter = interaction_mask(points, points_t)

        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = in_R
        w2c[:3, 3] = in_t
        c2w = np.linalg.inv(w2c)
        K_normed = K.copy()
        K_normed[0] /= w
        K_normed[1] /= h

        bounds = bounds_from_points(np.asarray(points))
        mask_at_box, znear, zfar = get_mask_at_box(bounds, K, in_R, in_t, h, w)

        pose_vec = np.concatenate([np.asarray(mp["right_pose"]),
                                   np.asarray(mp["left_pose"])])
        return {
            "points": points[None],
            "points_tar": points[None],
            "vert_uv": jnp.asarray(self.vert_uv)[None],
            "inter_mask": inter[None],
            "mano_pose": jnp.asarray(pose_vec)[None],
            "c2w": jnp.asarray(c2w)[None],
            "intrinsic_normed": jnp.asarray(K_normed)[None],
            "w2c_render": jnp.asarray(w2c)[None, None],
            "K_render": jnp.asarray(K)[None, None],
            "background": jnp.zeros((1, 3)),
            "target_rgb": jnp.asarray(img)[None],
            "target_mask": jnp.asarray(mask)[None],
            "bbox_mask": bbox_mask,
            "mask_at_box": mask_at_box,
            "capture_id": capture_id,
            "frame_idx": frame_idx,
            "cam": cam,
            "znear": znear,
            "zfar": zfar,
        }
