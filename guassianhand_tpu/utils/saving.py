"""Image / grid / video-frame export.

Counterpart of the reference SaverMixin (tgs/utils/saving.py:17-315): save-dir
management, RGB / grayscale / grid image export and frame sequences (the
reference's per-step visual-debug dumps, infer_one_shot.py:493-510). PLY export
lives on ``core.gaussians.Gaussians.to_ply``.
"""
from __future__ import annotations

import os
from typing import Iterable, Optional, Sequence

import numpy as np


def _to_uint8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255.0).round().astype(np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    return img


def save_image(path: str, img) -> str:
    import PIL.Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    PIL.Image.fromarray(_to_uint8(img)).save(path)
    return path


def save_image_grid(path: str, imgs: Sequence, cols: Optional[int] = None) -> str:
    imgs = [_to_uint8(i) for i in imgs]
    h, w = imgs[0].shape[:2]
    cols = cols or len(imgs)
    rows = -(-len(imgs) // cols)
    grid = np.zeros((rows * h, cols * w, 3), np.uint8)
    for k, im in enumerate(imgs):
        r, c = divmod(k, cols)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = im
    return save_image(path, grid)


def save_gif(path: str, frames: Sequence, fps: int = 20) -> str:
    """Animated GIF from float [0,1] HWC frames (turntable previews)."""
    import PIL.Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imgs = [PIL.Image.fromarray(_to_uint8(f)) for f in frames]
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / fps), loop=0)
    return path


def save_video(path: str, frames: Sequence, fps: int = 20) -> str:
    """mp4 export via imageio-ffmpeg when available; GIF fallback otherwise.

    The reference saves frame sequences / videos through SaverMixin
    (tgs/utils/saving.py:266-315); this is the TPU repo's equivalent with a
    dependency-gated encoder.
    """
    try:
        import imageio.v2 as imageio  # needs the ffmpeg plugin for mp4

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with imageio.get_writer(path, fps=fps) as w:
            for f in frames:
                w.append_data(_to_uint8(f))
        return path
    except Exception:
        alt = os.path.splitext(path)[0] + ".gif"
        return save_gif(alt, frames, fps=fps)


def save_video_frames(dirname: str, frames: Iterable, prefix: str = "") -> list:
    paths = []
    for i, f in enumerate(frames):
        paths.append(save_image(os.path.join(dirname, f"{prefix}{i:04d}.png"), f))
    return paths


class Saver:
    """Save-dir scoped helper (SaverMixin equivalent)."""

    def __init__(self, save_dir: str):
        self.save_dir = save_dir
        os.makedirs(save_dir, exist_ok=True)

    def path(self, *parts: str) -> str:
        p = os.path.join(self.save_dir, *parts)
        os.makedirs(os.path.dirname(p) or ".", exist_ok=True)
        return p

    def save_rgb(self, name: str, img) -> str:
        return save_image(self.path(name), img)

    def save_grid(self, name: str, imgs, cols=None) -> str:
        return save_image_grid(self.path(name), imgs, cols)

    def save_ply(self, name: str, gaussians) -> str:
        p = self.path(name)
        gaussians.to_ply(p)
        return p
