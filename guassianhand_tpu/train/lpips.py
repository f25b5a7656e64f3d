"""LPIPS perceptual metric (AlexNet backbone), pure JAX.

Counterpart of the reference's ``lpips.LPIPS(net='alex')`` (evaluator.py:16).
Weight sources (first found wins): ``weights_path`` arg, $GH_LPIPS_WEIGHTS —
a torch state_dict containing the torchvision AlexNet features plus the LPIPS
linear calibration layers (``lin0..lin4``). Without weights a fixed-seed
random AlexNet with uniform lin weights is used (relative comparisons only;
absolute parity with published LPIPS numbers needs the real weights).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

# AlexNet feature convs: (out_ch, kernel, stride, pad, maxpool_before)
_ALEX_PLAN = [
    (64, 11, 4, 2, False),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, True),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
]
# torchvision AlexNet .features conv indices
_ALEX_IDX = [0, 3, 6, 8, 10]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _random_params(seed: int = 0):
    rng = np.random.RandomState(seed)
    convs, lins = [], []
    in_ch = 3
    for out_ch, k, _, _, _ in _ALEX_PLAN:
        fan = in_ch * k * k
        convs.append((rng.normal(0, np.sqrt(2.0 / fan),
                                 (out_ch, in_ch, k, k)).astype(np.float32),
                      np.zeros(out_ch, np.float32)))
        lins.append(np.full((out_ch,), 1.0 / out_ch, np.float32))
        in_ch = out_ch
    return convs, lins


def _load_params(weights_path: Optional[str]):
    path = weights_path or os.environ.get("GH_LPIPS_WEIGHTS")
    if path and os.path.exists(path):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        sd = {k.replace("net.", "").replace("model.", ""): v
              for k, v in sd.items()}
        convs, lins = [], []
        for i, idx in enumerate(_ALEX_IDX):
            for key_w in (f"slice{i+1}.{idx}.weight", f"features.{idx}.weight",
                          f"{idx}.weight"):
                if key_w in sd:
                    break
            key_b = key_w.replace("weight", "bias")
            convs.append((sd[key_w].numpy(), sd[key_b].numpy()))
            lin_key = f"lin{i}.1.weight" if f"lin{i}.1.weight" in sd else \
                f"lins.{i}.1.weight"
            lins.append(sd[lin_key].numpy().reshape(-1))
        return convs, lins, True
    convs, lins = _random_params()
    return convs, lins, False


class LPIPS:
    def __init__(self, weights_path: Optional[str] = None):
        convs, lins, self.pretrained = _load_params(weights_path)
        self.convs = [(jnp.asarray(w.transpose(2, 3, 1, 0)), jnp.asarray(b))
                      for w, b in convs]
        self.lins = [jnp.asarray(l) for l in lins]

    def _features(self, x):
        """x: (B, 3, H, W) in [-1, 1] (lpips input convention)."""
        shift = jnp.asarray(_SHIFT).reshape(1, 3, 1, 1)
        scale = jnp.asarray(_SCALE).reshape(1, 3, 1, 1)
        h = (x - shift) / scale
        h = h.transpose(0, 2, 3, 1)
        outs = []
        for (w, b), (_, k, s, p, pool) in zip(self.convs, _ALEX_PLAN):
            if pool:
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                    "VALID")
            h = jax.lax.conv_general_dilated(
                h, w, (s, s), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            h = jax.nn.relu(h + b)
            outs.append(h)
        return outs

    def __call__(self, x, y):
        """x, y: (B, 3, H, W) in [-1, 1]. Returns scalar distance per batch."""
        fx = self._features(x)
        fy = self._features(y)
        total = 0.0
        for a, b, lin in zip(fx, fy, self.lins):
            an = a / jnp.maximum(
                jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
            bn = b / jnp.maximum(
                jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
            d = (an - bn) ** 2  # (B, H, W, C)
            total = total + (d * lin[None, None, None, :]).sum(-1).mean((1, 2))
        return total


def lpips_from_01(metric: LPIPS, x01, y01):
    """Convenience: images in [0, 1] HWC -> LPIPS inputs."""
    x = x01.transpose(0, 3, 1, 2) * 2.0 - 1.0
    y = y01.transpose(0, 3, 1, 2) * 2.0 - 1.0
    return metric(x, y)
