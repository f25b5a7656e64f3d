"""VGG19 perceptual loss (JAX), 4 feature slices.

Counterpart of the reference VGGLoss (utils.py:875-930): ImageNet
normalization, features after relu1_1 / relu2_1 / relu3_1 / relu4_1 (layer
ranges [0:2), [2:7), [7:12), [12:21) of torchvision's vgg19.features), L1
distance with weights [1/16, 1/8, 1/4, 1] and the target branch detached.

Weights: pass a torchvision ``vgg19`` state_dict .pth via ``weights_path`` (or
$GH_VGG19_WEIGHTS). With no weights available (zero-egress environments) a
fixed-seed random network is used — random VGG features are still a usable
perceptual prior for one-shot fitting, but metric parity with the reference
requires the pretrained weights.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

# (out_channels per conv) for the first 8 convs of VGG19 and where slices end.
# torchvision vgg19.features indices: conv(0) relu(1) conv(2) relu(3) pool(4)
# conv(5) relu(6) conv(7) relu(8) pool(9) conv(10) relu(11) conv(12) relu(13)
# conv(14) relu(15) conv(16) relu(17) pool(18) conv(19) relu(20) ...
_CONV_PLAN = [
    # (name in state_dict, out_ch, maxpool_before)
    ("features.0", 64, False),    # conv1_1
    ("features.2", 64, False),    # conv1_2   [slice1 ends after relu1_1 (idx 1)]
    ("features.5", 128, True),    # conv2_1   [slice2 ends after relu2_1 (idx 6)]
    ("features.7", 128, False),   # conv2_2
    ("features.10", 256, True),   # conv3_1   [slice3 ends after relu3_1 (idx 11)]
    ("features.12", 256, False),  # conv3_2
    ("features.14", 256, False),  # conv3_3
    ("features.16", 256, False),  # conv3_4
    ("features.19", 512, True),   # conv4_1   [slice4 ends after relu4_1 (idx 20)]
]
# index into _CONV_PLAN after whose relu a slice output is taken
_SLICE_AFTER = [0, 2, 4, 8]
SLICE_WEIGHTS = (1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)


def _random_params(seed: int = 0):
    rng = np.random.RandomState(seed)
    params = []
    in_ch = 3
    for _, out_ch, _ in _CONV_PLAN:
        fan_in = in_ch * 9
        w = rng.normal(0, np.sqrt(2.0 / fan_in),
                       (out_ch, in_ch, 3, 3)).astype(np.float32)
        b = np.zeros((out_ch,), np.float32)
        params.append((w, b))
        in_ch = out_ch
    return params


def load_vgg19_params(weights_path: Optional[str] = None):
    """Returns list of (w (O,I,3,3), b (O,)) numpy arrays; random if missing."""
    path = weights_path or os.environ.get("GH_VGG19_WEIGHTS")
    if path and os.path.exists(path):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        params = []
        for name, out_ch, _ in _CONV_PLAN:
            w = sd[f"{name}.weight"].numpy().astype(np.float32)
            b = sd[f"{name}.bias"].numpy().astype(np.float32)
            assert w.shape[0] == out_ch
            params.append((w, b))
        return params, True
    return _random_params(), False


class VGGLoss:
    """Callable perceptual loss; construct once, use inside jit."""

    def __init__(self, weights_path: Optional[str] = None,
                 compute_dtype: Optional[str] = None):
        """compute_dtype="bfloat16" runs the frozen conv stacks on the MXU
        in bf16 (VERDICT r4 item 7) — the same class of frozen-weight
        matmul the bf16 feature pipeline already won 1.56x on. Weights are
        STORED fp32 (ports unchanged) and cast per conv; the ImageNet
        normalization and the final per-slice L1 means stay fp32. Gated
        with the rest of the bf16 pipeline by scripts/bf16_psnr_gate.py."""
        params, self.pretrained = load_vgg19_params(weights_path)
        # HWIO layout for lax.conv
        self.params = [(jnp.asarray(w.transpose(2, 3, 1, 0)), jnp.asarray(b))
                       for w, b in params]
        self.compute_dtype = (jnp.dtype(compute_dtype) if compute_dtype
                              else None)

    def features(self, x: jax.Array) -> Sequence[jax.Array]:
        """x: (B, 3, H, W) in [0,1]. Returns the 4 slice activations."""
        mean = jnp.asarray(IMAGENET_MEAN).reshape(1, 3, 1, 1)
        std = jnp.asarray(IMAGENET_STD).reshape(1, 3, 1, 1)
        h = (x - mean) / std
        h = h.transpose(0, 2, 3, 1)  # NHWC
        if self.compute_dtype is not None:
            h = h.astype(self.compute_dtype)
        outs = []
        for i, ((w, b), (_, _, pool)) in enumerate(zip(self.params, _CONV_PLAN)):
            if pool:
                # init value must be the LITERAL -inf scalar (weakly typed,
                # casts to bf16 fine) for JAX to recognize the max-pool and
                # emit its VJP — a finite finfo.min OR a traced
                # jnp.asarray(-inf) constant both fail reverse-mode with
                # "Linearization failed" (measured on the r5 TPU runs)
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID")
            if self.compute_dtype is not None:
                w = w.astype(self.compute_dtype)
                b = b.astype(self.compute_dtype)
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            h = jax.nn.relu(h + b)
            if i in _SLICE_AFTER:
                outs.append(h)
        return outs

    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        """x, y: (B, 3, H, W) in [0,1]; y is the (detached) target."""
        fx = self.features(x)
        fy = self.features(jax.lax.stop_gradient(y))
        loss = jnp.asarray(0.0)
        for wgt, a, b in zip(SLICE_WEIGHTS, fx, fy):
            # per-slice L1 reduces in fp32 regardless of compute_dtype
            loss = loss + wgt * jnp.abs(a.astype(jnp.float32)
                                        - b.astype(jnp.float32)).mean()
        return loss
