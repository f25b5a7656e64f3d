"""Port the reference's torch checkpoints into this framework's flax params.

Counterpart of the reference's pretrained load (infer_one_shot.py:337-339:
``torch.load('./EXPERIMENTS/pretrain_model.ckpt'); load_state_dict(strict=False)``).
The mapping below translates the reference's module tree (TGS, SURVEY.md §2.3)
into OneShotAvatarModel's parameter tree. torch ``Linear.weight`` is (out, in)
-> flax ``kernel`` (in, out); ``ConvTranspose2d.weight`` is (in, out, kh, kw)
-> flax (kh, kw, in, out).

Anything without a counterpart (e.g. the DINOv2 tokenizer internals, dead
VANeRF modules) is skipped and reported; missing keys keep their initialized
values — the same strict=False semantics as the reference.
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def _lin(sd, prefix):
    """torch Linear -> {'kernel', 'bias'}"""
    out = {"kernel": np.asarray(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _ln(sd, prefix):
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _mlp(sd, prefix, n_hidden_layers):
    """reference networks.MLP (Sequential of Linear/act) -> our MLP Dense_i.

    Sequential indices: 0, 2, 4, ... are Linear layers."""
    out = {}
    for i in range(n_hidden_layers + 1):
        out[f"Dense_{i}"] = _lin(sd, f"{prefix}.layers.{2 * i}")
    return out


def _mlp_block(sd, prefix):
    """verts_refinement.MLP_block: layer_norm, fc1, fc2."""
    return {"LayerNorm_0": _ln(sd, f"{prefix}.layer_norm"),
            "Dense_0": _lin(sd, f"{prefix}.fc1"),
            "Dense_1": _lin(sd, f"{prefix}.fc2")}


def _resnet_fc(sd, prefix):
    out = {"Dense_0": _lin(sd, f"{prefix}.fc_0"),
           "Dense_1": _lin(sd, f"{prefix}.fc_1")}
    if f"{prefix}.shortcut.weight" in sd:
        out["Dense_2"] = {"kernel": np.asarray(sd[f"{prefix}.shortcut.weight"]).T}
    return out


def _pointnet(sd, prefix, n_blocks=5):
    out = {"Dense_0": _lin(sd, f"{prefix}.fc_pos"),
           "Dense_1": _lin(sd, f"{prefix}.fc_c")}
    for i in range(n_blocks):
        out[f"block_{i}"] = _resnet_fc(sd, f"{prefix}.blocks.{i}")
    return out


def _attention(sd, prefix):
    """diffusers Attention: to_q/to_k/to_v (no bias) + to_out.0."""
    return {
        "Dense_0": {"kernel": np.asarray(sd[f"{prefix}.to_q.weight"]).T},
        "Dense_1": {"kernel": np.asarray(sd[f"{prefix}.to_k.weight"]).T},
        "Dense_2": {"kernel": np.asarray(sd[f"{prefix}.to_v.weight"]).T},
        "Dense_3": _lin(sd, f"{prefix}.to_out.0"),
    }


def _transformer_block(sd, prefix):
    out = {
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "attn1": _attention(sd, f"{prefix}.attn1"),
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "attn2": _attention(sd, f"{prefix}.attn2"),
        "norm3": _ln(sd, f"{prefix}.norm3"),
        "ff": {"GEGLU_0": {"Dense_0": _lin(sd, f"{prefix}.ff.net.0.proj")},
               "Dense_0": _lin(sd, f"{prefix}.ff.net.2")},
    }
    return out


def _transformer1d(sd, prefix, num_layers=10):
    out = {
        "GroupNorm_0": {"scale": np.asarray(sd[f"{prefix}.norm.weight"]),
                        "bias": np.asarray(sd[f"{prefix}.norm.bias"])},
        "Dense_0": _lin(sd, f"{prefix}.proj_in"),
        "Dense_1": _lin(sd, f"{prefix}.proj_out"),
    }
    for i in range(num_layers):
        out[f"block_{i}"] = _transformer_block(
            sd, f"{prefix}.transformer_blocks.{i}")
    return out


def _gs_layer(sd, prefix):
    """GSLayer out_layers in feature_channels order (renderer_one_shot.py:
    config order xyz, scaling, rotation, opacity, shs)."""
    names = ["xyz", "scaling", "rotation", "opacity", "shs"]
    return {name: _lin(sd, f"{prefix}.out_layers.{i}")
            for i, name in enumerate(names)}


def _valid_head(sd, prefix):
    return {"MLPBlock_0": _mlp_block(sd, f"{prefix}.ff"),
            "Dense_0": _lin(sd, f"{prefix}.fc")}


def _self_attn(sd, prefix):
    return {
        "LayerNorm_0": _ln(sd, f"{prefix}.layer_norm"),
        "Dense_0": _lin(sd, f"{prefix}.w_qs"),
        "Dense_1": _lin(sd, f"{prefix}.w_ks"),
        "Dense_2": _lin(sd, f"{prefix}.w_vs"),
        "Dense_3": _lin(sd, f"{prefix}.fc"),
        "MLPResBlock_0": {
            "LayerNorm_0": _ln(sd, f"{prefix}.ff.layer_norm"),
            "Dense_0": _lin(sd, f"{prefix}.ff.fc1"),
            "Dense_1": _lin(sd, f"{prefix}.ff.fc2"),
        },
    }


def _conv_transpose(sd, prefix):
    w = np.asarray(sd[f"{prefix}.weight"])  # (in, out, kh, kw)
    return {"kernel": w.transpose(2, 3, 0, 1),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _tokenizer(sd, prefix):
    return {"embeddings": np.asarray(sd[f"{prefix}.embeddings"])}


def port_reference_checkpoint(state_dict: Dict[str, Any],
                              backbone_layers: int = 10
                              ) -> Tuple[Dict[str, Any], List[str]]:
    """torch state_dict (possibly Lightning 'model.'-prefixed) -> partial
    flax params dict for OneShotAvatarModel + list of unmapped source keys.

    Merge the result over initialized params with
    train.checkpoints-style partial semantics (only returned leaves replace).
    """
    sd = {}
    for k, v in state_dict.items():
        if hasattr(v, "numpy"):
            v = v.detach().cpu().numpy() if hasattr(v, "detach") else v.numpy()
        sd[k.replace("model.", "", 1) if k.startswith("model.") else k] = v

    used: set = set()
    orig_get = dict.__getitem__

    class Track(dict):
        def __getitem__(self, key):
            used.add(key)
            return orig_get(self, key)

        def __contains__(self, key):
            return dict.__contains__(self, key)

    sd = Track(sd)

    params: Dict[str, Any] = {}

    def attempt(name, fn, *args):
        try:
            params[name] = fn(sd, *args)
        except KeyError:
            pass

    attempt("camera_embedder", _mlp, "camera_embedder", 1)
    attempt("pose_embedder", _mlp, "pose_embedder", 1)
    attempt("point_encoder_texture", _pointnet, "point_encoder_texture")
    attempt("point_encoder_shade", _pointnet, "point_encoder_shade")
    attempt("tokenizer_texture", _tokenizer, "tokenizer_texture")
    attempt("tokenizer_shade", _tokenizer, "tokenizer_shade")
    attempt("backbone", _transformer1d, "backbone", backbone_layers)
    attempt("backbone_shade", _transformer1d, "backbone_shade",
            backbone_layers)
    attempt("post_processor_texture",
            lambda s, p: {"ConvTranspose_0": _conv_transpose(s, f"{p}.upsample")},
            "post_processor_texture")
    attempt("additional_features_fc",
            lambda s, p: {"MLPBlock_0": _mlp_block(s, f"{p}.ff1")},
            "additional_features_fc")

    renderer: Dict[str, Any] = {}

    def attempt_r(name, fn, *args):
        try:
            renderer[name] = fn(sd, *args)
        except KeyError:
            pass

    attempt_r("mlp_net", _mlp, "renderer.mlp_net", 2)
    attempt_r("gs_net", _gs_layer, "renderer.gs_net")
    attempt_r("gs_valid", _valid_head, "renderer.gs_valid")
    attempt_r("vert_pos_refinement", _valid_head, "renderer.vert_pos_refinement")
    if renderer:
        params["renderer"] = renderer
    try:
        params["self_attn_layer"] = _self_attn(sd, "renderer.self_attn_layer")
    except KeyError:
        pass

    # per-identity learnables: direct copies
    for key in ("identity_code_book", "identity_code_one_shot", "map_bias",
                "color_w", "color_b", "xyz_b", "xyz_b_map", "opacity_b"):
        if key in sd:
            v = np.asarray(sd[key])
            used.add(key)
            if key in ("identity_code_book", "identity_code_one_shot"):
                # reference shape (*, 1, C, H, W) -> ours (*, C, H, W)
                v = v.reshape(v.shape[0], *v.shape[-3:]) if v.ndim == 5 else v
            params[key] = v

    unmapped = sorted(set(dict.keys(sd)) - used)
    return params, unmapped


def merge_ported(params_init: Dict[str, Any], ported: Dict[str, Any]):
    """Overlay ported leaves onto an initialized flax params tree (shapes must
    match; mismatches keep the init and are reported)."""
    import jax.numpy as jnp

    skipped = []

    def merge(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            if k not in out:
                skipped.append(f"{path}{k} (absent)")
                continue
            if isinstance(v, dict):
                out[k] = merge(out[k], v, f"{path}{k}/")
            else:
                if tuple(out[k].shape) == tuple(np.shape(v)):
                    out[k] = jnp.asarray(v, out[k].dtype)
                else:
                    skipped.append(
                        f"{path}{k} (shape {np.shape(v)} vs {out[k].shape})")
        return out

    inner = params_init["params"] if "params" in params_init else params_init
    merged = merge(inner, ported)
    if "params" in params_init:
        return {**params_init, "params": merged}, skipped
    return merged, skipped
