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

import jax
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
    """torch ConvTranspose2d (in, out, kh, kw) -> flax nn.ConvTranspose
    (kh, kw, in, out). The two conventions differ by a SPATIAL FLIP of the
    kernel (torch scatters w[.., kh, kw] to output offset (kh, kw); flax's
    lax.conv_transpose is the mirrored gradient-of-conv) — without the
    [::-1, ::-1] every 2x2 upsampled block comes out transposed (caught by
    tests/test_compat.py::test_triplane_upsampler_port_matches_torch_forward).
    """
    w = np.asarray(sd[f"{prefix}.weight"])  # (in, out, kh, kw)
    return {"kernel": w.transpose(2, 3, 0, 1)[::-1, ::-1].copy(),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _tokenizer(sd, prefix):
    return {"embeddings": np.asarray(sd[f"{prefix}.embeddings"])}


def _conv1d(sd, prefix):
    """kernel-1 Conv1d (out, in, 1) -> Dense kernel (in, out)."""
    out = {"kernel": np.asarray(sd[f"{prefix}.weight"])[:, :, 0].T}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _conv2d_k1(sd, prefix):
    """kernel-1 Conv2d (out, in, 1, 1) -> Dense kernel (in, out)."""
    return {"kernel": np.asarray(sd[f"{prefix}.weight"])[:, :, 0, 0].T,
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _mlp_conv(sd, prefix, n=2):
    """snowflake MLP_CONV: convs at mlp.{0, 2, ...} -> Dense_i."""
    return {f"Dense_{i}": _conv1d(sd, f"{prefix}.mlp.{2 * i}")
            for i in range(n)}


def _mlp_res(sd, prefix):
    return {"conv_1": _conv1d(sd, f"{prefix}.conv_1"),
            "conv_2": _conv1d(sd, f"{prefix}.conv_2"),
            "conv_shortcut": _conv1d(sd, f"{prefix}.conv_shortcut")}


def _bn(sd, prefix):
    """BatchNorm (+ running stats) -> FrozenBatchNorm params."""
    sd[f"{prefix}.num_batches_tracked"]  # mark consumed
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"]),
            "mean": np.asarray(sd[f"{prefix}.running_mean"]),
            "var": np.asarray(sd[f"{prefix}.running_var"])}


def _conv_bn_conv(sd, prefix):
    """Sequential(Conv2d k1, BatchNorm2d, ReLU, Conv2d k1) -> ConvBNConv."""
    return {"fc1": _conv2d_k1(sd, f"{prefix}.0"),
            "bn": _bn(sd, f"{prefix}.1"),
            "fc2": _conv2d_k1(sd, f"{prefix}.3")}


def _skip_transformer(sd, prefix):
    return {
        "mlp_v": _mlp_res(sd, f"{prefix}.mlp_v"),
        "conv_key": _conv1d(sd, f"{prefix}.conv_key"),
        "conv_query": _conv1d(sd, f"{prefix}.conv_query"),
        "conv_value": _conv1d(sd, f"{prefix}.conv_value"),
        "pos_mlp": _conv_bn_conv(sd, f"{prefix}.pos_mlp"),
        "attn_mlp": _conv_bn_conv(sd, f"{prefix}.attn_mlp"),
        "conv_end": _conv1d(sd, f"{prefix}.conv_end"),
    }


def _spd_pp(sd, prefix):
    """SPD_pp upper block -> nn.snowflake.SPDpp params."""
    return {
        "mlp_1": _mlp_conv(sd, f"{prefix}.mlp_1"),
        "mlp_2": _mlp_conv(sd, f"{prefix}.mlp_2"),
        "skip_transformer": _skip_transformer(sd, f"{prefix}.skip_transformer"),
        "mlp_ps": _mlp_conv(sd, f"{prefix}.mlp_ps"),
        # ConvTranspose1d (in, out, k): same layout as PointSplit's kernel
        "ps": {"kernel": np.asarray(sd[f"{prefix}.ps.weight"])},
        "mlp_delta_feature": _mlp_res(sd, f"{prefix}.mlp_delta_feature"),
        "mlp_delta": _mlp_conv(sd, f"{prefix}.mlp_delta"),
    }


def _snowflake_decoder(sd, prefix, n_uppers=2):
    out = {"mlp_feat_cond": _mlp_conv(sd, f"{prefix}.mlp_feat_cond")}
    for i in range(n_uppers):
        out[f"uppers_{i}"] = _spd_pp(sd, f"{prefix}.uppers.{i}")
    return out


def _modulation(sd, prefix):
    """single-layer Modulation: just linear2 (transformers.py:573-593)."""
    return {"linear2": _lin(sd, f"{prefix}.linear2")}


def _image_tokenizer_modulations(sd, prefix, n_layers=12):
    """modulations.{2i, 2i+1} -> layer_i.{norm1,norm2}_modulation."""
    out = {}
    for i in range(n_layers):
        out[f"layer_{i}"] = {
            "norm1_modulation": _modulation(sd, f"{prefix}.{2 * i}"),
            "norm2_modulation": _modulation(sd, f"{prefix}.{2 * i + 1}"),
        }
    return out


def _point_generator(sd, prefix):
    """pointcloud_generator subtree -> models.point_generator params."""
    out = {}

    def attempt(name, fn, *args):
        try:
            out[name] = fn(sd, *args)
        except KeyError:
            pass

    attempt("camera_embedder", _mlp, f"{prefix}.camera_embedder", 1)
    attempt("image_tokenizer", _image_tokenizer_modulations,
            f"{prefix}.image_tokenizer.modulations")
    attempt("tokenizer",
            lambda s, p: {"pcl_embeddings":
                          np.asarray(s[f"{p}.pcl_embeddings.weight"])},
            f"{prefix}.tokenizer")
    attempt("backbone", _transformer1d, f"{prefix}.backbone", 10)
    attempt("post_processor",
            lambda s, p: {"point_layer": _lin(s, f"{p}.point_layer")},
            f"{prefix}.post_processor")
    attempt("pointcloud_upsampling", _snowflake_decoder,
            f"{prefix}.pointcloud_upsampling.decoder")
    return out


# HF dinov2-base key prefixes -> nn.image_tokenizer.ImageTokenizer params.
def port_dinov2_backbone(state_dict, num_layers: int = 12):
    """Map an HF `facebook/dinov2-base` torch state_dict into the
    ImageTokenizer layout (the backbone weights the reference downloads at
    model build, tgs/models/tokenizers/image.py:33-50; NOT part of the
    pretrain ckpt because freeze_backbone_params registers a non-module).

    Returns (params, unmapped_keys)."""
    sd = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        sd[k.replace("dinov2.", "", 1) if k.startswith("dinov2.") else k] = \
            np.asarray(v)

    used = set()

    def get(key):
        used.add(key)
        return sd[key]

    params = {
        "cls_token": get("embeddings.cls_token"),
        "pos_embed": get("embeddings.position_embeddings"),
        "patch_embed": {
            # torch Conv2d (out, in, kh, kw) -> flax (kh, kw, in, out)
            "kernel": get("embeddings.patch_embeddings.projection.weight"
                          ).transpose(2, 3, 1, 0),
            "bias": get("embeddings.patch_embeddings.projection.bias"),
        },
        "layernorm": {"scale": get("layernorm.weight"),
                      "bias": get("layernorm.bias")},
    }
    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        lin = lambda name: {"kernel": get(f"{p}.{name}.weight").T,
                            "bias": get(f"{p}.{name}.bias")}
        params[f"layer_{i}"] = {
            "norm1": {"scale": get(f"{p}.norm1.weight"),
                      "bias": get(f"{p}.norm1.bias")},
            "attention": {
                "query": lin("attention.attention.query"),
                "key": lin("attention.attention.key"),
                "value": lin("attention.attention.value"),
                "dense": lin("attention.output.dense"),
            },
            "layer_scale1": {"lambda1": get(f"{p}.layer_scale1.lambda1")},
            "norm2": {"scale": get(f"{p}.norm2.weight"),
                      "bias": get(f"{p}.norm2.bias")},
            "fc1": lin("mlp.fc1"),
            "fc2": lin("mlp.fc2"),
            "layer_scale2": {"lambda1": get(f"{p}.layer_scale2.lambda1")},
        }
    # mask_token exists in the HF ckpt but has no inference-path counterpart
    unmapped = sorted(set(sd) - used - {"embeddings.mask_token"})
    return params, unmapped


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
    attempt("post_processor",
            lambda s, p: {"ConvTranspose_0": _conv_transpose(s, f"{p}.upsample")},
            "post_processor")
    attempt("pointcloud_generator", _point_generator, "pointcloud_generator")
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


def stack_transformer_blocks(tree: Dict[str, Any]) -> Dict[str, Any]:
    """Convert unrolled Transformer1D params (block_0..block_{L-1}) to the
    nn.scan layout (a single "blocks" subtree with a stacked leading axis).

    Use after port_reference_checkpoint when the target model runs
    ``Transformer1D(scan=True)``. Only transformer blocks are converted
    (identified by their "attn1" submodule) — pointnet ResNet ``block_i``
    subtrees are left untouched. Pure tree transform; values unchanged.
    """
    def is_tblock(v):
        return isinstance(v, dict) and "attn1" in v

    def rec(node):
        if not isinstance(node, dict):
            return node
        tblocks = sorted((k for k in node
                          if k.startswith("block_") and is_tblock(node[k])),
                         key=lambda k: int(k.split("_")[1]))
        out = {k: rec(v) for k, v in node.items() if k not in tblocks}
        if tblocks:
            stacked = jax.tree.map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]),
                *[node[k] for k in tblocks])
            out["blocks"] = stacked
        return out

    return rec(tree)


def merge_ported(params_init: Dict[str, Any], ported: Dict[str, Any]):
    """Overlay ported leaves onto an initialized flax params tree (shapes must
    match; mismatches keep the init and are reported). Transformer layouts
    (unrolled block_i vs nn.scan 'blocks') are reconciled toward the init's
    layout first, so ported reference weights load into scan models too."""
    import jax.numpy as jnp
    from guassianhand_tpu.train.checkpoints import _adapt_transformer_layout

    ported = _adapt_transformer_layout(ported, params_init)
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
