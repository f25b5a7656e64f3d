"""Torch-checkpoint porting: name/layout mapping into flax params."""
import numpy as np
import jax
import jax.numpy as jnp

from guassianhand_tpu.compat.torch_port import (merge_ported,
                                                port_reference_checkpoint)


def _fake_linear(sd, prefix, din, dout, rng, bias=True):
    sd[f"{prefix}.weight"] = rng.normal(size=(dout, din)).astype(np.float32)
    if bias:
        sd[f"{prefix}.bias"] = rng.normal(size=(dout,)).astype(np.float32)


def _fake_ln(sd, prefix, d, rng):
    sd[f"{prefix}.weight"] = rng.normal(size=(d,)).astype(np.float32)
    sd[f"{prefix}.bias"] = rng.normal(size=(d,)).astype(np.float32)


def test_port_camera_embedder_and_identity_params():
    from tests.test_model import TINY, HW, RASTER  # tiny model config
    from guassianhand_tpu.data.synthetic import (SyntheticHandScene,
                                                 synthetic_batch)
    from guassianhand_tpu.models.one_shot import OneShotAvatarModel

    scene = SyntheticHandScene.build(n_vertices=64, subdivide=0, height=32,
                                     width=32)
    batch = synthetic_batch(scene, seed=0, raster=RASTER, with_target=False)
    model = OneShotAvatarModel(cfg=TINY)
    params = model.init(jax.random.PRNGKey(0), batch, 32, 32)

    rng = np.random.RandomState(0)
    d = TINY.camera_embed_dim
    sd = {}
    # reference MLP: Sequential [Linear(25->d), act, Linear(d->d)]
    _fake_linear(sd, "model.camera_embedder.layers.0", 25, d, rng)
    _fake_linear(sd, "model.camera_embedder.layers.2", d, d, rng)
    mh, mw = TINY.residual_map_hw
    sd["model.color_w"] = rng.normal(size=(48,)).astype(np.float32)
    sd["model.color_b"] = rng.normal(size=(48, mh, mw)).astype(np.float32)
    sd["model.map_bias"] = rng.normal(
        size=(TINY.scene_code_channels, 2 * TINY.plane_size,
              4 * TINY.plane_size)).astype(np.float32)
    sd["model.unknown_module.weight"] = np.zeros((2, 2), np.float32)

    ported, unmapped = port_reference_checkpoint(sd, backbone_layers=1)
    assert "model.unknown_module.weight" not in ported
    assert any("unknown_module" in u for u in unmapped)

    merged, skipped = merge_ported(params, ported)
    got = np.asarray(merged["params"]["camera_embedder"]["Dense_0"]["kernel"])
    np.testing.assert_allclose(
        got, sd["model.camera_embedder.layers.0.weight"].T)
    np.testing.assert_allclose(np.asarray(merged["params"]["color_w"]),
                               sd["model.color_w"])
    # other leaves untouched
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["pose_embedder"]["Dense_0"]["kernel"]),
        np.asarray(params["params"]["pose_embedder"]["Dense_0"]["kernel"]))

    # merged params still drive the model
    out = model.apply(merged, batch, 32, 32)
    assert np.isfinite(np.asarray(out["comp_rgb"])).all()


def test_port_renderer_heads_and_selfattn():
    rng = np.random.RandomState(1)
    sd = {}
    f = 131
    # gs heads (in_channels 128)
    for i, out in enumerate([3, 3, 4, 1, 3]):
        _fake_linear(sd, f"model.renderer.gs_net.out_layers.{i}", 128, out, rng)
    # gs_valid: ff (MLP_block in=134 hid=33) + fc
    _fake_ln(sd, "model.renderer.gs_valid.ff.layer_norm", f + 3, rng)
    _fake_linear(sd, "model.renderer.gs_valid.ff.fc1", f + 3, (f + 3) // 4, rng)
    _fake_linear(sd, "model.renderer.gs_valid.ff.fc2",
                 (f + 3) // 4, (f + 3) // 4, rng)
    _fake_linear(sd, "model.renderer.gs_valid.fc", (f + 3) // 4, 1, rng)
    # self-attn
    _fake_ln(sd, "model.renderer.self_attn_layer.layer_norm", f, rng)
    for nm in ("w_qs", "w_ks", "w_vs"):
        _fake_linear(sd, f"model.renderer.self_attn_layer.{nm}", f, 128, rng)
    _fake_linear(sd, "model.renderer.self_attn_layer.fc", 128, f, rng)
    _fake_ln(sd, "model.renderer.self_attn_layer.ff.layer_norm", f, rng)
    _fake_linear(sd, "model.renderer.self_attn_layer.ff.fc1", f, f, rng)
    _fake_linear(sd, "model.renderer.self_attn_layer.ff.fc2", f, f, rng)

    ported, _ = port_reference_checkpoint(sd)
    assert "gs_net" in ported["renderer"]
    assert set(ported["renderer"]["gs_net"]) == {
        "xyz", "scaling", "rotation", "opacity", "shs"}
    assert "self_attn_layer" in ported
    np.testing.assert_allclose(
        ported["self_attn_layer"]["Dense_0"]["kernel"],
        sd["model.renderer.self_attn_layer.w_qs.weight"].T)


def test_port_full_reference_spec():
    """Full-fidelity port proof (VERDICT r1 item 3): every key the reference's
    TGS state_dict carries (exact names/shapes dumped from the instantiated
    reference by scripts/dump_reference_spec.py) must be consumed by the
    converter — zero unmapped keys — and every ported leaf must land on a
    same-shaped leaf of our initialized module trees."""
    import json
    import os

    spec_path = os.path.join(os.path.dirname(__file__), "fixtures",
                             "reference_tgs_spec.json")
    spec = json.load(open(spec_path))
    assert len(spec) > 900  # full tree, not a subset
    rng = np.random.RandomState(0)
    sd = {k: rng.normal(size=v).astype(np.float32) if v else
          np.float32(rng.normal()) for k, v in spec.items()}

    ported, unmapped = port_reference_checkpoint(sd)
    assert unmapped == [], f"unmapped reference keys: {unmapped[:20]}"

    # Shape-check the ported tree against the real module layouts via
    # eval_shape (no full-size allocation).
    from guassianhand_tpu.models.one_shot import OneShotAvatarModel, OneShotConfig
    from guassianhand_tpu.models.point_generator import SimplePointGenerator
    from guassianhand_tpu.nn.tokenizers import TriplaneUpsampler
    from guassianhand_tpu.render.renderer import RendererConfig
    from guassianhand_tpu.ops.rasterize import RasterizeConfig

    n = 256
    batch = {
        "points": jnp.zeros((1, n, 3)),
        "points_tar": jnp.zeros((1, n, 3)),
        "vert_uv": jnp.zeros((1, n, 2)),
        "inter_mask": jnp.zeros((1, n), bool),
        "mano_pose": jnp.zeros((1, 96)),
        "c2w": jnp.zeros((1, 4, 4)),
        "intrinsic_normed": jnp.zeros((1, 3, 3)),
        "w2c_render": jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4)),
        "K_render": jnp.zeros((1, 1, 3, 3)),
        "background": jnp.zeros((1, 3)),
    }
    cfg = OneShotConfig(renderer=RendererConfig(
        raster=RasterizeConfig(interpret=True)))
    model = OneShotAvatarModel(cfg=cfg)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), batch, 32, 32))["params"]

    pg = SimplePointGenerator()
    pg_shapes = jax.eval_shape(
        lambda: pg.init(jax.random.PRNGKey(0), jnp.zeros((1, 252, 252, 3)),
                        jnp.zeros((1, 25)), jnp.zeros((1, 2048, 3)),
                        method=SimplePointGenerator.generate))["params"]

    up = TriplaneUpsampler(out_channels=80)
    up_shapes = jax.eval_shape(
        lambda: up.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 3, 512, 32, 32))))["params"]

    trees = dict(shapes)
    trees["pointcloud_generator"] = pg_shapes
    trees["post_processor"] = up_shapes

    problems = []

    def check(dst, src, path=""):
        for k, v in src.items():
            if k not in dst:
                problems.append(f"{path}{k}: no such leaf in module tree")
                continue
            if isinstance(v, dict):
                check(dst[k], v, f"{path}{k}/")
            elif tuple(dst[k].shape) != tuple(np.shape(v)):
                problems.append(
                    f"{path}{k}: ported {np.shape(v)} vs module {dst[k].shape}")

    check(trees, ported)
    assert not problems, "\n".join(problems[:30])


def test_port_dinov2_backbone():
    """HF facebook/dinov2-base state_dict -> ImageTokenizer params: complete
    mapping (only the mask_token has no inference counterpart) and exact
    shape match against the initialized module."""
    from guassianhand_tpu.compat.torch_port import port_dinov2_backbone
    from guassianhand_tpu.nn.image_tokenizer import ImageTokenizer

    rng = np.random.RandomState(0)
    sd = {}
    sd["embeddings.cls_token"] = rng.normal(size=(1, 1, 768))
    sd["embeddings.mask_token"] = rng.normal(size=(1, 768))
    sd["embeddings.position_embeddings"] = rng.normal(size=(1, 257, 768))
    sd["embeddings.patch_embeddings.projection.weight"] = rng.normal(
        size=(768, 3, 14, 14))
    sd["embeddings.patch_embeddings.projection.bias"] = rng.normal(size=(768,))
    sd["layernorm.weight"] = rng.normal(size=(768,))
    sd["layernorm.bias"] = rng.normal(size=(768,))
    for i in range(12):
        p = f"encoder.layer.{i}"
        for nm, shp in [("attention.attention.query", (768, 768)),
                        ("attention.attention.key", (768, 768)),
                        ("attention.attention.value", (768, 768)),
                        ("attention.output.dense", (768, 768)),
                        ("mlp.fc1", (3072, 768)), ("mlp.fc2", (768, 3072))]:
            sd[f"{p}.{nm}.weight"] = rng.normal(size=shp)
            sd[f"{p}.{nm}.bias"] = rng.normal(size=(shp[0],))
        for nm in ("norm1", "norm2"):
            sd[f"{p}.{nm}.weight"] = rng.normal(size=(768,))
            sd[f"{p}.{nm}.bias"] = rng.normal(size=(768,))
        sd[f"{p}.layer_scale1.lambda1"] = rng.normal(size=(768,))
        sd[f"{p}.layer_scale2.lambda1"] = rng.normal(size=(768,))

    params, unmapped = port_dinov2_backbone(sd)
    assert unmapped == []

    tok = ImageTokenizer()
    shapes = jax.eval_shape(
        lambda: tok.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)),
                        jnp.zeros((1, 768))))["params"]

    def check(dst, src, path=""):
        for k, v in src.items():
            assert k in dst, f"{path}{k} missing in module tree"
            if isinstance(v, dict):
                check(dst[k], v, f"{path}{k}/")
            else:
                assert tuple(dst[k].shape) == tuple(np.shape(v)), \
                    (path + k, dst[k].shape, np.shape(v))

    check(shapes, params)


def test_image_feature_distance_transform_matches_cv2():
    """ImageFeature port proof (VERDICT r2 item 6): the distance-transform
    channel must match the reference's exact computation
    (tgs/utils/ops.py:444-452: cv2.distanceTransform(1 - mask, DIST_L2,
    DIST_MASK_3) / (W/2), clip [0,1]), and the full 773-channel per-pixel
    assembly (image_feature.py:10-52) must match a torch replica."""
    import cv2
    import torch
    import torch.nn.functional as F
    from guassianhand_tpu.models.point_generator import ImageFeature
    from guassianhand_tpu.ops.distance_transform import mask_distance_channel

    rng = np.random.RandomState(0)
    h = w = 56
    # blobby mask
    yy, xx = np.mgrid[:h, :w]
    mask = np.zeros((h, w), np.uint8)
    for _ in range(3):
        cy, cx, r = rng.randint(8, h - 8), rng.randint(8, w - 8), rng.randint(3, 9)
        mask |= ((yy - cy) ** 2 + (xx - cx) ** 2 < r * r).astype(np.uint8)

    want = cv2.distanceTransform(1 - mask, distanceType=cv2.DIST_L2,
                                 maskSize=cv2.DIST_MASK_3) / (w / 2)
    want = np.clip(want, 0, 1)
    got = np.asarray(mask_distance_channel(jnp.asarray(mask)[None]))[0]
    np.testing.assert_allclose(got, want, atol=2e-3)

    # full 773-ch assembly vs a torch replica of image_feature.py
    side, c_tok = 4, 768
    rgb = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
    tokens = rng.normal(size=(1, side * side + 1, c_tok)).astype(np.float32)

    feat = ImageFeature().apply(
        {}, jnp.asarray(rgb), jnp.asarray(tokens),
        jnp.asarray(mask.astype(np.float32))[None])
    assert feat.shape == (1, h, w, 773)

    # the reference drops the leading CLS token (image_feature.py:
    # feature[:, 1:]) before the spatial reshape
    tok_t = torch.from_numpy(
        tokens[:, 1 : 1 + side * side].reshape(1, side, side, c_tok)
    ).permute(0, 3, 1, 2)
    tok_up = F.interpolate(tok_t, size=(h, w), mode="bilinear",
                           align_corners=False)
    want_feat = np.concatenate(
        [rgb.transpose(0, 3, 1, 2), tok_up.numpy(),
         mask.astype(np.float32)[None, None], want[None, None]], axis=1)
    np.testing.assert_allclose(
        np.asarray(feat).transpose(0, 3, 1, 2), want_feat, atol=2e-3)


def test_transformer1d_port_matches_torch_forward(tmp_path):
    """Numeric proof of the Transformer1D port: a torch replica of the
    reference stack (transformers.py:673-908 structure + diffusers
    BasicTransformerBlock naming: norm/proj_in/transformer_blocks.N.{norm1,
    attn1.to_{q,k,v,out.0},norm2,attn2,norm3,ff.net.{0.proj,2}}/proj_out),
    random-initialized, ported through _transformer1d, must produce the same
    channels-first output as the flax module — validates every kernel
    transpose, the GEGLU chunk order, the exact-erf gelu, head reshapes, and
    GroupNorm semantics."""
    import math
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F
    import jax
    import jax.numpy as jnp
    from guassianhand_tpu.compat.torch_port import _transformer1d
    from guassianhand_tpu.nn.transformer import Transformer1D

    dim_c, inner, heads, hd, L = 40, 32, 2, 16, 2

    class TAttn(tnn.Module):
        def __init__(self):
            super().__init__()
            self.to_q = tnn.Linear(inner, inner, bias=False)
            self.to_k = tnn.Linear(inner, inner, bias=False)
            self.to_v = tnn.Linear(inner, inner, bias=False)
            self.to_out = tnn.ModuleList([tnn.Linear(inner, inner)])

        def forward(self, x):
            b, n, _ = x.shape
            def split(t):
                return t.view(b, n, heads, hd).permute(0, 2, 1, 3)
            q, k, v = split(self.to_q(x)), split(self.to_k(x)), split(self.to_v(x))
            a = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(hd), dim=-1)
            o = (a @ v).permute(0, 2, 1, 3).reshape(b, n, inner)
            return self.to_out[0](o)

    class TGEGLU(tnn.Module):
        def __init__(self):
            super().__init__()
            self.proj = tnn.Linear(inner, inner * 8)

        def forward(self, x):
            h, gate = self.proj(x).chunk(2, dim=-1)
            return h * F.gelu(gate)

    class TFF(tnn.Module):
        def __init__(self):
            super().__init__()
            self.net = tnn.ModuleList(
                [TGEGLU(), tnn.Identity(), tnn.Linear(inner * 4, inner)])

        def forward(self, x):
            for m in self.net:
                x = m(x)
            return x

    class TBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = tnn.LayerNorm(inner)
            self.attn1 = TAttn()
            self.norm2 = tnn.LayerNorm(inner)
            self.attn2 = TAttn()
            self.norm3 = tnn.LayerNorm(inner)
            self.ff = TFF()

        def forward(self, x):
            x = x + self.attn1(self.norm1(x))
            x = x + self.attn2(self.norm2(x))
            x = x + self.ff(self.norm3(x))
            return x

    class TT1D(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm = tnn.GroupNorm(8, dim_c, eps=1e-6)
            self.proj_in = tnn.Linear(dim_c, inner)
            self.transformer_blocks = tnn.ModuleList(
                [TBlock() for _ in range(L)])
            self.proj_out = tnn.Linear(inner, dim_c)

        def forward(self, x):  # (B, C, N)
            res = x
            h = self.norm(x).permute(0, 2, 1)
            h = self.proj_in(h)
            for blk in self.transformer_blocks:
                h = blk(h)
            h = self.proj_out(h)
            return h.permute(0, 2, 1) + res

    torch.manual_seed(0)

    class Holder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = TT1D()

    holder = Holder().eval()
    sd = {k: v for k, v in holder.state_dict().items()}
    flax_tree = _transformer1d(sd, "backbone", num_layers=L)

    rng = np.random.RandomState(0)
    tokens = rng.normal(size=(2, dim_c, 24)).astype(np.float32)
    with torch.no_grad():
        want = holder.backbone(torch.from_numpy(tokens)).numpy()

    model = Transformer1D(num_layers=L, heads=heads, head_dim=hd,
                          norm_groups=8)
    got = model.apply({"params": flax_tree}, jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)


def test_dinov2_port_matches_hf_forward():
    """Numeric proof of the DINOv2 mapping: a transformers-library
    Dinov2Model (the SAME implementation HF loads facebook/dinov2-base into),
    random-initialized, ported via port_dinov2_backbone, must produce the
    same tokens as nn.image_tokenizer.ImageTokenizer — validates the patch
    conv transpose, cls/pos handling, q/k/v/dense transposes, LayerScale,
    and the exact-erf MLP gelu."""
    import torch
    from transformers import Dinov2Config, Dinov2Model
    import jax.numpy as jnp
    from guassianhand_tpu.compat.torch_port import port_dinov2_backbone
    from guassianhand_tpu.nn.image_tokenizer import (IMAGE_MEAN, IMAGE_STD,
                                                     ImageTokenizer)

    width, layers, heads = 64, 2, 2
    cfg = Dinov2Config(hidden_size=width, num_hidden_layers=layers,
                       num_attention_heads=heads, intermediate_size=width * 4,
                       image_size=224, patch_size=14)
    torch.manual_seed(0)
    hf = Dinov2Model(cfg).eval()

    params, unmapped = port_dinov2_backbone(hf.state_dict(),
                                            num_layers=layers)
    assert unmapped == [], unmapped

    rng = np.random.RandomState(0)
    img = rng.uniform(0, 1, (1, 224, 224, 3)).astype(np.float32)
    mean = np.asarray(IMAGE_MEAN, np.float32).reshape(1, 3, 1, 1)
    std = np.asarray(IMAGE_STD, np.float32).reshape(1, 3, 1, 1)
    pixel_values = torch.from_numpy(
        (img.transpose(0, 3, 1, 2) - mean) / std)
    with torch.no_grad():
        want = hf(pixel_values).last_hidden_state.numpy()

    model = ImageTokenizer(width=width, layers=layers, heads=heads)
    got = model.apply({"params": params}, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5, rtol=1e-4)


def test_self_attn_port_matches_torch_forward():
    """Numeric proof of the interaction SelfAttn port (self_attn.py:36-85):
    torch replica with reference naming (w_qs/w_ks/w_vs/fc/layer_norm/ff.*),
    ported via _self_attn, must match our blockwise-attention SelfAttn in
    eval mode — validates the q/k/v head reshapes, the exact blockwise
    online-softmax, and the MLP res block."""
    import math
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F
    import jax.numpy as jnp
    from guassianhand_tpu.compat.torch_port import _self_attn
    from guassianhand_tpu.nn.heads import SelfAttn

    f_dim, heads, n = 32, 4, 192

    class TSelfAttn(tnn.Module):
        def __init__(self):
            super().__init__()
            d = f_dim // heads
            self.d = d
            self.w_qs = tnn.Linear(f_dim, f_dim)
            self.w_ks = tnn.Linear(f_dim, f_dim)
            self.w_vs = tnn.Linear(f_dim, f_dim)
            self.layer_norm = tnn.LayerNorm(f_dim, eps=1e-6)
            self.fc = tnn.Linear(f_dim, f_dim)
            self.ff = tnn.Module()
            self.ff.layer_norm = tnn.LayerNorm(f_dim, eps=1e-6)
            self.ff.fc1 = tnn.Linear(f_dim, f_dim)
            self.ff.fc2 = tnn.Linear(f_dim, f_dim)

        def forward(self, x):
            bs, v, _ = x.shape
            h = self.layer_norm(x)
            def split(t):
                return t.view(bs, v, heads, self.d).transpose(1, 2)
            q, k, vv = split(self.w_qs(h)), split(self.w_ks(h)), split(self.w_vs(h))
            a = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(self.d), -1)
            o = (a @ vv).transpose(1, 2).reshape(bs, v, f_dim)
            x = x + self.fc(o)
            h = self.ff.layer_norm(x)
            return x + self.ff.fc2(F.relu(self.ff.fc1(h)))

    torch.manual_seed(0)

    class Holder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.renderer = tnn.Module()
            self.renderer.self_attn_layer = TSelfAttn()

    holder = Holder().eval()
    sd = dict(holder.state_dict())
    flax_tree = _self_attn(sd, "renderer.self_attn_layer")

    rng = np.random.RandomState(0)
    x = rng.normal(size=(2, n, f_dim)).astype(np.float32)
    with torch.no_grad():
        want = holder.renderer.self_attn_layer(torch.from_numpy(x)).numpy()

    model = SelfAttn(n_heads=heads)
    got = model.apply({"params": flax_tree}, jnp.asarray(x),
                      deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)


def test_pointnet_port_matches_torch_forward():
    """Numeric proof of the LocalPoolPointnet port (pointnet_texture.py:11-114):
    torch replica (ResnetBlockFC fc_0/fc_1 zero-init-fc_1 + shortcut, grid
    index math, scatter-max pool + gather, final scatter-mean plane) ported
    via _pointnet must match our segment_sum/segment_max implementation."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F
    import jax.numpy as jnp
    from guassianhand_tpu.compat.torch_port import _pointnet
    from guassianhand_tpu.nn.pointnet import LocalPoolPointnet

    hidden, c_dim, reso, nblk, t = 16, 24, 8, 3, 500

    class TRes(tnn.Module):
        def __init__(self, size_in, size_out):
            super().__init__()
            size_h = min(size_in, size_out)
            self.fc_0 = tnn.Linear(size_in, size_h)
            self.fc_1 = tnn.Linear(size_h, size_out)
            if size_in != size_out:
                self.shortcut = tnn.Linear(size_in, size_out, bias=False)
            else:
                self.shortcut = None

        def forward(self, x):
            net = self.fc_0(F.relu(x))
            dx = self.fc_1(F.relu(net))
            xs = self.shortcut(x) if self.shortcut is not None else x
            return xs + dx

    def scatter_max(src, idx, r2):
        # (B, C, T) -> (B, C, R2); empty cells -> 0 (torch_scatter semantics)
        b, c, _ = src.shape
        out = torch.full((b, c, r2), float("-inf"))
        out = out.scatter_reduce(2, idx.expand(b, c, -1), src, "amax",
                                 include_self=False)
        return torch.where(torch.isinf(out), torch.zeros(()), out)

    def scatter_mean(src, idx, r2):
        b, c, _ = src.shape
        s = torch.zeros((b, c, r2)).scatter_reduce(
            2, idx.expand(b, c, -1), src, "sum", include_self=True)
        cnt = torch.zeros((b, 1, r2)).scatter_reduce(
            2, idx[:, :1], torch.ones_like(src[:, :1]), "sum",
            include_self=True)
        return s / cnt.clamp(min=1.0)

    class TPointnet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.fc_pos = tnn.Linear(3, 2 * hidden)
            self.blocks = tnn.ModuleList(
                [TRes(2 * hidden, hidden) for _ in range(nblk)])
            self.fc_c = tnn.Linear(hidden, c_dim)
            for blk in self.blocks:
                tnn.init.zeros_(blk.fc_1.weight)

        def forward(self, p):
            b = p.shape[0]
            pos = torch.clamp(p[..., :2], -1 + 1e-6, 1 - 1e-6)
            pos01 = (pos + 1.0) / 2.0
            ij = (pos01 * reso).long()
            idx = (ij[..., 0] + reso * ij[..., 1])[:, None, :]  # (B, 1, T)
            net = self.fc_pos(p)
            net = self.blocks[0](net)
            for blk in self.blocks[1:]:
                fea = scatter_max(net.permute(0, 2, 1), idx, reso ** 2)
                pooled = fea.gather(2, idx.expand(-1, hidden, -1))
                net = torch.cat([net, pooled.permute(0, 2, 1)], dim=2)
                net = blk(net)
            c = self.fc_c(net)
            return scatter_mean(c.permute(0, 2, 1), idx, reso ** 2).reshape(
                b, c_dim, reso, reso)

    torch.manual_seed(0)

    class Holder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.point_encoder_texture = TPointnet()

    holder = Holder().eval()
    flax_tree = _pointnet(dict(holder.state_dict()), "point_encoder_texture",
                          n_blocks=nblk)

    rng = np.random.RandomState(0)
    p = rng.uniform(-1, 1, (2, t, 3)).astype(np.float32)
    with torch.no_grad():
        want = holder.point_encoder_texture(torch.from_numpy(p)).numpy()

    model = LocalPoolPointnet(c_dim=c_dim, hidden_dim=hidden, plane_size=reso,
                              n_blocks=nblk)
    got = model.apply({"params": flax_tree}, jnp.asarray(p))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)


def test_skip_transformer_port_matches_torch_forward():
    """Numeric proof of the snowflake SkipTransformer port
    (skip_transformer.py:9-69): torch replica (kernel-1 convs, eval-mode
    BatchNorm, kNN vector attention with relative-pos MLP) ported via
    _skip_transformer must match our gather-based implementation."""
    import torch
    import torch.nn as tnn
    import jax.numpy as jnp
    from guassianhand_tpu.compat.torch_port import _skip_transformer
    from guassianhand_tpu.nn.snowflake import SkipTransformer

    C, D, K, N, PH = 24, 16, 8, 160, 12

    class TMLPRes(tnn.Module):
        def __init__(self, in_dim, hidden, out):
            super().__init__()
            self.conv_1 = tnn.Conv1d(in_dim, hidden, 1)
            self.conv_2 = tnn.Conv1d(hidden, out, 1)
            self.conv_shortcut = tnn.Conv1d(in_dim, out, 1)

        def forward(self, x):
            return (self.conv_2(torch.relu(self.conv_1(x)))
                    + self.conv_shortcut(x))

    class TSkip(tnn.Module):
        def __init__(self):
            super().__init__()
            self.mlp_v = TMLPRes(C * 2, C, C)
            self.conv_key = tnn.Conv1d(C, D, 1)
            self.conv_query = tnn.Conv1d(C, D, 1)
            self.conv_value = tnn.Conv1d(C, D, 1)
            self.pos_mlp = tnn.Sequential(
                tnn.Conv2d(3, PH, 1), tnn.BatchNorm2d(PH), tnn.ReLU(),
                tnn.Conv2d(PH, D, 1))
            self.attn_mlp = tnn.Sequential(
                tnn.Conv2d(D, D * 4, 1), tnn.BatchNorm2d(D * 4), tnn.ReLU(),
                tnn.Conv2d(D * 4, D, 1))
            self.conv_end = tnn.Conv1d(D, C, 1)

        def forward(self, pos, key, query):
            # pos (1, 3, N); key/query (1, C, N)
            value = self.mlp_v(torch.cat([key, query], 1))
            identity = value
            k = self.conv_key(key)
            q = self.conv_query(query)
            v = self.conv_value(value)
            b, d, n = v.shape
            dist = torch.cdist(pos.permute(0, 2, 1), pos.permute(0, 2, 1))
            idx = dist.topk(K, dim=-1, largest=False).indices  # (1, N, K)
            def group(t):  # (1, c, N) -> (1, c, N, K)
                c = t.shape[1]
                return t.gather(
                    2, idx.reshape(1, 1, -1).expand(-1, c, -1)
                ).reshape(1, c, n, K)
            kg = group(k)
            qk_rel = q.reshape(b, -1, n, 1) - kg
            pos_rel = pos.reshape(b, -1, n, 1) - group(pos)
            pos_emb = self.pos_mlp(pos_rel)
            attn = torch.softmax(self.attn_mlp(qk_rel + pos_emb), -1)
            agg = torch.einsum("bcij,bcij->bci", attn,
                               v.reshape(b, -1, n, 1) + pos_emb)
            return self.conv_end(agg) + identity

    torch.manual_seed(0)

    class Holder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.skip_transformer = TSkip()

    holder = Holder()
    # randomize the BN running stats so eval-mode normalization is exercised
    for m in holder.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    holder.eval()
    flax_tree = _skip_transformer(dict(holder.state_dict()),
                                  "skip_transformer")

    rng = np.random.RandomState(0)
    pos = rng.uniform(-1, 1, (N, 3)).astype(np.float32)
    key = rng.normal(size=(N, C)).astype(np.float32)
    query = rng.normal(size=(N, C)).astype(np.float32)
    with torch.no_grad():
        want = holder.skip_transformer(
            torch.from_numpy(pos.T[None]), torch.from_numpy(key.T[None]),
            torch.from_numpy(query.T[None])).numpy()[0].T

    model = SkipTransformer(in_channel=C, dim=D, n_knn=K, pos_hidden=PH)
    got = model.apply({"params": flax_tree}, jnp.asarray(pos),
                      jnp.asarray(key), jnp.asarray(query))
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5, rtol=1e-4)


def test_triplane_upsampler_port_matches_torch_forward():
    """Numeric proof of the triplane upsampler port (networks_texture.py:
    30-54): torch ConvTranspose2d(k=2, s=2) ported via _conv_transpose must
    match flax nn.ConvTranspose — catches kernel orientation/flip mismatches
    between the two transposed-conv conventions."""
    import torch
    import torch.nn as tnn
    import jax.numpy as jnp
    from guassianhand_tpu.compat.torch_port import _conv_transpose
    from guassianhand_tpu.nn.tokenizers import TriplaneUpsampler

    cin, cout, s = 8, 6, 5
    torch.manual_seed(0)

    class Holder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.upsample = tnn.ConvTranspose2d(cin, cout, 2, stride=2)

    holder = Holder().eval()
    flax_tree = {"ConvTranspose_0": _conv_transpose(
        dict(holder.state_dict()), "upsample")}

    rng = np.random.RandomState(0)
    x = rng.normal(size=(2, 2, cin, s, s)).astype(np.float32)  # (B, Np, C, S, S)
    with torch.no_grad():
        want = holder.upsample(
            torch.from_numpy(x.reshape(4, cin, s, s))).numpy().reshape(
            2, 2, cout, 2 * s, 2 * s)

    model = TriplaneUpsampler(out_channels=cout)
    got = model.apply({"params": flax_tree}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_spd_pp_port_matches_torch_forward():
    """End-to-end numeric proof of the SPD_pp upsampling stage port
    (SPD_pp.py:6-70): torch replica (MLP_CONV stacks, SkipTransformer,
    ConvTranspose1d point-split, nearest upsample, bounded delta) ported via
    _spd_pp must match our SPDpp — validates the point-split kernel layout
    and child interleaving order on top of everything SkipTransformer uses."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F
    import jax.numpy as jnp
    from guassianhand_tpu.compat.torch_port import _spd_pp
    from guassianhand_tpu.nn.snowflake import SPDpp

    dim_feat, up, n = 16, 2, 80

    class TMLPRes(tnn.Module):
        def __init__(self, in_dim, hidden, out):
            super().__init__()
            self.conv_1 = tnn.Conv1d(in_dim, hidden, 1)
            self.conv_2 = tnn.Conv1d(hidden, out, 1)
            self.conv_shortcut = tnn.Conv1d(in_dim, out, 1)

        def forward(self, x):
            return (self.conv_2(torch.relu(self.conv_1(x)))
                    + self.conv_shortcut(x))

    class TMLPConv(tnn.Module):
        def __init__(self, cin, dims):
            super().__init__()
            seq = []
            for i, d in enumerate(dims):
                if i:
                    seq.append(tnn.ReLU())
                seq.append(tnn.Conv1d(cin, d, 1))
                cin = d
            # reference MLP_CONV indices: convs at mlp.0, mlp.2, ...
            self.mlp = tnn.Sequential(*seq)

        def forward(self, x):
            return self.mlp(x)

    class TSkip(tnn.Module):
        def __init__(self, C=128, D=64, K=16, PH=64):
            super().__init__()
            self.K = K
            self.mlp_v = TMLPRes(C * 2, C, C)
            self.conv_key = tnn.Conv1d(C, D, 1)
            self.conv_query = tnn.Conv1d(C, D, 1)
            self.conv_value = tnn.Conv1d(C, D, 1)
            self.pos_mlp = tnn.Sequential(
                tnn.Conv2d(3, PH, 1), tnn.BatchNorm2d(PH), tnn.ReLU(),
                tnn.Conv2d(PH, D, 1))
            self.attn_mlp = tnn.Sequential(
                tnn.Conv2d(D, D * 4, 1), tnn.BatchNorm2d(D * 4), tnn.ReLU(),
                tnn.Conv2d(D * 4, D, 1))
            self.conv_end = tnn.Conv1d(D, C, 1)

        def forward(self, pos, key, query):
            value = self.mlp_v(torch.cat([key, query], 1))
            identity = value
            k = self.conv_key(key)
            q = self.conv_query(query)
            v = self.conv_value(value)
            b, d, nn_ = v.shape
            dist = torch.cdist(pos.permute(0, 2, 1), pos.permute(0, 2, 1))
            idx = dist.topk(self.K, dim=-1, largest=False).indices

            def group(t):
                c = t.shape[1]
                return t.gather(
                    2, idx.reshape(1, 1, -1).expand(-1, c, -1)
                ).reshape(1, c, nn_, self.K)

            qk_rel = q.reshape(b, -1, nn_, 1) - group(k)
            pos_rel = pos.reshape(b, -1, nn_, 1) - group(pos)
            pos_emb = self.pos_mlp(pos_rel)
            attn = torch.softmax(self.attn_mlp(qk_rel + pos_emb), -1)
            agg = torch.einsum("bcij,bcij->bci", attn,
                               v.reshape(b, -1, nn_, 1) + pos_emb)
            return self.conv_end(agg) + identity

    class TSPDpp(tnn.Module):
        def __init__(self):
            super().__init__()
            self.mlp_1 = TMLPConv(3, [64, 128])
            self.mlp_2 = TMLPConv(128 * 2 + dim_feat, [256, 128])
            self.skip_transformer = TSkip()
            self.mlp_ps = TMLPConv(128, [64, 32])
            self.ps = tnn.ConvTranspose1d(32, 128, up, up, bias=False)
            self.mlp_delta_feature = TMLPRes(256, 128, 128)
            self.mlp_delta = TMLPConv(128, [64, 3])

        def forward(self, pcd, feat_cond):
            f1 = self.mlp_1(pcd)
            f1 = torch.cat(
                [f1, f1.max(2, keepdim=True).values.repeat(1, 1, f1.shape[2]),
                 feat_cond], 1)
            q = self.mlp_2(f1)
            h = self.skip_transformer(pcd, q, q)
            fc = self.ps(self.mlp_ps(h))
            h_up = F.interpolate(h, scale_factor=up, mode="nearest")
            k_curr = self.mlp_delta_feature(torch.cat([fc, h_up], 1))
            delta = torch.tanh(self.mlp_delta(torch.relu(k_curr)))
            child = F.interpolate(pcd, scale_factor=up, mode="nearest") + delta
            return child, k_curr

    torch.manual_seed(0)

    class Holder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.upper = TSPDpp()

    holder = Holder()
    for m in holder.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    holder.eval()
    flax_tree = _spd_pp(dict(holder.state_dict()), "upper")

    rng = np.random.RandomState(0)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    cond = rng.normal(size=(n, dim_feat)).astype(np.float32)
    with torch.no_grad():
        child_t, k_t = holder.upper(torch.from_numpy(pts.T[None]),
                                    torch.from_numpy(cond.T[None]))

    model = SPDpp(dim_feat=dim_feat, up_factor=up)
    (child_j, k_j) = model.apply({"params": flax_tree}, jnp.asarray(pts),
                                 jnp.asarray(cond))
    np.testing.assert_allclose(np.asarray(child_j), child_t.numpy()[0].T,
                               atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(k_j), k_t.numpy()[0].T,
                               atol=5e-5, rtol=1e-4)


def test_gs_layer_and_mlp_port_match_torch_forward():
    """Numeric proof for the GSLayer decode heads (renderer_one_shot.py:
    156-214: per-attribute linears + activation chain) and the embedder MLP
    (networks_texture.py:57-106: Linear/SiLU Sequential) ports."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F
    import jax.numpy as jnp
    from guassianhand_tpu.compat.torch_port import _gs_layer, _mlp
    from guassianhand_tpu.nn.heads import GSLayer
    from guassianhand_tpu.nn.mlp import MLP

    cin, n = 20, 50
    torch.manual_seed(0)

    # ---- GSLayer (use_rgb mode: shs -> 3 sigmoid channels)
    chans = [("xyz", 3), ("scaling", 3), ("rotation", 4), ("opacity", 1),
             ("shs", 3)]

    class TGS(tnn.Module):
        def __init__(self):
            super().__init__()
            self.out_layers = tnn.ModuleList(
                [tnn.Linear(cin, c) for _, c in chans])

        def forward(self, x, pts):
            ret = {}
            for (k, _), layer in zip(chans, self.out_layers):
                v = layer(x)
                if k == "rotation":
                    v = F.normalize(v)
                elif k == "scaling":
                    v = torch.exp(v)
                elif k == "opacity":
                    v = torch.sigmoid(v)
                elif k == "shs":
                    v = torch.sigmoid(v).reshape(v.shape[0], 1, 3)
                elif k == "xyz":
                    v = (torch.sigmoid(v) - 0.5) * (1.2 / 32) + pts
                ret[k] = v
            return ret

    class GHolder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.gs_net = TGS()

    gh = GHolder().eval()
    gs_tree = _gs_layer(dict(gh.state_dict()), "gs_net")

    rng = np.random.RandomState(0)
    x = rng.normal(size=(n, cin)).astype(np.float32)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    with torch.no_grad():
        want = gh.gs_net(torch.from_numpy(x), torch.from_numpy(pts))

    got = GSLayer(use_rgb=True).apply({"params": gs_tree}, jnp.asarray(x),
                                      jnp.asarray(pts))
    for k, ours in [("xyz", got.xyz), ("scaling", got.scaling),
                    ("rotation", got.rotation), ("opacity", got.opacity),
                    ("shs", got.shs)]:
        np.testing.assert_allclose(np.asarray(ours), want[k].numpy(),
                                   atol=2e-5, rtol=1e-4, err_msg=k)

    # ---- embedder MLP (1 hidden layer, silu)
    class TMLP(tnn.Module):
        def __init__(self):
            super().__init__()
            self.layers = tnn.Sequential(
                tnn.Linear(cin, 16), tnn.SiLU(), tnn.Linear(16, 8))

        def forward(self, x):
            return self.layers(x)

    class MHolder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.camera_embedder = TMLP()

    mh = MHolder().eval()
    mlp_tree = _mlp(dict(mh.state_dict()), "camera_embedder", 1)
    with torch.no_grad():
        want_m = mh.camera_embedder(torch.from_numpy(x)).numpy()
    got_m = MLP(dim_out=8, n_neurons=16, n_hidden_layers=1,
                activation="silu").apply({"params": mlp_tree},
                                         jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_m), want_m, atol=2e-5,
                               rtol=1e-4)
