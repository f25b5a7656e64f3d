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
