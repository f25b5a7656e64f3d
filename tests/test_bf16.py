"""Mixed-precision (compute_dtype=bfloat16) quality gates.

The reference runs torch fp32 end to end; the TPU-first redesign runs the
FROZEN feature pipeline's matmuls in bf16 on the MXU (VERDICT r3 item 1).
These tests pin the contract:

- parameters are fp32 and structurally identical in both modes (ports and
  checkpoints are dtype-independent),
- the composed forward stays close to fp32 (bf16 has ~8 mantissa bits:
  elementwise rel err ~1e-2 through a 10-layer stack is expected; anything
  larger means an fp32 reduction got demoted),
- softmax statistics stay fp32 in the blockwise interaction attention
  (fp32 accumulation with bf16 operands).

The throughput + 50-step PSNR A/B on the real v5e workload is recorded in
ROADMAP.md (scripts/profile_stages.py --model, GH_PROF_BF16=1).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from guassianhand_tpu.models.one_shot import OneShotAvatarModel, OneShotConfig
from guassianhand_tpu.render.renderer import RendererConfig
from guassianhand_tpu.ops.rasterize import RasterizeConfig


def _tiny_cfg(**kw):
    return OneShotConfig(
        camera_embed_dim=32, pose_embed_dim=32, plane_size=8,
        token_channels=32, backbone_layers=2, backbone_heads=2,
        backbone_head_dim=16, residual_map_hw=(32, 64), interaction_k=8,
        renderer=RendererConfig(raster=RasterizeConfig(
            interpret=True, max_tiles_per_gaussian=4, max_blocks_per_tile=16)),
        **kw)


@pytest.fixture(scope="module")
def tiny_batch():
    from guassianhand_tpu.data.synthetic import (SyntheticHandScene,
                                                 synthetic_batch)

    scene = SyntheticHandScene.build(n_vertices=64, subdivide=0, height=32,
                                     width=32)
    return synthetic_batch(scene, seed=0, raster=RasterizeConfig(
        interpret=True, max_tiles_per_gaussian=4))


def test_bf16_param_tree_identical(tiny_batch):
    """param_dtype stays fp32: same tree, shapes and dtypes in both modes."""
    m32 = OneShotAvatarModel(cfg=_tiny_cfg())
    m16 = OneShotAvatarModel(cfg=_tiny_cfg(compute_dtype="bfloat16"))
    p32 = jax.eval_shape(lambda: m32.init(jax.random.PRNGKey(0), tiny_batch,
                                          32, 32))
    p16 = jax.eval_shape(lambda: m16.init(jax.random.PRNGKey(0), tiny_batch,
                                          32, 32))
    flat32 = jax.tree_util.tree_leaves_with_path(p32)
    flat16 = jax.tree_util.tree_leaves_with_path(p16)
    assert len(flat32) == len(flat16)
    for (k32, v32), (k16, v16) in zip(flat32, flat16):
        assert k32 == k16
        assert v32.shape == v16.shape, k32
        assert v32.dtype == v16.dtype == jnp.float32, k32


def test_bf16_forward_close_to_fp32(tiny_batch):
    """Same fp32 params, bf16 vs fp32 compute: the rendered image and the
    hidden features must agree to bf16 rounding through the full stack."""
    m32 = OneShotAvatarModel(cfg=_tiny_cfg())
    m16 = OneShotAvatarModel(cfg=_tiny_cfg(compute_dtype="bfloat16"))
    params = jax.jit(m32.init, static_argnums=(2, 3))(
        jax.random.PRNGKey(0), tiny_batch, 32, 32)

    f32 = m32.apply(params, tiny_batch, method="features")
    f16 = m16.apply(params, tiny_batch, method="features")
    assert f16["hidden"].dtype == jnp.float32  # cast back before the heads
    h32, h16 = np.asarray(f32["hidden"]), np.asarray(f16["hidden"])
    scale = np.abs(h32).max()
    assert np.abs(h16 - h32).max() <= 0.05 * scale, (
        np.abs(h16 - h32).max(), scale)

    out32 = m32.apply(params, tiny_batch, 32, 32)
    out16 = m16.apply(params, tiny_batch, 32, 32)
    rgb32 = np.asarray(out32["comp_rgb"])
    rgb16 = np.asarray(out16["comp_rgb"])
    assert rgb16.dtype == np.float32
    # images live in [0,1]; bf16 feature noise must stay visually negligible
    assert np.abs(rgb16 - rgb32).max() < 0.06
    assert np.abs(rgb16 - rgb32).mean() < 5e-3


def test_bf16_fit_gradients_flow_and_match_fp32_direction(tiny_batch):
    """Per-identity gradients under bf16 compute: finite, nonzero, and
    pointing the same way as fp32 (cosine similarity) — the fitting loop
    optimizes ONLY these leaves, so this is the quantity bf16 must not
    corrupt."""
    from guassianhand_tpu.train.fit import stop_frozen

    m32 = OneShotAvatarModel(cfg=_tiny_cfg())
    m16 = OneShotAvatarModel(cfg=_tiny_cfg(compute_dtype="bfloat16"))
    params = jax.jit(m32.init, static_argnums=(2, 3))(
        jax.random.PRNGKey(0), tiny_batch, 32, 32)
    tgt = jnp.zeros((1, 32, 32, 3))

    def loss(p, model):
        out = model.apply(stop_frozen(p), tiny_batch, 32, 32)
        return jnp.abs(out["comp_rgb"][:, 0] - tgt).mean()

    g32 = jax.grad(lambda p: loss(p, m32))(params)["params"]
    g16 = jax.grad(lambda p: loss(p, m16))(params)["params"]
    for key in ("identity_code_one_shot", "map_bias", "color_w"):
        a = np.asarray(g32[key]).ravel()
        b = np.asarray(g16[key]).ravel()
        assert np.isfinite(b).all(), key
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        assert nb > 0, key
        cos = float(a @ b / (na * nb))
        assert cos > 0.98, (key, cos)
        assert 0.8 < nb / na < 1.25, (key, nb / na)


def test_blockwise_attention_bf16_operands_fp32_stats():
    """bf16 q/k/v through the online-softmax scan: output must match the
    fp32 computation to bf16 operand rounding (fp32 carries), not bf16
    accumulation error."""
    from guassianhand_tpu.ops.blockwise_attention import blockwise_attention

    rng = np.random.RandomState(0)
    n, h, d = 512, 4, 32
    q = rng.normal(size=(n, h, d)).astype(np.float32)
    k = rng.normal(size=(n, h, d)).astype(np.float32)
    v = rng.normal(size=(n, h, d)).astype(np.float32)
    mask = rng.uniform(size=n) > 0.3

    o32 = blockwise_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                              jnp.asarray(mask), q_chunk=128, k_chunk=128)
    o16 = blockwise_attention(jnp.asarray(q, jnp.bfloat16),
                              jnp.asarray(k, jnp.bfloat16),
                              jnp.asarray(v, jnp.bfloat16),
                              jnp.asarray(mask), q_chunk=128, k_chunk=128)
    assert o16.dtype == jnp.float32  # fp32 accumulator all the way out
    err = np.abs(np.asarray(o16) - np.asarray(o32)).max()
    assert err < 0.03, err  # bf16 operand rounding only


def test_fit_step_surfaces_interaction_overflow():
    """interaction_cap through the FULL fit step (VERDICT r3 item 5): with a
    budget that holds the interacting set, err['interaction_overflow'] must
    be 0 (the exactness certificate the flagship config relies on); with an
    undersized budget it must count the dropped rows. Uses a subdivide=1
    scene (n=488) so the cap path's 128-row floor genuinely engages on both
    arms (the 128-point tiny scene would bypass it)."""
    from guassianhand_tpu.data.synthetic import (SyntheticHandScene,
                                                 synthetic_batch)
    from guassianhand_tpu.train.fit import (FitConfig, make_fit_step,
                                            make_optimizer)
    from guassianhand_tpu.train.losses import LossWeights

    scene = SyntheticHandScene.build(n_vertices=64, subdivide=1, height=32,
                                     width=32)
    batch = synthetic_batch(scene, seed=0, raster=RasterizeConfig(
        interpret=True, max_tiles_per_gaussian=4))
    n = int(batch["points"].shape[1])
    n_inter = int(np.asarray(batch["inter_mask"]).sum())
    assert n > 128 and 128 < n_inter < n, (n, n_inter)

    def one_step(cap):
        model = OneShotAvatarModel(cfg=_tiny_cfg(interaction_cap=cap))
        assert cap < n  # the cap path must actually engage
        params = jax.jit(model.init, static_argnums=(2, 3))(
            jax.random.PRNGKey(0), batch, 32, 32)
        fit_cfg = FitConfig(weights=LossWeights(vgg=0.0))
        optimizer = make_optimizer(params, fit_cfg)
        opt_state = optimizer.init(params)
        step = make_fit_step(lambda p, b: model.apply(p, b, 32, 32), None,
                             optimizer, fit_cfg)
        b = dict(batch)
        b["target_rgb"] = jnp.zeros((1, 32, 32, 3))
        b["target_mask"] = jnp.zeros((1, 32, 32))
        _, _, _, err = step(params, opt_state, b)
        return float(err["interaction_overflow"])

    # cap >= interacting count: exact, zero overflow
    assert one_step(min(n_inter + 8, n - 1)) == 0.0
    # undersized cap (floors to 128 gathered slots): counts dropped rows
    over = one_step(1)
    assert over == float(n_inter - 128), (over, n_inter)
