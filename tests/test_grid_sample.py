"""grid_sample forward/backward parity: torch reference + segsort VJP."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from guassianhand_tpu.ops.grid_sample import (_sample_core, _sample_segsort,
                                              grid_sample_2d)


def _torch_ref(feat, uv):
    import torch
    import torch.nn.functional as F
    f = torch.tensor(np.asarray(feat))[None]
    g = torch.tensor(np.asarray(uv))[None, :, None, :]
    out = F.grid_sample(f, g, mode="bilinear", align_corners=True,
                        padding_mode="border")
    return out[0, :, :, 0].T.numpy()


def test_grid_sample_matches_torch():
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.normal(size=(5, 9, 13)), jnp.float32)
    uv = jnp.asarray(rng.uniform(-0.98, 0.98, (200, 2)), jnp.float32)
    got = np.asarray(_sample_core(feat, uv))
    np.testing.assert_allclose(got, _torch_ref(feat, uv), atol=2e-6)


def test_grid_sample_segsort_vjp_matches_autodiff():
    """The sorted segment-sum feature gradient must equal the autodiff
    scatter-add to reassociation tolerance, and the uv gradient must be
    bit-identical (it is computed by autodiff either way)."""
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.normal(size=(7, 17, 23)), jnp.float32)
    # include duplicate taps: many points in one texel
    uv = jnp.asarray(
        np.concatenate([rng.uniform(-0.9, 0.9, (300, 2)),
                        np.tile(rng.uniform(-0.5, 0.5, (1, 2)), (50, 1))]),
        jnp.float32)
    cot = jnp.asarray(rng.normal(size=(350, 7)), jnp.float32)

    def loss_seg(f, u):
        return jnp.sum(_sample_segsort(f, u) * cot)

    def loss_ref(f, u):
        return jnp.sum(_sample_core(f, u) * cot)

    gs = jax.grad(loss_seg, argnums=(0, 1))(feat, uv)
    gr = jax.grad(loss_ref, argnums=(0, 1))(feat, uv)
    np.testing.assert_allclose(np.asarray(gs[0]), np.asarray(gr[0]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(gs[1]), np.asarray(gr[1]))
    # forward identical by construction
    np.testing.assert_array_equal(np.asarray(_sample_segsort(feat, uv)),
                                  np.asarray(_sample_core(feat, uv)))


def test_grid_sample_env_gate(monkeypatch):
    rng = np.random.RandomState(2)
    feat = jnp.asarray(rng.normal(size=(3, 8, 8)), jnp.float32)
    uv = jnp.asarray(rng.uniform(-0.9, 0.9, (40, 2)), jnp.float32)
    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("GH_GRIDSAMPLE_SEGSORT", flag)
        outs[flag] = np.asarray(
            jax.grad(lambda f: jnp.sum(grid_sample_2d(f, uv) ** 2))(feat))
    np.testing.assert_allclose(outs["0"], outs["1"], atol=1e-6)
