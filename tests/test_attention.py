"""Blockwise attention == dense attention (exactness of the online softmax)."""
import numpy as np
import jax
import jax.numpy as jnp

from guassianhand_tpu.ops.blockwise_attention import blockwise_attention


def _dense(q, k, v, mask):
    s = jnp.einsum("qhd,khd->hqk", q, k) / jnp.sqrt(q.shape[-1])
    s = jnp.where(mask[None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("hqk,khd->qhd", p, v)
    return out * mask[:, None, None]


def test_blockwise_matches_dense():
    rng = np.random.RandomState(0)
    n, h, d = 300, 4, 16
    q = jnp.asarray(rng.normal(size=(n, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(n, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(n, h, d)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=n) > 0.3)
    out_b = blockwise_attention(q, k, v, mask, q_chunk=64, k_chunk=128)
    out_d = _dense(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_d),
                               atol=2e-5, rtol=1e-4)


def test_blockwise_no_mask_and_grads():
    rng = np.random.RandomState(1)
    n, h, d = 200, 2, 8
    q = jnp.asarray(rng.normal(size=(n, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(n, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(n, h, d)), jnp.float32)
    out = blockwise_attention(q, k, v, q_chunk=64, k_chunk=64)
    ref = _dense(q, k, v, jnp.ones(n, bool))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)

    g = jax.grad(lambda a, b, c: blockwise_attention(
        a, b, c, q_chunk=64, k_chunk=64).sum())(q, k, v)
    assert np.isfinite(np.asarray(g)).all()

    # all-masked input stays finite (graceful degenerate softmax)
    out0 = blockwise_attention(q, k, v, jnp.zeros(n, bool), q_chunk=64,
                               k_chunk=64)
    assert np.isfinite(np.asarray(out0)).all()
    np.testing.assert_allclose(np.asarray(out0), 0.0, atol=1e-6)


def test_self_attn_dense_prob_dropout_path():
    """SelfAttn(dense=True) — the true attention-probability-dropout
    fallback (self_attn.py:70-71): eval-mode output equals the blockwise
    path exactly (same params), and train mode actually drops probs."""
    import jax
    from guassianhand_tpu.nn.heads import SelfAttn

    rng = np.random.RandomState(0)
    b, n, f = 2, 96, 32
    x = jnp.asarray(rng.normal(size=(b, n, f)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(b, n)) > 0.4)

    block = SelfAttn(n_heads=4, dropout=0.1)
    dense = SelfAttn(n_heads=4, dropout=0.1, dense=True)
    params = block.init(jax.random.PRNGKey(0), x, mask)

    out_b = block.apply(params, x, mask, deterministic=True)
    out_d = dense.apply(params, x, mask, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_b),
                               atol=2e-5, rtol=1e-4)
    # masked rows pass through unchanged
    np.testing.assert_array_equal(
        np.asarray(out_d)[~np.asarray(mask)], np.asarray(x)[~np.asarray(mask)])

    t1 = dense.apply(params, x, mask, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    t2 = dense.apply(params, x, mask, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(t1), np.asarray(t2))
    assert np.isfinite(np.asarray(t1)).all()


def test_blockwise_attention_grad_memory_is_sublinear():
    """The flash-style backward must REMATERIALIZE block probabilities, not
    save them: without jax.checkpoint on the k-scan body, autodiff residuals
    hold the full (N, N) attention matrix (h*n*n*4 B ~= 1 GB here; measured
    2 x 4 GB HBM buffers / v5e OOM at the real 15.4k-point fit workload).
    Guard via compiled memory analysis: temp must stay far below that."""
    import jax

    n, h, d = 8192, 4, 32
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.normal(size=(n, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(n, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(n, h, d)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(n,)) > 0.3)

    def loss(q, k, v):
        return blockwise_attention(q, k, v, mask,
                                   q_chunk=1024, k_chunk=1024).sum()

    compiled = jax.jit(jax.grad(loss, argnums=(0, 1, 2))).lower(
        q, k, v).compile()
    temp = compiled.memory_analysis().temp_size_in_bytes
    full_matrix = h * n * n * 4
    assert temp < 0.3 * full_matrix, (
        f"attention backward residuals grew to {temp/1e6:.0f} MB "
        f"(full-matrix scale {full_matrix/1e6:.0f} MB) — remat regressed")
    gs = compiled(q, k, v)
    for g in gs:
        assert np.isfinite(np.asarray(g)).all()


def test_flash_attention_path_matches_scan():
    """The Pallas TPU flash-attention path (flash=True; the bandwidth fix
    for interaction-scale attention) must match the XLA scan path on
    outputs AND gradients, including the mask contract (masked rows zero).
    Runs the kernel in TPU-interpret mode on CPU."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    n, h, d = 512, 4, 32
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.normal(size=(n, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(n, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(n, h, d)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(n,)) > 0.4)
    tgt = jnp.asarray(rng.normal(size=(n, h, d)), jnp.float32)

    def loss(q, k, v, flash):
        o = blockwise_attention(q, k, v, mask, q_chunk=256, k_chunk=256,
                                flash=flash)
        return jnp.abs(o - tgt).mean(), o

    (l0, o0), g0 = jax.value_and_grad(
        lambda *a: loss(*a, False), argnums=(0, 1, 2), has_aux=True)(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        (l1, o1), g1 = jax.value_and_grad(
            lambda *a: loss(*a, True), argnums=(0, 1, 2), has_aux=True)(
                q, k, v)

    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(o1)[~np.asarray(mask)], 0.0)
    for name, a, b in zip("qkv", g1, g0):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a, b, atol=1e-4 * scale,
                                   err_msg=f"flash grad {name}")


def test_self_attn_interaction_cap():
    """SelfAttn(cap=C): exact when the interacting count fits the budget;
    over budget, the first C interacting rows (original order) attend among
    themselves, later ones pass through unchanged, and the dropped count is
    sown as diagnostics/interaction_overflow."""
    import jax
    from guassianhand_tpu.nn.heads import SelfAttn

    rng = np.random.RandomState(3)
    b, n, f = 2, 512, 32
    x = jnp.asarray(rng.normal(size=(b, n, f)), jnp.float32)
    mask = np.zeros((b, n), bool)
    mask[0, :100] = True            # 100 interacting, fits cap=128
    mask[1, ::2] = True             # 256 interacting, exceeds cap=128
    mask = jnp.asarray(mask)

    base = SelfAttn(n_heads=4, dropout=0.0)
    capped = SelfAttn(n_heads=4, dropout=0.0, cap=128)
    params = base.init(jax.random.PRNGKey(0), x, mask)

    ref = base.apply(params, x, mask)
    out, aux = capped.apply(params, x, mask, mutable=["diagnostics"])
    out, ref = np.asarray(out), np.asarray(ref)

    # sample 0 fits the budget -> exact
    np.testing.assert_allclose(out[0], ref[0], atol=2e-5, rtol=1e-4)
    # sample 1: the first 128 interacting rows are the even indices < 256;
    # they attended among themselves only. Rows past the budget (even
    # indices >= 256) pass through unchanged.
    kept_rows = np.arange(0, 256, 2)
    dropped_rows = np.arange(256, n, 2)
    np.testing.assert_array_equal(out[1][dropped_rows],
                                  np.asarray(x)[1][dropped_rows])
    # kept rows must equal a reference computed over the kept subset only
    m2 = np.zeros((1, n), bool); m2[0, kept_rows] = True
    ref2 = np.asarray(base.apply(params, x[1:2], jnp.asarray(m2)))
    np.testing.assert_allclose(out[1][kept_rows], ref2[0][kept_rows],
                               atol=2e-5, rtol=1e-4)
    ov = np.asarray(jax.tree_util.tree_leaves(aux["diagnostics"])[0])
    assert int(ov.sum()) == 256 - 128
