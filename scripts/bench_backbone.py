"""Why is the Transformer1D backward 3-4x its forward? (r4 finding:
backbone fwd 6.6 ms, fwd+bwd(dX) 26-33 ms at (B=1, C=512, T=2048), bf16.)

Arms, each an isolated CHAINED timing (scripts/timing.py — immune to relay
caching/eliding) of ONE 10-layer backbone, grad wrt tokens (the fit path's
frozen-dW shape):
  base     bf16, unrolled (the shipped config)
  remat    bf16, per-block gradient checkpointing
  scan     bf16, lax.scan over blocks
  fp32     precision control
  vmap2    TWO backbones batched via stacked params + vmap — the model runs
           backbone and backbone_shade SEQUENTIALLY on same-shaped tokens;
           if batching recovers MXU efficiency this motivates fusing them.
           (reported per-PAIR, i.e. compare against 2x the other arms)

Usage: python scripts/bench_backbone.py [--iters 10]
"""
import argparse
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from timing import chain_timed  # noqa: E402

SALT = np.random.RandomState()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from guassianhand_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    from guassianhand_tpu.nn.transformer import Transformer1D

    b, c, t = 1, 512, 2048
    print(f"[t] backend={jax.devices()[0].platform} tokens=({b},{c},{t})",
          flush=True)

    def arms():
        yield "base bf16", dict(dtype=jnp.bfloat16)
        yield "remat bf16", dict(dtype=jnp.bfloat16, remat=True)
        yield "scan bf16", dict(dtype=jnp.bfloat16, scan=True)
        yield "fp32", dict()
        # r5 arms against the backward's 134 MB fp32 (2048, 2048)
        # probability tensors (docs/TRACE_FIT_STEP.md tail cost #1):
        yield "bf16 sm_bf16", dict(dtype=jnp.bfloat16, softmax_fp32=False)
        yield "bf16 attn_remat", dict(dtype=jnp.bfloat16, attn_remat=True)
        yield "bf16 sm_bf16+remat", dict(dtype=jnp.bfloat16,
                                         softmax_fp32=False, attn_remat=True)

    for name, kw in arms():
        model = Transformer1D(num_layers=10, heads=8, head_dim=64, **kw)
        x0 = jnp.asarray(SALT.normal(size=(b, c, t)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x0)
        try:
            chain_timed(f"{name} fwd",
                        lambda v, p: model.apply(p, v), x0, params,
                        iters=args.iters)
            chain_timed(
                f"{name} fwd+bwd(dX)",
                jax.grad(lambda v, p: jnp.sum(
                    model.apply(p, v).astype(jnp.float32)), argnums=0),
                x0, params, iters=args.iters)
        except Exception as e:
            print(f"[t] {name} FAILED: {repr(e)[:120]}", flush=True)

    # vmap2: stacked params, batched over the leading axis — per-PAIR cost
    model = Transformer1D(num_layers=10, heads=8, head_dim=64,
                          dtype=jnp.bfloat16)
    x0 = jnp.asarray(SALT.normal(size=(b, c, t)).astype(np.float32))
    p1 = model.init(jax.random.PRNGKey(0), x0)
    p2 = model.init(jax.random.PRNGKey(1), x0)
    pstack = jax.tree_util.tree_map(lambda a, bb: jnp.stack([a, bb]), p1, p2)
    x2 = jnp.asarray(SALT.normal(size=(2, b, c, t)).astype(np.float32))
    vapply = jax.vmap(lambda p, v: model.apply(p, v), in_axes=(0, 0))
    try:
        chain_timed("vmap2 bf16 fwd (pair)",
                    lambda v, p: vapply(p, v), x2, pstack, iters=args.iters)
        chain_timed(
            "vmap2 bf16 fwd+bwd (pair)",
            jax.grad(lambda v, p: jnp.sum(
                vapply(p, v).astype(jnp.float32)), argnums=0),
            x2, pstack, iters=args.iters)
    except Exception as e:
        print(f"[t] vmap2 FAILED: {repr(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
