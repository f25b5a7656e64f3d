"""Relay-proof timing for TPU microbenches.

Two failure modes were MEASURED on the axon relay (see ROADMAP r4):

1. Cross-process request caching: byte-identical execute requests return
   cached results (a re-run of the old fixed-seed bench reported
   0.04 ms/step). Fix: salt inputs per process.
2. Lazy buffer readiness after a relay degradation: independent dispatches
   whose outputs are never consumed can be elided entirely —
   ``jax.block_until_ready`` returned after 0.19 ms/iter for a 10-layer
   transformer forward whose true cost (measured with a data-dependent
   chain) is 6.6 ms/iter. Fix: thread a data dependency from each
   iteration's OUTPUT into the next iteration's INPUT, and anchor the whole
   chain with one explicit host fetch at the end.

``chain_timed`` applies both fixes: each iteration is one jit call whose
input depends on the previous output (nothing can be cached, elided, or
overlapped), inputs are per-process salted, and one final ``float()``
fetch anchors the chain.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

_SALT = np.random.RandomState()


def chain_timed(name, fn, x0, *rest, iters=10, jitter=1e-6):
    """Times fn(x, *rest) over ``iters`` chained iterations: one jit call
    per iteration computing x_i = x0 + jitter_i + dep_{i-1} -> fn -> a tiny
    scalar dep_i. Returns ms/iter.

    x0 may be a batch dict, in which case the jitter/dependency threads
    through its "points" entry."""
    is_dict = isinstance(x0, dict)
    jit_shape = x0["points"].shape if is_dict else x0.shape

    @jax.jit
    def step(x0, j, dep, *rest):
        if is_dict:
            x = dict(x0)
            x["points"] = x0["points"] + j + dep
        else:
            x = x0 + j + dep
        out = fn(x, *rest)
        acc = jnp.float32(0)
        for leaf in jax.tree_util.tree_leaves(out):
            acc = acc + jnp.sum(leaf.ravel()[:1].astype(jnp.float32))
        return acc * jnp.float32(1e-20)

    jits = [jnp.asarray((jitter * _SALT.normal(size=jit_shape))
                        .astype(np.float32)) for _ in range(iters)]
    dep = jnp.float32(0)
    jax.block_until_ready(jits)
    dep = step(x0, jits[0], dep, *rest)  # warm-up / compile
    jax.block_until_ready(dep)
    float(dep)
    t0 = time.perf_counter()
    for j in jits:
        dep = step(x0, j, dep, *rest)
    anchor = float(dep)  # forces the WHOLE chain to execute
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"[t] {name:44s} {dt:8.2f} ms  (anchor {anchor:.1e})", flush=True)
    return dt
