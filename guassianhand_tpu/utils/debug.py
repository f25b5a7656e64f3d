"""NaN/anomaly tripwires — the aux subsystem of SURVEY.md §5.2.

The reference leans on torch anomaly mode (infer_one_shot.py:591,634); the
JAX equivalents here: jax.debug_nans-style per-step finite checks on pytrees,
``checkify``-wrapped steps for in-kernel error surfacing, and an assert-finite
helper usable inside jitted code via jax.debug.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def tree_finite_report(tree: Any) -> dict:
    """Host-side: map of leaf-path -> (finite?, absmax). For post-step audits."""
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        arr = jnp.asarray(leaf)
        if jnp.issubdtype(arr.dtype, jnp.floating):
            out[name] = (bool(jnp.isfinite(arr).all()),
                         float(jnp.abs(arr).max()) if arr.size else 0.0)
    return out


def assert_tree_finite(tree: Any, where: str = "") -> None:
    bad = {k: v for k, v in tree_finite_report(tree).items() if not v[0]}
    if bad:
        raise FloatingPointError(f"non-finite values {where}: {sorted(bad)}")


def checked(fn: Callable, *, errors=checkify.float_checks) -> Callable:
    """Wrap a jittable fn with checkify NaN/Inf checks; the wrapper raises on
    the host when a check fires (the TPU analog of detect_anomaly)."""
    cfn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def debug_assert_finite(x: jax.Array, name: str = "value") -> jax.Array:
    """In-jit tripwire: prints when non-finite values appear (does not abort).

    Usage: x = debug_assert_finite(x, "scene_codes")."""
    bad = jnp.logical_not(jnp.isfinite(x)).sum()
    jax.lax.cond(
        bad > 0,
        lambda: jax.debug.print(
            "[anomaly] {} has {} non-finite values", name, bad),
        lambda: None)
    return x
