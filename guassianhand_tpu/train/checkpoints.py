"""Checkpoint save/resume.

Counterpart of the reference's PL ModelCheckpoint + strict=False partial loads
(infer_one_shot.py:600-617, tgs/utils/misc.py:29-59): pytree checkpoints of
(params, opt_state, step) via flax serialization, with partial/filtered restore
and a ``last`` symlink for auto-resume.
"""
from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import flax.serialization as ser
import jax


def save_checkpoint(path: str, params: Any, opt_state: Any = None,
                    step: int = 0, keep_last_link: bool = True) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    blob = ser.to_bytes({"params": params, "opt_state": opt_state,
                         "step": step})
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    if keep_last_link:
        link = os.path.join(os.path.dirname(path) or ".", "last.ckpt")
        try:
            if os.path.lexists(link):
                os.remove(link)
            os.symlink(os.path.basename(path), link)
        except OSError:
            pass


def load_checkpoint(path: str, template: Any):
    """Restore into a template {params, opt_state, step} structure."""
    with open(path, "rb") as f:
        blob = f.read()
    return ser.from_bytes(template, blob)


def _adapt_transformer_layout(ck: Any, tmpl: Any) -> Any:
    """Reconcile Transformer1D param layouts between a checkpoint tree and
    the template: unrolled ``block_{i}`` subtrees <-> the nn.scan ``blocks``
    stacked subtree (see nn/transformer.py). Without this, restoring a
    pre-scan checkpoint into a ``backbone_scan=True`` model (or vice versa)
    would silently keep every backbone leaf at its template value."""
    import numpy as np

    def is_tblock(v):
        return isinstance(v, dict) and "attn1" in v

    def rec(ck, tmpl):
        if not (isinstance(ck, dict) and isinstance(tmpl, dict)):
            return ck
        ck_blocks = sorted(
            (k for k in ck if k.startswith("block_") and is_tblock(ck[k])),
            key=lambda k: int(k.split("_")[1]))
        out = {}
        if "blocks" in tmpl and ck_blocks and "blocks" not in ck:
            out["blocks"] = jax.tree.map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]),
                *[ck[k] for k in ck_blocks])
            rest = {k: v for k, v in ck.items() if k not in ck_blocks}
        elif ("blocks" in ck and "blocks" not in tmpl
              and any(k.startswith("block_") and is_tblock(tmpl[k])
                      for k in tmpl)):
            stacked = ck["blocks"]
            n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
            for i in range(n):
                out[f"block_{i}"] = jax.tree.map(
                    lambda x, i=i: np.asarray(x)[i], stacked)
            rest = {k: v for k, v in ck.items() if k != "blocks"}
        else:
            rest = ck
        for k, v in rest.items():
            out[k] = rec(v, tmpl.get(k)) if isinstance(tmpl, dict) else v
        return out

    return rec(ck, tmpl)


def _adapt_color_b_layout(names: str, val, leaf):
    """Reconcile color_b between the reference 48-channel layout and the
    narrow consumed-rgb-triple layout (OneShotConfig.narrow_color_b).
    The renderer only samples channels 0-2 (renderer_one_shot.py:330-334);
    narrowing slices them, widening zero-fills the 45 structurally-untrained
    channels — either direction round-trips the trained signal exactly."""
    if not names.endswith("color_b") or getattr(val, "ndim", 0) != 3:
        return None
    import numpy as np
    if val.shape[0] == 48 and leaf.shape == (3,) + val.shape[1:]:
        return np.asarray(val)[:3]
    if val.shape[0] == 3 and leaf.shape == (48,) + val.shape[1:]:
        wide = np.zeros(leaf.shape, dtype=np.asarray(val).dtype)
        wide[:3] = np.asarray(val)
        return wide
    return None


def load_params_partial(path: str, params_template: Any,
                        ignore_prefixes: Sequence[str] = (),
                        verbose: bool = True) -> Any:
    """strict=False-style restore: leaves present in the checkpoint replace
    the template; missing/ignored ones keep template values
    (tgs/utils/misc.py:29-59 semantics). Transformer scan/unrolled layouts
    are reconciled automatically; the restored/total leaf count is printed
    so silent partial restores are visible."""
    state = ser.msgpack_restore(open(path, "rb").read())
    ck = state.get("params", state)
    ck = _adapt_transformer_layout(ck, params_template)

    flat_t = jax.tree_util.tree_flatten_with_path(params_template)[0]

    def get_in(d, path):
        for p in path:
            key = getattr(p, "key", getattr(p, "name", None))
            if not isinstance(d, dict) or key not in d:
                return None
            d = d[key]
        return d

    out = params_template
    replaced = {}
    for path_t, leaf in flat_t:
        names = "/".join(str(getattr(p, "key", p)) for p in path_t)
        if any(names.startswith(pref) for pref in ignore_prefixes):
            continue
        val = get_in(ck, path_t)
        if val is not None and getattr(val, "shape", None) != leaf.shape:
            val = _adapt_color_b_layout(names, val, leaf)
        if val is not None and getattr(val, "shape", None) == leaf.shape:
            replaced[names] = val

    def rebuild(path_t, leaf):
        names = "/".join(str(getattr(p, "key", p)) for p in path_t)
        return replaced.get(names, leaf)

    if verbose:
        print(f"load_params_partial: restored {len(replaced)}/{len(flat_t)} "
              f"leaves from {path}")
    return jax.tree_util.tree_map_with_path(rebuild, out)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    link = os.path.join(ckpt_dir, "last.ckpt")
    if os.path.exists(link):
        return os.path.realpath(link)
    if not os.path.isdir(ckpt_dir):
        return None
    cks = [f for f in os.listdir(ckpt_dir) if f.endswith(".ckpt")]
    if not cks:
        return None
    return os.path.join(ckpt_dir, sorted(cks)[-1])
