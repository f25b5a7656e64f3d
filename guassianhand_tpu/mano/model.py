"""MANO model loading (with a synthetic fallback for tests/benches).

The real MANO pickles (MANO_RIGHT.pkl / MANO_LEFT.pkl) are licensed assets the
user supplies, as with the reference (dataset_one_shot.py:26-27 loads from
./smplx/models). Search order: explicit path arg, $MANO_MODELS_PATH, ./assets.
When absent, ``synthetic_mano_model`` builds a topologically-valid fake hand
(icosphere-ish blob with 778 verts / 1538 faces and a 16-joint chain) so every
pipeline stage runs end-to-end without the licensed files.
"""
from __future__ import annotations

import os
import pickle
from typing import Optional

import numpy as np
import jax.numpy as jnp

from guassianhand_tpu.mano.lbs import ManoModel, N_JOINTS

MANO_PARENTS = np.array(
    [-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14], np.int32)


def _to_np(x):
    # chumpy arrays expose .r; scipy sparse expose .toarray()
    if hasattr(x, "r"):
        return np.asarray(x.r)
    if hasattr(x, "toarray"):
        return np.asarray(x.toarray())
    return np.asarray(x)


def load_mano_model(hand: str = "right", path: Optional[str] = None,
                    fix_left_shapedirs: bool = True) -> Optional[ManoModel]:
    """Load a MANO pkl as a ManoModel, or None if not found."""
    candidates = []
    name = f"MANO_{hand.upper()}.pkl"
    if path:
        candidates.append(os.path.join(path, name) if os.path.isdir(path)
                          else path)
    env = os.environ.get("MANO_MODELS_PATH")
    for base in filter(None, [env, "./assets/mano", "./smplx/models/mano"]):
        candidates.append(os.path.join(base, name))
    fn = next((c for c in candidates if os.path.exists(c)), None)
    if fn is None:
        return None

    with open(fn, "rb") as f:
        data = pickle.load(f, encoding="latin1")

    shapedirs = _to_np(data["shapedirs"]).astype(np.float32)
    if hand == "left" and fix_left_shapedirs:
        # smplx left-hand shapedirs bug fix (dataset_one_shot.py:29-31)
        if np.abs(shapedirs[:, 0, :]).sum() > 0:
            shapedirs = shapedirs.copy()
            shapedirs[:, 0, :] *= -1
    posedirs = _to_np(data["posedirs"]).astype(np.float32)
    if posedirs.ndim == 3:  # (V, 3, P)
        pass
    return ManoModel(
        v_template=jnp.asarray(_to_np(data["v_template"]), jnp.float32),
        shapedirs=jnp.asarray(shapedirs[..., :10]),
        posedirs=jnp.asarray(posedirs.reshape(posedirs.shape[0], 3, -1)),
        j_regressor=jnp.asarray(_to_np(data["J_regressor"]), jnp.float32),
        lbs_weights=jnp.asarray(_to_np(data["weights"]), jnp.float32),
        parents=jnp.asarray(
            _to_np(data["kintree_table"])[0].astype(np.int64).clip(-1, None)
            .astype(np.int32) if "kintree_table" in data else MANO_PARENTS),
        faces=jnp.asarray(_to_np(data["f"]).astype(np.int32)),
    )


def synthetic_mano_model(n_vertices: int = 778, seed: int = 0) -> ManoModel:
    """Deterministic fake hand with MANO-like shapes for tests."""
    rng = np.random.RandomState(seed)
    # Elongated blob: 5 "fingers" worth of clusters along +y.
    t = np.linspace(0, 1, n_vertices)
    base = np.stack([
        0.03 * np.cos(40 * np.pi * t),
        0.12 * t,
        0.03 * np.sin(40 * np.pi * t)], axis=1)
    v_template = (base + 0.005 * rng.normal(size=(n_vertices, 3))).astype(
        np.float32)

    # Delaunay-ish fake topology: consecutive strip triangles (valid indices).
    nf = 2 * (n_vertices - 2)
    faces = np.zeros((nf, 3), np.int32)
    for i in range(n_vertices - 2):
        faces[2 * i] = (i, i + 1, i + 2)
        faces[2 * i + 1] = (i + 2, i + 1, i)
    faces = faces[:1538] if nf >= 1538 else faces

    joints_y = np.linspace(0, 0.11, N_JOINTS)
    j_reg = np.zeros((N_JOINTS, n_vertices), np.float32)
    for j in range(N_JOINTS):
        d = np.abs(v_template[:, 1] - joints_y[j])
        w = np.exp(-d * 80)
        j_reg[j] = w / w.sum()

    d_all = np.abs(v_template[:, 1][:, None] - joints_y[None, :])
    lbs_w = np.exp(-d_all * 60)
    lbs_w = (lbs_w / lbs_w.sum(1, keepdims=True)).astype(np.float32)

    return ManoModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(
            0.01 * rng.normal(size=(n_vertices, 3, 10)).astype(np.float32)),
        posedirs=jnp.asarray(
            0.001 * rng.normal(size=(n_vertices, 3, 135)).astype(np.float32)),
        j_regressor=jnp.asarray(j_reg),
        lbs_weights=jnp.asarray(lbs_w),
        parents=jnp.asarray(MANO_PARENTS),
        faces=jnp.asarray(faces),
    )
