"""Gaussian primitive container.

TPU-native counterpart of the reference ``GaussianModel`` NamedTuple
(ref: tgs/models/renderer_one_shot.py:114-154). Under ``jit`` we never
boolean-index a dynamic number of primitives; instead the container carries a
static-capacity buffer plus a ``valid`` mask (see SURVEY.md §7.1).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Gaussians:
    """A (possibly padded) set of 3D Gaussians.

    Attributes:
      xyz:      (N, 3) means in world space.
      opacity:  (N, 1) in [0, 1] (post-sigmoid).
      rotation: (N, 4) unit quaternions (w, x, y, z).
      scaling:  (N, 3) positive scales (post-exp).
      shs:      (N, K, 3) SH coefficients, or (N, 1, 3) precomputed RGB colors.
      valid:    optional (N,) float/bool mask; invalid slots are padding and must
                not contribute to a render (their opacity is forced to zero).
    """

    xyz: jax.Array
    opacity: jax.Array
    rotation: jax.Array
    scaling: jax.Array
    shs: jax.Array
    valid: Optional[jax.Array] = None

    @property
    def n(self) -> int:
        return self.xyz.shape[0]

    def effective_opacity(self) -> jax.Array:
        """Opacity with padding slots zeroed. Batch-safe: opacity (..., N, 1)
        with valid (..., N) — `[..., None]`, NOT `[:, None]`, which under a
        leading batch axis silently broadcast (B, N, 1) x (B, 1, N) and
        dropped the mask."""
        if self.valid is None:
            return self.opacity
        return self.opacity * self.valid.astype(self.opacity.dtype)[..., None]

    def to_ply(self, path: str) -> None:
        """Export to a standard 3DGS .ply (inverse-sigmoid opacity, log scales).

        Matches the attribute layout written by the reference
        (renderer_one_shot.py:136-154) so the output is loadable by common
        3DGS viewers. Host-side; pulls data off device.
        """
        xyz = np.asarray(self.xyz)
        opa = np.asarray(self.opacity)
        rot = np.asarray(self.rotation)
        scl = np.asarray(self.scaling)
        shs = np.asarray(self.shs)
        if self.valid is not None:
            keep = np.asarray(self.valid) > 0.5
            xyz, opa, rot, scl, shs = xyz[keep], opa[keep], rot[keep], scl[keep], shs[keep]

        n = xyz.shape[0]
        f_dc = shs[:, :1].reshape(n, -1)
        f_rest = shs[:, 1:].reshape(n, -1)
        opa = np.log(np.clip(opa, 1e-3, 1 - 1e-3) / (1 - np.clip(opa, 1e-3, 1 - 1e-3)))
        scl = np.log(np.maximum(scl, 1e-12))

        names = ["x", "y", "z", "nx", "ny", "nz"]
        names += [f"f_dc_{i}" for i in range(f_dc.shape[1])]
        names += [f"f_rest_{i}" for i in range(f_rest.shape[1])]
        names += ["opacity"]
        names += [f"scale_{i}" for i in range(scl.shape[1])]
        names += [f"rot_{i}" for i in range(rot.shape[1])]
        cols = np.concatenate(
            [xyz, np.zeros_like(xyz), f_dc, f_rest, opa, scl, rot], axis=1
        ).astype("<f4")

        header = "\n".join(
            ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
            + [f"property float {p}" for p in names]
            + ["end_header", ""]
        )
        with open(path, "wb") as f:
            f.write(header.encode("ascii"))
            f.write(cols.tobytes())


def from_ply(path: str) -> Gaussians:
    """Import a standard 3DGS .ply (the inverse of ``Gaussians.to_ply``).

    Accepts the attribute layout written by this module and by the reference
    exporter (renderer_one_shot.py:136-154): float32 properties
    x/y/z, f_dc_*, f_rest_*, opacity (pre-sigmoid), scale_* (log), rot_*.
    Extra properties (e.g. nx/ny/nz normals) are ignored. Host-side.
    """
    with open(path, "rb") as f:
        blob = f.read()
    end = blob.index(b"end_header") + len(b"end_header")
    # header lines are ascii; the binary payload starts after the newline
    end = blob.index(b"\n", end) + 1
    header = blob[:end].decode("ascii").splitlines()

    n = None
    names = []
    fmt_ok = False
    for line in header:
        parts = line.strip().split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt_ok = parts[1] == "binary_little_endian"
        elif parts[0] == "element" and parts[1] == "vertex":
            n = int(parts[2])
        elif parts[0] == "property":
            if parts[1] != "float":
                raise ValueError(f"unsupported property type: {line!r}")
            names.append(parts[2])
    if not fmt_ok or n is None:
        raise ValueError("expected binary_little_endian ply with vertex element")

    cols = np.frombuffer(blob[end:], dtype="<f4",
                         count=n * len(names)).reshape(n, len(names))
    col = {name: cols[:, i] for i, name in enumerate(names)}

    def group(prefix):
        keys = sorted((k for k in names if k.startswith(prefix)),
                      key=lambda k: int(k[len(prefix):]))
        return np.stack([col[k] for k in keys], axis=1) if keys else None

    xyz = np.stack([col["x"], col["y"], col["z"]], axis=1)
    f_dc = group("f_dc_")
    f_rest = group("f_rest_")
    shs = f_dc.reshape(n, 1, 3)
    if f_rest is not None and f_rest.shape[1]:
        shs = np.concatenate([shs, f_rest.reshape(n, -1, 3)], axis=1)
    opacity = 1.0 / (1.0 + np.exp(-col["opacity"]))
    scaling = np.exp(group("scale_"))
    rotation = group("rot_")
    rotation = rotation / np.maximum(
        np.linalg.norm(rotation, axis=1, keepdims=True), 1e-9)
    return Gaussians(
        xyz=jnp.asarray(xyz),
        opacity=jnp.asarray(opacity[:, None]),
        rotation=jnp.asarray(rotation),
        scaling=jnp.asarray(scaling),
        shs=jnp.asarray(shs),
    )


def concatenate(a: Gaussians, b: Gaussians) -> Gaussians:
    def _valid(g: Gaussians) -> jax.Array:
        if g.valid is not None:
            return g.valid
        return jnp.ones((g.n,), dtype=jnp.float32)

    return Gaussians(
        xyz=jnp.concatenate([a.xyz, b.xyz], axis=0),
        opacity=jnp.concatenate([a.opacity, b.opacity], axis=0),
        rotation=jnp.concatenate([a.rotation, b.rotation], axis=0),
        scaling=jnp.concatenate([a.scaling, b.scaling], axis=0),
        shs=jnp.concatenate([a.shs, b.shs], axis=0),
        valid=jnp.concatenate([_valid(a), _valid(b)], axis=0),
    )
