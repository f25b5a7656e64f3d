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
        """Opacity with padding slots zeroed."""
        if self.valid is None:
            return self.opacity
        return self.opacity * self.valid.astype(self.opacity.dtype)[:, None]

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
