"""Shared test helpers: synthetic Gaussian scenes and cameras."""
import jax
import jax.numpy as jnp
import numpy as np

from guassianhand_tpu.core.camera import Camera
from guassianhand_tpu.core.gaussians import Gaussians


def make_camera(height=64, width=64, fov_deg=60.0, dist=2.5):
    f = 0.5 * width / np.tan(np.radians(fov_deg) / 2)
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]], np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = dist  # camera looking down +z at origin
    return Camera.from_w2c(w2c, K, height, width)


def make_gaussians(n=256, seed=0, spread=0.6, scale_range=(0.01, 0.08),
                   opacity_range=(0.2, 0.9), sh_degree=0):
    rng = np.random.RandomState(seed)
    xyz = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    scaling = rng.uniform(*scale_range, (n, 3)).astype(np.float32)
    opacity = rng.uniform(*opacity_range, (n, 1)).astype(np.float32)
    k = (sh_degree + 1) ** 2
    shs = rng.uniform(0, 1, (n, k, 3)).astype(np.float32)
    return Gaussians(
        xyz=jnp.asarray(xyz), opacity=jnp.asarray(opacity),
        rotation=jnp.asarray(q), scaling=jnp.asarray(scaling),
        shs=jnp.asarray(shs))
