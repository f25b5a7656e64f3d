"""PLY export: binary layout round-trip (matches the standard 3DGS schema)."""
import numpy as np
import jax.numpy as jnp

from guassianhand_tpu.core.gaussians import Gaussians, from_ply


def _read_ply(path):
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        n = int(next(l for l in header if l.startswith("element vertex")
                     ).split()[-1])
        props = [l.split()[-1] for l in header if l.startswith("property")]
        data = np.frombuffer(f.read(), dtype="<f4").reshape(n, len(props))
    return props, data


def test_ply_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    n = 17
    gs = Gaussians(
        xyz=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        opacity=jnp.asarray(rng.uniform(0.1, 0.9, (n, 1)).astype(np.float32)),
        rotation=jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        scaling=jnp.asarray(rng.uniform(0.01, 0.1, (n, 3)).astype(np.float32)),
        shs=jnp.asarray(rng.normal(size=(n, 16, 3)).astype(np.float32)),
        valid=jnp.ones((n,)).at[3].set(0.0),
    )
    p = str(tmp_path / "g.ply")
    gs.to_ply(p)
    props, data = _read_ply(p)
    assert data.shape[0] == n - 1  # invalid slot dropped
    assert props[:6] == ["x", "y", "z", "nx", "ny", "nz"]
    assert "opacity" in props and "rot_3" in props and "f_rest_44" in props
    keep = np.arange(n) != 3
    np.testing.assert_allclose(data[:, :3], np.asarray(gs.xyz)[keep],
                               atol=1e-6)
    # opacity stored as inverse sigmoid
    op = 1.0 / (1.0 + np.exp(-data[:, props.index("opacity")]))
    np.testing.assert_allclose(op, np.asarray(gs.opacity)[keep, 0], atol=1e-5)
    # scales stored as log
    si = props.index("scale_0")
    np.testing.assert_allclose(np.exp(data[:, si:si + 3]),
                               np.asarray(gs.scaling)[keep], rtol=1e-5)


def test_ply_import_roundtrip(tmp_path):
    """export -> from_ply recovers the (valid) gaussians bit-close."""
    rng = np.random.RandomState(1)
    n = 23
    rot = rng.normal(size=(n, 4)).astype(np.float32)
    rot /= np.linalg.norm(rot, axis=1, keepdims=True)
    gs = Gaussians(
        xyz=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        opacity=jnp.asarray(rng.uniform(0.1, 0.9, (n, 1)).astype(np.float32)),
        rotation=jnp.asarray(rot),
        scaling=jnp.asarray(rng.uniform(0.01, 0.1, (n, 3)).astype(np.float32)),
        shs=jnp.asarray(rng.normal(size=(n, 16, 3)).astype(np.float32)),
    )
    p = str(tmp_path / "g.ply")
    gs.to_ply(p)
    back = from_ply(p)
    assert back.n == n and back.shs.shape == (n, 16, 3)
    np.testing.assert_allclose(np.asarray(back.xyz), np.asarray(gs.xyz),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(back.opacity),
                               np.asarray(gs.opacity), atol=1e-5)
    np.testing.assert_allclose(np.asarray(back.scaling),
                               np.asarray(gs.scaling), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(back.rotation),
                               np.asarray(gs.rotation), atol=1e-6)
    np.testing.assert_allclose(np.asarray(back.shs), np.asarray(gs.shs),
                               atol=1e-6)
