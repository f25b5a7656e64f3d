"""MANO LBS, subdivision, UV projection, kNN interaction mask."""
import numpy as np
import jax
import jax.numpy as jnp

from guassianhand_tpu.mano.lbs import lbs
from guassianhand_tpu.mano.model import synthetic_mano_model
from guassianhand_tpu.mano.uv import get_uvd, _closest_point_on_tri
from guassianhand_tpu.ops.knn import knn, interaction_mask
from guassianhand_tpu.ops.subdivision import (build_subdivision_plans,
                                              subdivide_n, subdivide_vertices)


def test_lbs_rest_pose_is_template():
    m = synthetic_mano_model(128)
    v, j = lbs(m, jnp.zeros(10), jnp.zeros(48))
    np.testing.assert_allclose(np.asarray(v), np.asarray(m.v_template),
                               atol=1e-5)


def test_lbs_global_rotation():
    m = synthetic_mano_model(128)
    pose = jnp.zeros(48).at[2].set(np.pi / 2)  # 90 deg about z at the root
    v, _ = lbs(m, jnp.zeros(10), pose)
    # root joint should stay fixed, all vertices rigidly rotated about it
    root = np.asarray(m.j_regressor @ m.v_template)[0]
    vt = np.asarray(m.v_template) - root
    expect = np.stack([-vt[:, 1], vt[:, 0], vt[:, 2]], 1) + root
    np.testing.assert_allclose(np.asarray(v), expect, atol=1e-4)


def test_lbs_is_jittable_and_differentiable():
    m = synthetic_mano_model(64)

    @jax.jit
    def f(pose):
        v, _ = lbs(m, jnp.zeros(10), pose)
        return (v ** 2).sum()

    g = jax.grad(f)(jnp.full(48, 0.1))
    assert np.isfinite(np.asarray(g)).all()


def test_subdivision_matches_reference_layout():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [2, 1, 3]])
    plans = build_subdivision_plans(faces, 4, 1)
    plan = plans[0]
    out = np.asarray(subdivide_vertices(jnp.asarray(verts), plan))
    # 4 original + 5 edges
    assert out.shape == (9, 3)
    np.testing.assert_allclose(out[:4], verts)
    # every new vertex is an edge midpoint
    for k, (a, b) in enumerate(plan.edges):
        np.testing.assert_allclose(out[4 + k], 0.5 * (verts[a] + verts[b]))
    # child faces: 4 per parent, indices valid
    assert plan.faces_out.shape == (8, 3)
    assert plan.faces_out.max() < 9
    # reference order for first face (mis_utils.py:102-120)
    ab = 4 + 0  # edge (0,1) discovered first
    assert tuple(plan.faces_out[0]) == (0, ab, plan.faces_out[0][2])


def test_knn_basic():
    pts = jnp.asarray(np.random.RandomState(0).uniform(size=(200, 3)),
                      jnp.float32)
    d, idx = knn(pts, pts, k=4)
    # nearest neighbor of each point is itself at distance ~0
    assert (np.asarray(idx)[:, 0] == np.arange(200)).all()
    np.testing.assert_allclose(np.asarray(d)[:, 0], 0.0, atol=1e-5)
    assert (np.diff(np.asarray(d), axis=1) >= -1e-6).all()


def test_interaction_mask_detects_contact():
    rng = np.random.RandomState(1)
    a = rng.uniform(0, 0.1, (100, 3)).astype(np.float32)
    b = a + np.array([1.0, 0, 0], np.float32)  # far apart in T-pose
    tpose = np.concatenate([a, b])
    posed = np.concatenate([a, a + np.array([0.02, 0, 0], np.float32)])
    m = interaction_mask(jnp.asarray(posed), jnp.asarray(tpose), k=16,
                         threshold=8)
    m = np.asarray(m)
    assert m.mean() > 0.5  # most points interact when hands overlap
    m2 = interaction_mask(jnp.asarray(tpose), jnp.asarray(tpose), k=16,
                          threshold=8)
    assert not np.asarray(m2).any()


def test_closest_point_on_triangle():
    a = jnp.array([0.0, 0.0, 0.0])
    b = jnp.array([1.0, 0.0, 0.0])
    c = jnp.array([0.0, 1.0, 0.0])
    # interior projection
    p = jnp.array([0.2, 0.2, 1.0])
    cp, bary = _closest_point_on_tri(p, a, b, c)
    np.testing.assert_allclose(np.asarray(cp), [0.2, 0.2, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(bary).sum(), 1.0, atol=1e-6)
    # vertex region
    p = jnp.array([-1.0, -1.0, 0.0])
    cp, _ = _closest_point_on_tri(p, a, b, c)
    np.testing.assert_allclose(np.asarray(cp), [0, 0, 0], atol=1e-6)
    # edge region
    p = jnp.array([0.5, -1.0, 0.0])
    cp, _ = _closest_point_on_tri(p, a, b, c)
    np.testing.assert_allclose(np.asarray(cp), [0.5, 0, 0], atol=1e-6)


def test_get_uvd_on_mesh_vertices():
    tri_xyz = jnp.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]],
                         [[1, 0, 0], [1, 1, 0], [0, 1, 0]]], jnp.float32)
    tri_uv = jnp.array([[[0, 0], [1, 0], [0, 1]],
                        [[1, 0], [1, 1], [0, 1]]], jnp.float32)
    pts = jnp.array([[0.25, 0.25, 0.05], [0.9, 0.9, -0.1]], jnp.float32)
    uv, d = get_uvd(pts, tri_xyz, tri_uv, chunk=2)
    np.testing.assert_allclose(np.asarray(uv)[0], [0.25, 0.25], atol=1e-5)
    np.testing.assert_allclose(np.asarray(uv)[1], [0.9, 0.9], atol=1e-5)
    np.testing.assert_allclose(np.abs(np.asarray(d)), [0.05, 0.1], atol=1e-5)
    assert np.asarray(d)[0] > 0 > np.asarray(d)[1]
