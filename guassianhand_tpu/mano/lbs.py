"""JAX MANO: linear blend skinning, fully jitted (matmul + gathers only).

The reference runs smplx's torch MANO layer on the CPU per dataloader sample
(dataset_one_shot.py:26-31, 316-318). Here the LBS is a TPU-resident function
of (betas, pose, trans), so posing happens inside the jitted training step.

Model math follows the SMPL/MANO formulation:
  v_shaped = v_template + shapedirs @ betas
  J        = J_regressor @ v_shaped
  v_posed  = v_shaped + posedirs @ (R(pose) - I)            [pose blendshapes]
  T_k      = global rigid transforms down the kinematic tree
  v        = (sum_k w_k T_k) * v_posed + trans

Includes the left-hand shapedirs sign fix the reference applies
(dataset_one_shot.py:29-31).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from guassianhand_tpu.core.transforms import rodrigues

N_JOINTS = 16  # root + 15 finger joints


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ManoModel:
    """MANO model tensors as a pytree (one hand)."""

    v_template: jax.Array      # (V, 3)
    shapedirs: jax.Array       # (V, 3, n_betas)
    posedirs: jax.Array        # (V, 3, 135)  — (J-1)*9 pose blendshapes
    j_regressor: jax.Array     # (J, V)
    lbs_weights: jax.Array     # (V, J)
    parents: jax.Array         # (J,) int32; parents[0] == -1
    faces: jax.Array           # (F, 3) int32 (static data, not traced math)


def lbs(model: ManoModel, betas: jax.Array, pose: jax.Array,
        trans: Optional[jax.Array] = None):
    """Pose one hand.

    betas: (n_betas,); pose: (J*3,) axis-angle incl. global orient;
    trans: (3,) or None. Returns (vertices (V, 3), joints (J, 3)).
    """
    v_shaped = model.v_template + jnp.einsum(
        "vdb,b->vd", model.shapedirs, betas)
    joints = model.j_regressor @ v_shaped  # (J, 3)

    rots = rodrigues(pose.reshape(N_JOINTS, 3))  # (J, 3, 3)
    eye = jnp.eye(3, dtype=rots.dtype)
    pose_feature = (rots[1:] - eye).reshape(-1)  # (135,)
    v_posed = v_shaped + jnp.einsum("vdp,p->vd", model.posedirs, pose_feature)

    # Kinematic chain: accumulate global transforms with a scan over joints
    # (the chain is tiny — 16 joints — so the scan unrolls cheaply).
    rel_joints = joints.at[1:].add(-joints[model.parents[1:]])

    def make_tf(rot, t):
        top = jnp.concatenate([rot, t[:, None]], axis=1)
        return jnp.concatenate(
            [top, jnp.array([[0.0, 0.0, 0.0, 1.0]], rot.dtype)], axis=0)

    local_tf = jax.vmap(make_tf)(rots, rel_joints)  # (J, 4, 4)

    def walk(carry, i):
        global_tf = carry
        parent_tf = global_tf[model.parents[i]]
        tf_i = parent_tf @ local_tf[i]
        global_tf = global_tf.at[i].set(tf_i)
        return global_tf, None

    init = jnp.zeros((N_JOINTS, 4, 4), local_tf.dtype).at[0].set(local_tf[0])
    global_tf, _ = jax.lax.scan(walk, init, jnp.arange(1, N_JOINTS))

    posed_joints = global_tf[:, :3, 3]
    # Remove the rest-pose joint locations from the transforms (standard SMPL
    # "A - pack(A @ j)" correction).
    joints_h = jnp.concatenate([joints, jnp.zeros((N_JOINTS, 1))], axis=1)
    correction = jnp.einsum("jab,jb->ja", global_tf, joints_h)  # (J, 4)
    rel_tf = global_tf.at[:, :, 3].add(-correction)

    # Skinning: T = sum_k w_k rel_tf_k, then v = T[:3,:3] v + T[:3,3]
    T = jnp.einsum("vj,jab->vab", model.lbs_weights, rel_tf)  # (V, 4, 4)
    v = jnp.einsum("vab,vb->va", T[:, :3, :3], v_posed) + T[:, :3, 3]
    if trans is not None:
        v = v + trans[None, :]
        posed_joints = posed_joints + trans[None, :]
    return v, posed_joints


def mano_forward(model: ManoModel, betas, global_orient, hand_pose, trans=None):
    """smplx-style entry: global_orient (3,), hand_pose (45,)."""
    pose = jnp.concatenate([global_orient.reshape(-1), hand_pose.reshape(-1)])
    return lbs(model, betas, pose, trans)
