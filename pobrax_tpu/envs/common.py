"""Shared observation assembly for the ant family."""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

from pobrax_tpu.physics.state import Info, QP
from pobrax_tpu.physics.system import System


def ant_full_obs(sys: System, qp: QP, info: Info) -> List[jnp.ndarray]:
    """qpos + qvel + clipped contact-force blocks common to the PO ant envs.

    Layout (reference ant_tag.py:148-181): torso pos (3), torso rot quat (4),
    joint angles (8), torso vel (3), torso ang (3), joint vels (8),
    clip(contact.vel, ±1) flattened (3*nbody), clip(contact.ang, ±1)
    flattened (3*nbody).
    """
    (joint_angle,), (joint_vel,) = sys.joints[0].angle_vel(qp)
    qpos = [qp.pos[0], qp.rot[0], joint_angle]
    qvel = [qp.vel[0], qp.ang[0], joint_vel]
    cfrc = [
        jnp.clip(info.contact.vel, -1, 1).reshape(-1),
        jnp.clip(info.contact.ang, -1, 1).reshape(-1),
    ]
    return qpos + qvel + cfrc


def dead_and_reward(qp: QP, torso_idx: int, dying_cost: float):
    """Torso-height termination band (ant_tag.py:111-113): dead if z < 0.2 or
    z > 1.0; reward = dying_cost when dead else 0."""
    z = qp.pos[torso_idx, 2]
    dead = jnp.where(z < 0.2, jnp.float32(1), jnp.float32(0))
    dead = jnp.where(z > 1.0, jnp.float32(1), dead)
    reward = jnp.where(dead > 0, jnp.float32(dying_cost), jnp.float32(0))
    return dead, reward
