"""Spring joints: compiled arrays, force application, angle readout, FK.

Implements the legacy-Brax-style joint contract the reference consumes
(SURVEY.md §2.9): revolute (1-dof) joints as (a) positional springs pulling
the two bodies' world-space anchor points together, (b) alignment torques
locking the two non-hinge rotational dof, (c) angle-limit torque springs, and
(d) relative angular damping. `angle_vel` mirrors
`sys.joints[0].angle_vel(qp) -> ((angles,), (vels,))`
(/root/reference/po_brax/envs/ant_tag.py:156).

All J joints of a dof-class are applied as one vectorized computation — no
per-joint Python loop survives tracing.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from pobrax_tpu.ops import quaternion as quat
from pobrax_tpu.physics import config as pcfg
from pobrax_tpu.physics.bodies import Bodies
from pobrax_tpu.physics.state import P, QP

_X = np.array([1.0, 0.0, 0.0], np.float32)


def _euler_to_quat_np(v_deg) -> np.ndarray:
    half = np.asarray(v_deg, np.float64) * (math.pi / 360.0)
    c1, c2, c3 = np.cos(half)
    s1, s2, s3 = np.sin(half)
    return np.array(
        [
            c1 * c2 * c3 - s1 * s2 * s3,
            s1 * c2 * c3 + c1 * s2 * s3,
            c1 * s2 * c3 - s1 * c2 * s3,
            c1 * c2 * s3 + s1 * s2 * c3,
        ],
        np.float32,
    )


class RevoluteJoints:
    """All 1-dof joints of a system, as flat arrays (J, ...)."""

    dof = 1

    def __init__(self, cfg: pcfg.Config, bodies: Bodies, joints: Tuple[pcfg.Joint, ...]):
        self.count = len(joints)
        self.names = tuple(j.name for j in joints)
        self.parent = np.array([bodies.index[j.parent] for j in joints], np.int32)
        self.child = np.array([bodies.index[j.child] for j in joints], np.int32)
        self.off_p = np.array([j.parent_offset for j in joints], np.float32)
        self.off_c = np.array([j.child_offset for j in joints], np.float32)
        self.q_j = np.stack([_euler_to_quat_np(j.rotation) for j in joints]) if joints else np.zeros((0, 4), np.float32)
        deg2rad = math.pi / 180.0
        self.limit = np.array(
            [[j.angle_limits[0].min * deg2rad, j.angle_limits[0].max * deg2rad] for j in joints],
            np.float32,
        ).reshape(self.count, 2)
        self.stiffness = np.array([j.stiffness for j in joints], np.float32)
        self.spring_damping = np.array(
            [j.spring_damping if j.spring_damping is not None else 2.0 * math.sqrt(j.stiffness) for j in joints],
            np.float32,
        )
        self.limit_strength = np.array(
            [j.limit_strength if j.limit_strength is not None else j.stiffness for j in joints],
            np.float32,
        )
        self.angular_damping = np.array([j.angular_damping for j in joints], np.float32)

        # actuator wiring: act_idx[j] = index into the action vector (or -1)
        act_idx = np.full(self.count, -1, np.int32)
        act_strength = np.zeros(self.count, np.float32)
        joint_pos = {name: i for i, name in enumerate(self.names)}
        a_i = 0
        for a in cfg.actuators:
            if a.joint in joint_pos:
                j = joint_pos[a.joint]
                act_idx[j] = a_i
                act_strength[j] = a.strength
            a_i += _dof_of(cfg, a.joint)
        self.act_idx = act_idx
        self.act_strength = act_strength

        # default angle: config override, else midpoint of limits
        # (legacy default_angle contract; consumed via sys.default_angle() at
        #  /root/reference/po_brax/envs/ant_tag.py:66)
        overrides = {d.name: d.angle[0] for d in cfg.default_angles}
        self.default_angle = np.array(
            [
                overrides.get(j.name, 0.5 * (j.angle_limits[0].min + j.angle_limits[0].max)) * deg2rad
                for j in joints
            ],
            np.float32,
        )

    # ---- dynamics ------------------------------------------------------------

    def _frames(self, qp: QP):
        """World-frame joint data: anchor points, hinge axes, relative rotation."""
        q_p = qp.rot[self.parent]  # (J, 4)
        q_c = qp.rot[self.child]
        q_pj = quat.quat_mul(q_p, self.q_j)  # joint frame in world (via parent)
        q_cj = quat.quat_mul(q_c, self.q_j)  # joint frame in world (via child)
        q_d = quat.quat_mul(quat.quat_inv(q_pj), q_cj)  # pure hinge => rot about x
        axis = quat.rotate(jnp.broadcast_to(_X, (self.count, 3)), q_pj)  # (J, 3)
        return q_p, q_c, q_pj, q_d, axis

    def angle_vel(self, qp: QP):
        """((angles,), (vels,)) per-dof tuples, radians / rad s^-1."""
        _, _, _, q_d, axis = self._frames(qp)
        angle = 2.0 * jnp.arctan2(q_d[..., 1], q_d[..., 0])
        rel_ang = qp.ang[self.child] - qp.ang[self.parent]
        vel = jnp.sum(rel_ang * axis, axis=-1)
        return (angle,), (vel,)

    def apply(self, qp: QP, bodies: Bodies) -> P:
        """Spring + limit + alignment + damping forces, as accelerations."""
        if self.count == 0:
            return P.zero(bodies.count)
        q_p, q_c, q_pj, q_d, axis = self._frames(qp)
        pos_p, pos_c = qp.pos[self.parent], qp.pos[self.child]
        r_p = quat.rotate(self.off_p, q_p)  # anchor lever arms, world
        r_c = quat.rotate(self.off_c, q_c)
        anchor_p = pos_p + r_p
        anchor_c = pos_c + r_c
        vel_anchor_p = qp.vel[self.parent] + jnp.cross(qp.ang[self.parent], r_p)
        vel_anchor_c = qp.vel[self.child] + jnp.cross(qp.ang[self.child], r_c)

        # (a) positional spring pulling anchors together (force on child toward parent)
        d = anchor_p - anchor_c  # (J, 3)
        force_c = self.stiffness[:, None] * d + self.spring_damping[:, None] * (vel_anchor_p - vel_anchor_c)

        # (b) alignment torque on the two locked rotational dof
        # small-angle rotation vector of q_d, minus its hinge (x) component
        rv = 2.0 * jnp.sign(q_d[..., 0:1]) * q_d[..., 1:]  # (J, 3) in joint frame
        err_local = rv.at[..., 0].set(0.0)
        torque_align_c = -self.stiffness[:, None] * quat.rotate(err_local, q_pj)

        # (c) angle-limit torque spring about the hinge axis
        angle = 2.0 * jnp.arctan2(q_d[..., 1], q_d[..., 0])
        clipped = jnp.clip(angle, self.limit[:, 0], self.limit[:, 1])
        torque_limit_c = (self.limit_strength * (clipped - angle))[:, None] * axis

        # (d) relative angular damping
        torque_damp_c = -self.angular_damping[:, None] * (qp.ang[self.child] - qp.ang[self.parent])

        torque_c = torque_align_c + torque_limit_c + torque_damp_c

        # scatter to bodies as accelerations
        inv_mass = bodies.inv_mass
        inv_inertia = bodies.inv_inertia
        nbody = bodies.count
        dvel = (
            jnp.zeros((nbody, 3), force_c.dtype)
            .at[self.child].add(force_c * inv_mass[self.child, None])
            .at[self.parent].add(-force_c * inv_mass[self.parent, None])
        )
        # anchor forces also torque each body about its own center
        tq_child = jnp.cross(r_c, force_c) + torque_c
        tq_parent = jnp.cross(r_p, -force_c) - torque_c
        dang = (
            jnp.zeros((nbody, 3), force_c.dtype)
            .at[self.child].add(tq_child * inv_inertia[self.child])
            .at[self.parent].add(tq_parent * inv_inertia[self.parent])
        )
        return P(vel=dvel, ang=dang)

    def apply_actuators(self, qp: QP, act: jnp.ndarray, bodies: Bodies) -> P:
        """Torque actuators: tau = strength * clip(act, -1, 1) about the hinge axis."""
        if self.count == 0:
            return P.zero(bodies.count)
        *_, axis = self._frames(qp)
        actuated = self.act_idx >= 0
        a = jnp.where(actuated, act[jnp.maximum(self.act_idx, 0)], 0.0)
        torque = (self.act_strength * jnp.clip(a, -1.0, 1.0))[:, None] * axis  # (J, 3)
        inv_inertia = bodies.inv_inertia
        nbody = bodies.count
        dang = (
            jnp.zeros((nbody, 3), torque.dtype)
            .at[self.child].add(torque * inv_inertia[self.child])
            .at[self.parent].add(-torque * inv_inertia[self.parent])
        )
        return P(vel=jnp.zeros((nbody, 3), torque.dtype), ang=dang)


def _dof_of(cfg: pcfg.Config, joint_name: str) -> int:
    for j in cfg.joints:
        if j.name == joint_name:
            return len(j.angle_limits)
    raise KeyError(joint_name)
