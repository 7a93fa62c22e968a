"""Spring joints: compiled arrays, force application, angle readout, FK.

Implements the legacy-Brax-style joint contract the reference consumes
(SURVEY.md §2.9), generalized to 1/2/3 rotational dof:

  * positional spring pulling the two bodies' world-space anchors together
  * alignment torques locking the (3 - dof) non-free rotational axes
  * per-dof angle-limit torque springs
  * relative angular damping
  * torque actuators (tau = strength * clip(act, -1, 1)) and angle actuators
    (saturating position servo toward a commanded angle)

Joint angles are the intrinsic x-y'-z'' Euler decomposition of the relative
rotation in the joint frame, so a 1-dof hinge reads the classic
2*atan2(q_x, q_w) about its x axis. `angle_vel` mirrors
`sys.joints[i].angle_vel(qp) -> ((a_1..a_dof), (v_1..v_dof))`
(/root/reference/po_brax/envs/ant_tag.py:156).

All J joints of a dof-class are applied as one vectorized computation — no
per-joint Python loop survives tracing.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from pobrax_tpu.ops import quaternion as quat
from pobrax_tpu.physics import config as pcfg
from pobrax_tpu.physics.bodies import Bodies
from pobrax_tpu.physics.state import P, QP

# Position-servo gain for "angle" actuators: tau = clip(GAIN * (target_rad -
# angle_rad), ±strength). This is a deliberate deviation from legacy brax's
# Angle actuator (torque = strength * (clip(target_deg→rad, limits) - angle));
# documented in PARITY.md "Known deltas". Shared by the fused path
# (physics/fused.py) so both step implementations stay in lock-step.
ANGLE_SERVO_GAIN = 25.0

_X = np.array([1.0, 0.0, 0.0], np.float32)
_Y = np.array([0.0, 1.0, 0.0], np.float32)
_Z = np.array([0.0, 0.0, 1.0], np.float32)
_AXES = (_X, _Y, _Z)


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


def euler_xyz_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Intrinsic x-y'-z'' Euler angles (..., 3) of a quaternion (..., 4).

    For a pure single-axis rotation this reduces to the hinge angle about
    that axis; used both for angle readout and limit torques.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    # rotation-matrix entries of R = Rx(a) @ Ry(b) @ Rz(c)
    m02 = 2.0 * (x * z + w * y)
    m12 = 2.0 * (y * z - w * x)
    m22 = 1.0 - 2.0 * (x * x + y * y)
    m01 = 2.0 * (x * y - w * z)
    m00 = 1.0 - 2.0 * (y * y + z * z)
    a = jnp.arctan2(-m12, m22)
    b = jnp.arcsin(jnp.clip(m02, -1.0, 1.0))
    c = jnp.arctan2(-m01, m00)
    return jnp.stack([a, b, c], axis=-1)


class JointGroup:
    """All joints of one dof-class (1, 2 or 3), as flat arrays (J, ...)."""

    def __init__(self, cfg: pcfg.Config, bodies: Bodies,
                 joints: Sequence[pcfg.Joint], dof: int):
        assert all(len(j.angle_limits) == dof for j in joints)
        self.dof = dof
        self.count = len(joints)
        self.names = tuple(j.name for j in joints)
        self.parent = np.array([bodies.index[j.parent] for j in joints], np.int32)
        self.child = np.array([bodies.index[j.child] for j in joints], np.int32)
        self.off_p = np.array([j.parent_offset for j in joints], np.float32)
        self.off_c = np.array([j.child_offset for j in joints], np.float32)
        self.q_j = (np.stack([_euler_to_quat_np(j.rotation) for j in joints])
                    if joints else np.zeros((0, 4), np.float32))
        deg2rad = math.pi / 180.0
        self.limit = np.array(
            [[[l.min * deg2rad, l.max * deg2rad] for l in j.angle_limits] for j in joints],
            np.float32,
        ).reshape(self.count, dof, 2)
        self.stiffness = np.array([j.stiffness for j in joints], np.float32)
        self.spring_damping = np.array(
            [j.spring_damping if j.spring_damping is not None else 2.0 * math.sqrt(j.stiffness)
             for j in joints],
            np.float32,
        )
        self.limit_strength = np.array(
            [j.limit_strength if j.limit_strength is not None else j.stiffness for j in joints],
            np.float32,
        )
        self.angular_damping = np.array([j.angular_damping for j in joints], np.float32)

        # actuator wiring: act_idx[j] = start index into the action vector
        # (or -1); the action vector is ordered by cfg.actuators declaration,
        # each actuator consuming `dof(joint)` consecutive dims.
        act_idx = np.full(self.count, -1, np.int32)
        act_strength = np.zeros(self.count, np.float32)
        act_kind = np.zeros(self.count, np.int32)  # 0 torque, 1 angle
        joint_pos = {name: i for i, name in enumerate(self.names)}
        a_i = 0
        for a in cfg.actuators:
            if a.joint in joint_pos:
                j = joint_pos[a.joint]
                act_idx[j] = a_i
                act_strength[j] = a.strength
                act_kind[j] = 1 if a.kind == "angle" else 0
            a_i += _dof_of(cfg, a.joint)
        self.act_idx = act_idx
        self.act_strength = act_strength
        self.act_kind = act_kind

        # default angle: config override, else midpoint of limits
        # (legacy default_angle contract; consumed via sys.default_angle() at
        #  /root/reference/po_brax/envs/ant_tag.py:66)
        overrides = {d.name: d.angle for d in cfg.default_angles}
        defaults = []
        for j in joints:
            ov = overrides.get(j.name)
            for d, l in enumerate(j.angle_limits):
                val = ov[d] if ov is not None else 0.5 * (l.min + l.max)
                defaults.append(val * deg2rad)
        self.default_angle = np.array(defaults, np.float32).reshape(self.count * dof)

    # ---- kinematics ------------------------------------------------------------

    def _frames(self, qp: QP):
        """World-frame joint data: joint frames and relative rotation."""
        q_p = qp.rot[self.parent]  # (J, 4)
        q_c = qp.rot[self.child]
        q_pj = quat.quat_mul(q_p, self.q_j)  # joint frame in world (via parent)
        q_cj = quat.quat_mul(q_c, self.q_j)  # joint frame in world (via child)
        q_d = quat.quat_mul(quat.quat_inv(q_pj), q_cj)  # relative rot, joint frame
        return q_p, q_c, q_pj, q_d

    def _world_axes(self, q_pj: jnp.ndarray) -> jnp.ndarray:
        """(J, dof, 3) world-frame rotation axes (joint-frame x, y, z)."""
        axes = [quat.rotate(jnp.broadcast_to(ax, (self.count, 3)), q_pj)
                for ax in _AXES[: self.dof]]
        return jnp.stack(axes, axis=1)

    def angles(self, q_d: jnp.ndarray) -> jnp.ndarray:
        """(J, dof) joint angles from the relative rotation."""
        if self.dof == 1:
            return (2.0 * jnp.arctan2(q_d[..., 1], q_d[..., 0]))[..., None]
        return euler_xyz_from_quat(q_d)[..., : self.dof]

    def angle_vel(self, qp: QP) -> Tuple[Tuple[jnp.ndarray, ...], Tuple[jnp.ndarray, ...]]:
        """((angles per dof), (vels per dof)), radians / rad s^-1."""
        _, _, q_pj, q_d = self._frames(qp)
        ang = self.angles(q_d)
        axes = self._world_axes(q_pj)
        rel_ang = (qp.ang[self.child] - qp.ang[self.parent])[:, None, :]  # (J,1,3)
        vel = jnp.sum(rel_ang * axes, axis=-1)  # (J, dof)
        return (tuple(ang[:, d] for d in range(self.dof)),
                tuple(vel[:, d] for d in range(self.dof)))

    # ---- dynamics ------------------------------------------------------------

    def apply(self, qp: QP, bodies: Bodies) -> P:
        """Spring + limit + alignment + damping forces, as accelerations."""
        if self.count == 0:
            return P.zero(bodies.count)
        q_p, q_c, q_pj, q_d = self._frames(qp)
        pos_p, pos_c = qp.pos[self.parent], qp.pos[self.child]
        r_p = quat.rotate(self.off_p, q_p)  # anchor lever arms, world
        r_c = quat.rotate(self.off_c, q_c)
        anchor_p = pos_p + r_p
        anchor_c = pos_c + r_c
        vel_anchor_p = qp.vel[self.parent] + jnp.cross(qp.ang[self.parent], r_p)
        vel_anchor_c = qp.vel[self.child] + jnp.cross(qp.ang[self.child], r_c)

        # (a) positional spring pulling anchors together (force on child toward parent)
        d = anchor_p - anchor_c  # (J, 3)
        force_c = self.stiffness[:, None] * d \
            + self.spring_damping[:, None] * (vel_anchor_p - vel_anchor_c)

        # (b) alignment torque on the (3 - dof) locked rotational axes:
        # small-angle rotation vector of q_d with the free components zeroed
        rv = 2.0 * jnp.sign(q_d[..., 0:1]) * q_d[..., 1:]  # (J, 3) joint frame
        err_local = rv * np.concatenate(
            [np.zeros(self.dof, np.float32), np.ones(3 - self.dof, np.float32)])
        torque_align_c = -self.stiffness[:, None] * quat.rotate(err_local, q_pj)

        # (c) per-dof angle-limit torque springs about the world axes
        ang = self.angles(q_d)  # (J, dof)
        clipped = jnp.clip(ang, self.limit[..., 0], self.limit[..., 1])
        axes = self._world_axes(q_pj)  # (J, dof, 3)
        torque_limit_c = jnp.sum(
            (self.limit_strength[:, None] * (clipped - ang))[..., None] * axes, axis=1)

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
        """Per-dof actuation about the world joint axes.

        torque kind: tau_d = strength * clip(act_d, -1, 1)
        angle kind:  tau_d = clip(25 * (act_d - angle_d), -strength, strength)
                     — a saturating position servo (legacy "angle" actuators,
                     used by ur5e/grasp-class systems).
        """
        # no joints, or none of this group's joints actuated (an empty action
        # vector must not be gathered from — systems with joints but zero
        # actuators are legal)
        if self.count == 0 or not np.any(self.act_idx >= 0):
            return P.zero(bodies.count)
        _, _, q_pj, q_d = self._frames(qp)
        axes = self._world_axes(q_pj)  # (J, dof, 3)
        actuated = self.act_idx >= 0
        base = jnp.maximum(self.act_idx, 0)
        dof_ids = base[:, None] + np.arange(self.dof)[None, :]  # (J, dof)
        a = jnp.where(actuated[:, None], act[dof_ids], 0.0)  # (J, dof)

        tau_torque = self.act_strength[:, None] * jnp.clip(a, -1.0, 1.0)
        ang = self.angles(q_d)
        tau_angle = jnp.clip(
            ANGLE_SERVO_GAIN * (a - ang),
            -self.act_strength[:, None], self.act_strength[:, None])
        tau = jnp.where((self.act_kind == 1)[:, None], tau_angle, tau_torque)
        tau = jnp.where(actuated[:, None], tau, 0.0)

        torque = jnp.sum(tau[..., None] * axes, axis=1)  # (J, 3)
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
