"""The System: a compiled scene + the batched step/reset physics functions.

Mirrors the external contract the reference consumes from `brax.System`
(SURVEY.md §2.9): `body.index`, `num_bodies`, `num_joint_dof`,
`default_angle()`, `default_qp(joint_angle=, joint_velocity=)`, `info(qp)`,
`joints[0].angle_vel(qp)`, and the hot `step(qp, act) -> (qp, Info)` running
`substeps` of semi-implicit spring dynamics.

Everything static is compiled to numpy on the host at construction; `step` is
a pure function of (qp, act) suitable for jit/vmap/scan with zero dynamic
shapes. The per-substep loop is a `lax.scan` so compile time stays flat in
`substeps` (ActionRepeat multiplies substeps — wrappers.py:22-23 semantics).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pobrax_tpu.ops import quaternion as quat
from pobrax_tpu.physics import config as pcfg
from pobrax_tpu.physics.bodies import Bodies
from pobrax_tpu.physics.geometry import Contacts
from pobrax_tpu.physics.integrator import Integrator
from pobrax_tpu.physics.joints import RevoluteJoints, _euler_to_quat_np
from pobrax_tpu.physics.state import Info, P, QP

_X = jnp.array([1.0, 0.0, 0.0], jnp.float32)


class System:
    def __init__(self, cfg: pcfg.Config):
        pcfg.validate(cfg)
        self.config = cfg
        self.body = Bodies(cfg)
        self.num_bodies = self.body.count

        one_dof = tuple(j for j in cfg.joints if len(j.angle_limits) == 1)
        multi = [j for j in cfg.joints if len(j.angle_limits) != 1]
        if multi:
            raise NotImplementedError(
                f"multi-dof joints not implemented yet: {[j.name for j in multi]}")
        # grouped by dof class, mirroring sys.joints[i] (reference uses joints[0])
        self.joints = [RevoluteJoints(cfg, self.body, one_dof)] if one_dof else []
        self.num_joints = len(cfg.joints)
        self.num_joint_dof = sum(len(j.angle_limits) for j in cfg.joints)
        self.contacts = Contacts(cfg, self.body)
        self.integrator = Integrator(
            dt=cfg.dt,
            substeps=cfg.substeps,
            gravity=cfg.gravity,
            velocity_damping=cfg.velocity_damping,
            angular_damping=cfg.angular_damping,
        )
        # topological order of joints for FK + config default poses
        self._fk_order = self._topological_joints(cfg)
        self._default_pose = self._compile_default_pose(cfg)

    # ---- defaults / FK -------------------------------------------------------

    @staticmethod
    def _topological_joints(cfg: pcfg.Config):
        remaining = list(cfg.joints)
        placed = {b.name for b in cfg.bodies} - {j.child for j in cfg.joints}
        order = []
        while remaining:
            progressed = False
            for j in list(remaining):
                if j.parent in placed:
                    order.append(j)
                    placed.add(j.child)
                    remaining.remove(j)
                    progressed = True
            if not progressed:
                raise ValueError("joint graph has a cycle or disconnected parent")
        return tuple(order)

    def _compile_default_pose(self, cfg: pcfg.Config):
        pos = np.zeros((self.num_bodies, 3), np.float32)
        rot = np.zeros((self.num_bodies, 4), np.float32)
        rot[:, 0] = 1.0
        for d in cfg.default_qps:
            i = self.body.index[d.name]
            pos[i] = np.asarray(d.pos, np.float32)
            rot[i] = _euler_to_quat_np(d.rot)
        return pos, rot

    def default_angle(self) -> jnp.ndarray:
        """Per-dof default joint angles (radians): config override else limit midpoint."""
        return jnp.concatenate([jnp.asarray(g.default_angle) for g in self.joints]) if self.joints else jnp.zeros((0,))

    def default_qp(
        self,
        joint_angle: Optional[jnp.ndarray] = None,
        joint_velocity: Optional[jnp.ndarray] = None,
    ) -> QP:
        """Forward kinematics from joint angles to body frames.

        Contract of `sys.default_qp(joint_angle=, joint_velocity=)` at
        /root/reference/po_brax/envs/ant_tag.py:72. Runs fine under jit
        (angles may be tracers); the joint loop is static.
        """
        if joint_angle is None:
            joint_angle = self.default_angle()
        if joint_velocity is None:
            joint_velocity = jnp.zeros_like(joint_angle)
        pos0, rot0 = self._default_pose
        pos = jnp.asarray(pos0)
        rot = jnp.asarray(rot0)
        vel = jnp.zeros((self.num_bodies, 3), jnp.float32)
        ang = jnp.zeros((self.num_bodies, 3), jnp.float32)

        group = self.joints[0] if self.joints else None
        name_to_slot = {n: i for i, n in enumerate(group.names)} if group else {}
        for j in self._fk_order:
            slot = name_to_slot[j.name]
            theta = joint_angle[slot]
            theta_dot = joint_velocity[slot]
            p_i = self.body.index[j.parent]
            c_i = self.body.index[j.child]
            q_j = jnp.asarray(group.q_j[slot])
            q_p = rot[p_i]
            q_axis = quat.quat_rot_axis(_X, theta)
            q_c = quat.quat_mul(quat.quat_mul(quat.quat_mul(q_p, q_j), q_axis), quat.quat_inv(q_j))
            off_p = jnp.asarray(group.off_p[slot])
            off_c = jnp.asarray(group.off_c[slot])
            anchor = pos[p_i] + quat.rotate(off_p, q_p)
            c_pos = anchor - quat.rotate(off_c, q_c)
            axis_world = quat.rotate(_X, quat.quat_mul(q_p, q_j))
            c_ang = ang[p_i] + axis_world * theta_dot
            c_vel = vel[p_i] + jnp.cross(ang[p_i], anchor - pos[p_i]) + jnp.cross(c_ang, c_pos - anchor)
            pos = pos.at[c_i].set(c_pos)
            rot = rot.at[c_i].set(q_c)
            vel = vel.at[c_i].set(c_vel)
            ang = ang.at[c_i].set(c_ang)
        return QP(pos=pos, rot=rot, vel=vel, ang=ang)

    # ---- dynamics ------------------------------------------------------------

    def info(self, qp: QP) -> Info:
        """Contact diagnostics for the current qp, without stepping
        (reference reset path: ant_tag.py:81)."""
        dp_c = self.contacts.apply(qp, self.body)
        zero = P.zero(self.num_bodies, qp.pos.dtype)
        return Info(contact=dp_c, joint=zero, actuator=zero)

    def step(self, qp: QP, act: jnp.ndarray) -> Tuple[QP, Info]:
        """`substeps` spring-dynamics substeps; returns (qp', accumulated Info)."""

        def substep(carry, _):
            qp, info = carry
            dp_j = P.zero(self.num_bodies, qp.pos.dtype)
            dp_a = P.zero(self.num_bodies, qp.pos.dtype)
            for g in self.joints:
                dp_j = dp_j + g.apply(qp, self.body)
                dp_a = dp_a + g.apply_actuators(qp, act, self.body)
            qp = self.integrator.potential(qp, dp_j + dp_a, self.body)
            qp = self.integrator.kinetic(qp, self.body)
            dp_c = self.contacts.apply(qp, self.body)
            qp = self.integrator.collide(qp, dp_c, self.body)
            info = Info(
                contact=info.contact + dp_c,
                joint=info.joint + dp_j,
                actuator=info.actuator + dp_a,
            )
            return (qp, info), None

        info0 = Info.zero(self.num_bodies, qp.pos.dtype)
        (qp, info), _ = jax.lax.scan(substep, (qp, info0), None, length=self.config.substeps)
        return qp, info
