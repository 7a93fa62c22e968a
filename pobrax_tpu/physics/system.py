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
from pobrax_tpu.physics.joints import JointGroup, _euler_to_quat_np
from pobrax_tpu.physics.state import Info, P, QP

_X = jnp.array([1.0, 0.0, 0.0], jnp.float32)
_Y = jnp.array([0.0, 1.0, 0.0], jnp.float32)
_Z = jnp.array([0.0, 0.0, 1.0], jnp.float32)


class System:
    def __init__(self, cfg: pcfg.Config):
        pcfg.validate(cfg)
        self.config = cfg
        self.body = Bodies(cfg)
        self.num_bodies = self.body.count

        # grouped by dof class, mirroring sys.joints[i] (the reference's
        # all-hinge ant uses joints[0]); global dof ordering is group-major
        # then joint-major within a group
        self.joints = []
        for dof in (1, 2, 3):
            group = tuple(j for j in cfg.joints if len(j.angle_limits) == dof)
            if group:
                self.joints.append(JointGroup(cfg, self.body, group, dof))
        self.num_joints = len(cfg.joints)
        self.num_joint_dof = sum(len(j.angle_limits) for j in cfg.joints)
        num_act_dof = sum(len(self._joint_by_name(a.joint).angle_limits)
                          for a in cfg.actuators)
        # thrusters consume one action dim each, after all joint-actuator dims
        self.action_size = num_act_dof + len(cfg.thrusters)
        self._thruster_body = np.array(
            [self.body.index[t.body] for t in cfg.thrusters], np.int32)
        self._thruster_dir = np.array(
            [t.direction for t in cfg.thrusters], np.float32).reshape(-1, 3)
        self._thruster_strength = np.array(
            [t.strength for t in cfg.thrusters], np.float32)
        self._thruster_act0 = num_act_dof
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
        # the scalar-unrolled fast path trades a big (slow-to-compile) graph
        # for dense VPU kernels — a clear win on TPU, a compile-time tax on
        # the CPU test path. Default: on for TPU, off elsewhere;
        # POBRAX_FUSED=1/0 overrides.
        import os
        flag = os.environ.get("POBRAX_FUSED")
        use_fused = (jax.default_backend() != "cpu") if flag is None else flag == "1"
        if use_fused:
            from pobrax_tpu.physics import fused
            self._fused_step = fused.make_fused_step(self)
            # POBRAX_PALLAS=1: vmapped callers run the whole control step
            # (all substeps + contacts) inside ONE Pallas kernel, state
            # resident in VMEM (physics/pallas_step.py). Unbatched callers
            # keep the plain fused path via custom_vmap dispatch.
            if os.environ.get("POBRAX_PALLAS") == "1":
                from pobrax_tpu.physics import pallas_step
                # POBRAX_PALLAS_BLOCK bounds the kernel's VMEM footprint:
                # the unrolled substep chain allocates ~(intermediates x
                # blk) on the scoped-VMEM stack (16MB default limit).
                self._fused_step = pallas_step.wrap_custom_vmap(
                    self, self._fused_step,
                    block=int(os.environ.get("POBRAX_PALLAS_BLOCK", "1024")))
        else:
            self._fused_step = None

    # ---- defaults / FK -------------------------------------------------------

    def _joint_by_name(self, name: str) -> pcfg.Joint:
        for j in self.config.joints:
            if j.name == name:
                return j
        raise KeyError(name)

    def _dof_slice(self, joint_name: str):
        """(group, slot, start) — where `joint_name`'s dofs live in the
        global group-major angle vector."""
        start = 0
        for g in self.joints:
            if joint_name in g.names:
                slot = g.names.index(joint_name)
                return g, slot, start + slot * g.dof
            start += g.count * g.dof
        raise KeyError(joint_name)

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

        for j in self._fk_order:
            group, slot, start = self._dof_slice(j.name)
            theta = joint_angle[start:start + group.dof]
            theta_dot = joint_velocity[start:start + group.dof]
            p_i = self.body.index[j.parent]
            c_i = self.body.index[j.child]
            q_j = jnp.asarray(group.q_j[slot])
            q_p = rot[p_i]
            # intrinsic x-y'-z'' composition over the joint's free axes
            q_axis = quat.quat_rot_axis(_X, theta[0])
            if group.dof >= 2:
                q_axis = quat.quat_mul(q_axis, quat.quat_rot_axis(_Y, theta[1]))
            if group.dof >= 3:
                q_axis = quat.quat_mul(q_axis, quat.quat_rot_axis(_Z, theta[2]))
            q_c = quat.quat_mul(quat.quat_mul(quat.quat_mul(q_p, q_j), q_axis), quat.quat_inv(q_j))
            off_p = jnp.asarray(group.off_p[slot])
            off_c = jnp.asarray(group.off_c[slot])
            anchor = pos[p_i] + quat.rotate(off_p, q_p)
            c_pos = anchor - quat.rotate(off_c, q_c)
            q_pj = quat.quat_mul(q_p, q_j)
            c_ang = ang[p_i]
            for d, ax in zip(range(group.dof), (_X, _Y, _Z)):
                c_ang = c_ang + quat.rotate(ax, q_pj) * theta_dot[d]
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
        """`substeps` spring-dynamics substeps; returns (qp', accumulated Info).

        Dispatch is purely backend-based: the scalar-unrolled fast path
        (physics/fused.py, which covers the engine's full feature set) runs
        on non-CPU backends, the vectorized `step_generic` elsewhere;
        POBRAX_FUSED=1/0 overrides. Any semantic change must be made to BOTH
        paths (tests/test_fused.py cross-validates them)."""
        if self._fused_step is not None:
            return self._fused_step(qp, act)
        return self.step_generic(qp, act)

    def step_generic(self, qp: QP, act: jnp.ndarray) -> Tuple[QP, Info]:
        """The reference vectorized implementation of `step`."""

        def substep(carry, _):
            qp, info = carry
            dp_j = P.zero(self.num_bodies, qp.pos.dtype)
            dp_a = P.zero(self.num_bodies, qp.pos.dtype)
            for g in self.joints:
                dp_j = dp_j + g.apply(qp, self.body)
                dp_a = dp_a + g.apply_actuators(qp, act, self.body)
            if len(self._thruster_body):
                a = act[self._thruster_act0:self._thruster_act0 + len(self._thruster_body)]
                force = (self._thruster_strength * jnp.clip(a, -1.0, 1.0))[:, None] \
                    * self._thruster_dir
                dvel = jnp.zeros((self.num_bodies, 3), qp.pos.dtype).at[
                    self._thruster_body].add(
                    force * self.body.inv_mass[self._thruster_body, None])
                dp_a = dp_a + P(vel=dvel, ang=jnp.zeros((self.num_bodies, 3), qp.pos.dtype))
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
