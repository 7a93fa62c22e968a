"""Humanoid envs: locomotion (`humanoid`) and stand-up (`humanoidstandup`).

Behavioral equivalents of the stock brax envs registered at
/root/reference/po_brax/envs/__init__.py:39-40. The 299-dim observation
layout matches the reference's mask tables
(standard_observability_masks.py):
  [0,22)    qpos: torso z + torso quat + 17 joint angles
  [22,45)   qvel: torso vel + torso ang + 17 joint vels
  [45,144)  com-inertia block: per dynamic body (11) 9 values
  [144,210) com-velocity block: per dynamic body (11) vel+ang
  [210,227) actuator-force block: 17 clipped action torques
  [227,299) contact block: clipped contact vel+ang per body (12)
(POSITION covers [0,22)+[45,144); VELOCITY [22,45)+[144,210);
CFRC [210,299).)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pobrax_tpu.envs.base import Env, State
from pobrax_tpu.physics import humanoid as humanoid_model
from pobrax_tpu.physics.state import Info, QP


class Humanoid(Env):
    """Run forward; alive bonus 5, velocity reward, quadratic ctrl/contact
    costs; done outside the torso-height band (0.7, 2.1)."""

    _config_fn = staticmethod(humanoid_model.humanoid_config)

    def __init__(self, **kwargs):
        super().__init__(self._config_fn())
        self.torso = self.sys.body.index["torso"]
        self.n_dyn = len(humanoid_model.BODY_ORDER)
        masses = [b.mass for b in self._cfg.bodies[: self.n_dyn]]
        self._mass = jnp.asarray(masses)
        strengths = []
        for a in self._cfg.actuators:
            j = next(jj for jj in self._cfg.joints if jj.name == a.joint)
            strengths += [a.strength] * len(j.angle_limits)
        self._strength = jnp.asarray(strengths, jnp.float32)

    def reset(self, rng: jnp.ndarray) -> State:
        rng, rng1, rng2 = jax.random.split(rng, 3)
        qpos = self.sys.default_angle() + jax.random.uniform(
            rng1, (self.sys.num_joint_dof,), minval=-0.01, maxval=0.01)
        qvel = jax.random.uniform(
            rng2, (self.sys.num_joint_dof,), minval=-0.01, maxval=0.01)
        qp = self.sys.default_qp(joint_angle=qpos, joint_velocity=qvel)
        info = self.sys.info(qp)
        obs = self._get_obs(qp, info, jnp.zeros(self.sys.action_size))
        zero = jnp.float32(0)
        metrics = {"reward_forward": zero, "reward_survive": zero,
                   "reward_ctrl_cost": zero, "reward_contact_cost": zero}
        return State(qp, obs, zero, zero, metrics, {"rng": rng})

    def _joint_angles_vels(self, qp: QP):
        angles, vels = [], []
        for g in self.sys.joints:
            a, v = g.angle_vel(qp)
            # interleave per-joint (j0d0, j0d1, ...) within each group
            angles.append(jnp.stack(a, axis=-1).reshape(-1))
            vels.append(jnp.stack(v, axis=-1).reshape(-1))
        return jnp.concatenate(angles), jnp.concatenate(vels)

    def _get_obs(self, qp: QP, info: Info, action: jnp.ndarray) -> jnp.ndarray:
        joint_angle, joint_vel = self._joint_angles_vels(qp)
        n = self.n_dyn
        com = jnp.sum(self._mass[:, None] * qp.pos[:n], axis=0) / jnp.sum(self._mass)
        rel = qp.pos[:n] - com
        qpos = [qp.pos[self.torso, 2:], qp.rot[self.torso], joint_angle]
        qvel = [qp.vel[self.torso], qp.ang[self.torso], joint_vel]
        cinert = [rel.reshape(-1), qp.rot[:n, 1:].reshape(-1),
                  (self._mass[:, None] * rel).reshape(-1)]  # 11 * 9 = 99
        cvel = [qp.vel[:n].reshape(-1), qp.ang[:n].reshape(-1)]  # 66
        qfrc = [self._strength * jnp.clip(action, -1.0, 1.0)]  # 17
        cfrc = [jnp.clip(info.contact.vel, -1, 1).reshape(-1),
                jnp.clip(info.contact.ang, -1, 1).reshape(-1)]  # 72
        return jnp.concatenate(qpos + qvel + cinert + cvel + qfrc + cfrc)

    def step(self, state: State, action: jnp.ndarray) -> State:
        qp, info = self.sys.step(state.qp, action)
        obs = self._get_obs(qp, info, action)
        forward = (qp.pos[self.torso, 0] - state.qp.pos[self.torso, 0]) / self.sys.config.dt
        ctrl = 0.1 * jnp.sum(jnp.square(jnp.clip(action, -1, 1)))
        contact = 0.5e-6 * jnp.sum(jnp.square(jnp.clip(info.contact.vel, -1, 1)))
        survive = jnp.float32(5.0)
        reward = 1.25 * forward + survive - ctrl - contact
        z = qp.pos[self.torso, 2]
        done = jnp.where((z < 0.7) | (z > 2.1), jnp.float32(1), jnp.float32(0))
        metrics = {**state.metrics, "reward_forward": forward,
                   "reward_survive": survive, "reward_ctrl_cost": ctrl,
                   "reward_contact_cost": contact}
        return state.replace(qp=qp, obs=obs, reward=reward, done=done, metrics=metrics)


class HumanoidStandup(Humanoid):
    """Start lying on the back; reward torso height gain (no termination)."""

    _config_fn = staticmethod(humanoid_model.humanoid_standup_config)

    def step(self, state: State, action: jnp.ndarray) -> State:
        qp, info = self.sys.step(state.qp, action)
        obs = self._get_obs(qp, info, action)
        z = qp.pos[self.torso, 2]
        uph = z / self.sys.config.dt * 0.1
        ctrl = 0.1 * jnp.sum(jnp.square(jnp.clip(action, -1, 1)))
        contact = 0.5e-6 * jnp.sum(jnp.square(jnp.clip(info.contact.vel, -1, 1)))
        reward = uph - ctrl - contact + 1.0
        metrics = {**state.metrics, "reward_forward": uph,
                   "reward_survive": jnp.float32(1.0), "reward_ctrl_cost": ctrl,
                   "reward_contact_cost": contact}
        return state.replace(qp=qp, obs=obs, reward=reward,
                             done=jnp.float32(0), metrics=metrics)
