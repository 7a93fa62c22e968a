"""Planar locomotion envs: halfcheetah, hopper, walker2d.

Behavioral equivalents of the stock brax envs the reference registers
(/root/reference/po_brax/envs/__init__.py:37,38,46). Observation layouts
match the reference's mask tables (standard_observability_masks.py):
  halfcheetah: POSITION [0,11) = z + quat + 6 angles, VELOCITY [11,23)
  hopper:      POSITION [0,8)  = z + quat + 3 angles, VELOCITY [8,14)
  walker2d:    POSITION [0,11) = z + quat + 6 angles, VELOCITY [11,20)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pobrax_tpu.envs.base import Env, State
from pobrax_tpu.physics import planar
from pobrax_tpu.physics.state import Info, QP


class _PlanarEnv(Env):
    """Shared reset/obs machinery for the planar family."""

    _noise = 0.005

    def reset(self, rng: jnp.ndarray) -> State:
        rng, rng1, rng2 = jax.random.split(rng, 3)
        qpos = self.sys.default_angle() + jax.random.uniform(
            rng1, (self.sys.num_joint_dof,), minval=-self._noise, maxval=self._noise)
        qvel = jax.random.uniform(
            rng2, (self.sys.num_joint_dof,), minval=-self._noise, maxval=self._noise)
        qp = self.sys.default_qp(joint_angle=qpos, joint_velocity=qvel)
        info = self.sys.info(qp)
        obs = self._get_obs(qp, info)
        zero = jnp.float32(0)
        metrics = {"reward_forward": zero, "reward_ctrl_cost": zero,
                   "reward_survive": zero}
        return State(qp, obs, zero, zero, metrics, {"rng": rng})

    def _get_obs(self, qp: QP, info: Info) -> jnp.ndarray:
        angles, vels = [], []
        for g in self.sys.joints:
            a, v = g.angle_vel(qp)
            angles += list(a)
            vels += list(v)
        joint_angle = jnp.concatenate([x.reshape(-1) for x in angles])
        joint_vel = jnp.concatenate([x.reshape(-1) for x in vels])
        return self._obs_from_parts(qp, joint_angle, joint_vel)

    def _obs_from_parts(self, qp, joint_angle, joint_vel):
        raise NotImplementedError


class Halfcheetah(_PlanarEnv):
    """Run forward; reward = forward velocity - 0.1 * ctrl cost; no
    termination besides the step budget (stock halfcheetah semantics)."""

    def __init__(self, **kwargs):
        super().__init__(planar.halfcheetah_config())
        self.torso = self.sys.body.index["torso"]

    def _obs_from_parts(self, qp, joint_angle, joint_vel):
        # pos [0,11): z(1) + quat(4) + angles(6); vel [11,23): vel(3)+ang(3)+vels(6)
        return jnp.concatenate([
            qp.pos[self.torso, 2:], qp.rot[self.torso], joint_angle,
            qp.vel[self.torso], qp.ang[self.torso], joint_vel,
        ])

    def step(self, state: State, action: jnp.ndarray) -> State:
        qp, info = self.sys.step(state.qp, action)
        obs = self._get_obs(qp, info)
        forward = (qp.pos[self.torso, 0] - state.qp.pos[self.torso, 0]) / self.sys.config.dt
        ctrl = 0.1 * jnp.sum(jnp.square(jnp.clip(action, -1, 1)))
        reward = forward - ctrl
        metrics = {**state.metrics, "reward_forward": forward,
                   "reward_ctrl_cost": ctrl, "reward_survive": jnp.float32(0)}
        return state.replace(qp=qp, obs=obs, reward=reward,
                             done=jnp.float32(0), metrics=metrics)


class Hopper(_PlanarEnv):
    """Hop forward; healthy while z in (0.7, 2.0) and |pitch| < 0.3 rad."""

    def __init__(self, **kwargs):
        super().__init__(planar.hopper_config())
        self.torso = self.sys.body.index["torso"]

    def _obs_from_parts(self, qp, joint_angle, joint_vel):
        # pos [0,8): z(1) + quat(4) + angles(3); vel [8,14): vx,vz,wy + vels(3)
        return jnp.concatenate([
            qp.pos[self.torso, 2:], qp.rot[self.torso], joint_angle,
            qp.vel[self.torso, 0:1], qp.vel[self.torso, 2:3],
            qp.ang[self.torso, 1:2], joint_vel,
        ])

    def step(self, state: State, action: jnp.ndarray) -> State:
        qp, info = self.sys.step(state.qp, action)
        obs = self._get_obs(qp, info)
        forward = (qp.pos[self.torso, 0] - state.qp.pos[self.torso, 0]) / self.sys.config.dt
        ctrl = 1e-3 * jnp.sum(jnp.square(jnp.clip(action, -1, 1)))
        survive = jnp.float32(1.0)
        reward = forward - ctrl + survive
        z = qp.pos[self.torso, 2]
        pitch = 2.0 * jnp.arctan2(qp.rot[self.torso, 2], qp.rot[self.torso, 0])
        done = jnp.where(
            (z < 0.7) | (z > 2.0) | (jnp.abs(pitch) > 0.3),
            jnp.float32(1), jnp.float32(0))
        metrics = {**state.metrics, "reward_forward": forward,
                   "reward_ctrl_cost": ctrl, "reward_survive": survive}
        return state.replace(qp=qp, obs=obs, reward=reward, done=done, metrics=metrics)


class Walker2d(_PlanarEnv):
    """Walk forward; healthy while z in (0.8, 2.0) and |pitch| < 1.0 rad."""

    def __init__(self, **kwargs):
        super().__init__(planar.walker2d_config())
        self.torso = self.sys.body.index["torso"]

    def _obs_from_parts(self, qp, joint_angle, joint_vel):
        # pos [0,11): z(1) + quat(4) + angles(6); vel [11,20): vx,vz,wy + vels(6)
        return jnp.concatenate([
            qp.pos[self.torso, 2:], qp.rot[self.torso], joint_angle,
            qp.vel[self.torso, 0:1], qp.vel[self.torso, 2:3],
            qp.ang[self.torso, 1:2], joint_vel,
        ])

    def step(self, state: State, action: jnp.ndarray) -> State:
        qp, info = self.sys.step(state.qp, action)
        obs = self._get_obs(qp, info)
        forward = (qp.pos[self.torso, 0] - state.qp.pos[self.torso, 0]) / self.sys.config.dt
        ctrl = 1e-3 * jnp.sum(jnp.square(jnp.clip(action, -1, 1)))
        survive = jnp.float32(1.0)
        reward = forward - ctrl + survive
        z = qp.pos[self.torso, 2]
        pitch = 2.0 * jnp.arctan2(qp.rot[self.torso, 2], qp.rot[self.torso, 0])
        done = jnp.where(
            (z < 0.8) | (z > 2.0) | (jnp.abs(pitch) > 1.0),
            jnp.float32(1), jnp.float32(0))
        metrics = {**state.metrics, "reward_forward": forward,
                   "reward_ctrl_cost": ctrl, "reward_survive": survive}
        return state.replace(qp=qp, obs=obs, reward=reward, done=done, metrics=metrics)
