"""Reacher envs: torque-driven `reacher` and servo-driven `reacherangle`.

Behavioral equivalents of the stock brax envs registered at
/root/reference/po_brax/envs/__init__.py:43-44. Observation layout matches
the reference's mask tables (standard_observability_masks.py): 11 dims =
arm cos(2)+sin(2) [0,4), target xy [4,6) (the table's POSITION segment),
joint vels [6,8), fingertip-minus-target [8,11) (TARGET_POS covers
[0,4)+[8,11)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pobrax_tpu.envs.base import Env, State
from pobrax_tpu.ops import quaternion as quat
from pobrax_tpu.physics import reacher as reacher_model
from pobrax_tpu.physics.state import QP


class Reacher(Env):
    _actuator_kind = "torque"

    def __init__(self, **kwargs):
        super().__init__(reacher_model.reacher_config(self._actuator_kind))
        self.body1 = self.sys.body.index["body1"]
        self.target = self.sys.body.index["target"]

    def reset(self, rng: jnp.ndarray) -> State:
        rng, rng1, rng2, rng3, rng4 = jax.random.split(rng, 5)
        qpos = self.sys.default_angle() + jax.random.uniform(
            rng1, (self.sys.num_joint_dof,), minval=-0.1, maxval=0.1)
        qvel = jax.random.uniform(
            rng2, (self.sys.num_joint_dof,), minval=-0.005, maxval=0.005)
        qp = self.sys.default_qp(joint_angle=qpos, joint_velocity=qvel)
        # target uniform in the reachable disk (radius <= 0.2), rejection-free:
        # sample angle + sqrt-radius
        theta = jax.random.uniform(rng3, (), minval=0.0, maxval=2.0 * jnp.pi)
        radius = 0.2 * jnp.sqrt(jax.random.uniform(rng4, (), minval=0.04, maxval=1.0))
        tpos = jnp.array([radius * jnp.cos(theta), radius * jnp.sin(theta), 0.01])
        qp = qp.replace(pos=qp.pos.at[self.target].set(tpos))
        obs = self._get_obs(qp)
        zero = jnp.float32(0)
        metrics = {"reward_dist": zero, "reward_ctrl": zero}
        return State(qp, obs, zero, zero, metrics, {"rng": rng})

    def _fingertip(self, qp: QP) -> jnp.ndarray:
        return qp.pos[self.body1] + quat.rotate(
            jnp.array([0.06, 0.0, 0.0]), qp.rot[self.body1])

    def _get_obs(self, qp: QP) -> jnp.ndarray:
        (a,), (v,) = self.sys.joints[0].angle_vel(qp)
        to_target = self._fingertip(qp) - qp.pos[self.target]
        return jnp.concatenate([
            jnp.cos(a), jnp.sin(a),
            qp.pos[self.target, :2],
            v,
            to_target,
        ])

    def step(self, state: State, action: jnp.ndarray) -> State:
        qp, _ = self.sys.step(state.qp, action)
        obs = self._get_obs(qp)
        dist = jnp.linalg.norm(self._fingertip(qp) - qp.pos[self.target])
        reward_dist = -dist
        reward_ctrl = -jnp.sum(jnp.square(jnp.clip(action, -1, 1)))
        reward = reward_dist + 0.1 * reward_ctrl
        metrics = {**state.metrics, "reward_dist": reward_dist,
                   "reward_ctrl": reward_ctrl}
        return state.replace(qp=qp, obs=obs, reward=reward,
                             done=jnp.float32(0), metrics=metrics)


class ReacherAngle(Reacher):
    """Same arm; actions command target joint angles through position servos
    (the brax ReacherAngle variant). Actions in [-1,1] map to the joint's
    angle-limit range."""

    _actuator_kind = "angle"

    def step(self, state: State, action: jnp.ndarray) -> State:
        limits = jnp.asarray(self.sys.joints[0].limit)  # (J, dof=1, 2)
        lo = jnp.maximum(limits[:, 0, 0], -jnp.pi)
        hi = jnp.minimum(limits[:, 0, 1], jnp.pi)
        target = lo + (jnp.clip(action, -1.0, 1.0) * 0.5 + 0.5) * (hi - lo)
        return super().step(state, target)
