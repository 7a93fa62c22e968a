"""Cart-pole envs: inverted_pendulum, inverted_double_pendulum.

Behavioral equivalents of the stock brax envs registered at
/root/reference/po_brax/envs/__init__.py:41-42. Observation layouts match
the reference's mask tables (standard_observability_masks.py):
  inverted_pendulum:        POSITION [0,6), VELOCITY [6,10)
  inverted_double_pendulum: POSITION [0,5), VELOCITY [5,25)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pobrax_tpu.envs.base import Env, State
from pobrax_tpu.ops import quaternion as quat
from pobrax_tpu.physics import pendulum
from pobrax_tpu.physics.state import Info, QP


class InvertedPendulum(Env):
    """Balance a pole on a sliding cart; +1 per step, done when it tips."""

    def __init__(self, **kwargs):
        super().__init__(pendulum.inverted_pendulum_config())
        self.cart = self.sys.body.index["cart"]
        self.pole = self.sys.body.index["pole"]

    def reset(self, rng: jnp.ndarray) -> State:
        rng, rng1, rng2 = jax.random.split(rng, 3)
        qpos = self.sys.default_angle() + jax.random.uniform(
            rng1, (self.sys.num_joint_dof,), minval=-0.01, maxval=0.01)
        qvel = jax.random.uniform(
            rng2, (self.sys.num_joint_dof,), minval=-0.01, maxval=0.01)
        qp = self.sys.default_qp(joint_angle=qpos, joint_velocity=qvel)
        obs = self._get_obs(qp)
        zero = jnp.float32(0)
        return State(qp, obs, zero, zero, {"survive": zero}, {"rng": rng})

    def _angle(self, qp: QP) -> jnp.ndarray:
        (a,), _ = self.sys.joints[0].angle_vel(qp)
        return a[0]

    def _get_obs(self, qp: QP) -> jnp.ndarray:
        (a,), (v,) = self.sys.joints[0].angle_vel(qp)
        # pos [0,6): cart_x + pole quat(4) + hinge angle
        # vel [6,10): cart_vx + pole w_y + hinge vel + pole vx
        return jnp.concatenate([
            qp.pos[self.cart, 0:1], qp.rot[self.pole], a[0:1],
            qp.vel[self.cart, 0:1], qp.ang[self.pole, 1:2], v[0:1],
            qp.vel[self.pole, 0:1],
        ])

    def step(self, state: State, action: jnp.ndarray) -> State:
        qp, _ = self.sys.step(state.qp, action)
        obs = self._get_obs(qp)
        reward = jnp.float32(1.0)
        done = jnp.where(jnp.abs(self._angle(qp)) > 0.2, jnp.float32(1), jnp.float32(0))
        return state.replace(qp=qp, obs=obs, reward=reward, done=done,
                             metrics={**state.metrics, "survive": reward})


class InvertedDoublePendulum(Env):
    """Balance a 2-link pole; mujoco-style alive bonus minus tip-distance and
    velocity penalties; done when the tip drops below 1 m above the cart."""

    def __init__(self, **kwargs):
        super().__init__(pendulum.inverted_double_pendulum_config())
        self.cart = self.sys.body.index["cart"]
        self.pole = self.sys.body.index["pole"]
        self.pole2 = self.sys.body.index["pole2"]

    def reset(self, rng: jnp.ndarray) -> State:
        rng, rng1, rng2 = jax.random.split(rng, 3)
        qpos = self.sys.default_angle() + jax.random.uniform(
            rng1, (self.sys.num_joint_dof,), minval=-0.01, maxval=0.01)
        qvel = jax.random.uniform(
            rng2, (self.sys.num_joint_dof,), minval=-0.01, maxval=0.01)
        qp = self.sys.default_qp(joint_angle=qpos, joint_velocity=qvel)
        obs = self._get_obs(qp)
        zero = jnp.float32(0)
        return State(qp, obs, zero, zero, {"distance": zero}, {"rng": rng})

    def _tip(self, qp: QP) -> jnp.ndarray:
        return qp.pos[self.pole2] + quat.rotate(
            jnp.array([0.0, 0.0, 0.3]), qp.rot[self.pole2])

    def _get_obs(self, qp: QP) -> jnp.ndarray:
        (a, ), (v, ) = self.sys.joints[0].angle_vel(qp)
        a1, a2 = a[0], a[1]
        v1, v2 = v[0], v[1]
        # pos [0,5): cart_x, sin(a1), sin(a2), cos(a1), cos(a2)
        pos = jnp.stack([qp.pos[self.cart, 0], jnp.sin(a1), jnp.sin(a2),
                         jnp.cos(a1), jnp.cos(a2)])
        # vel [5,25): (vel,ang) of cart/pole/pole2 (18) + 2 hinge vels
        vel = jnp.concatenate([
            qp.vel[self.cart], qp.ang[self.cart],
            qp.vel[self.pole], qp.ang[self.pole],
            qp.vel[self.pole2], qp.ang[self.pole2],
            jnp.stack([v1, v2]),
        ])
        return jnp.concatenate([pos, vel])

    def step(self, state: State, action: jnp.ndarray) -> State:
        qp, _ = self.sys.step(state.qp, action)
        obs = self._get_obs(qp)
        tip = self._tip(qp)
        x_rel = tip[0] - qp.pos[self.cart, 0]
        height = tip[2] - qp.pos[self.cart, 2]
        # mujoco IDP semantics (same 0.6+0.6 geometry): penalty target 2.0 is
        # ABOVE the 1.2 reachable tip height, so the penalty is monotone in
        # height and uniquely minimized at upright; done when the tip drops
        # below 1 m above the cart
        dist_penalty = 0.01 * jnp.square(x_rel) + jnp.square(height - 2.0)
        (_, ), (v, ) = self.sys.joints[0].angle_vel(qp)
        vel_penalty = 1e-3 * jnp.square(v[0]) + 5e-3 * jnp.square(v[1])
        reward = 10.0 - dist_penalty - vel_penalty
        done = jnp.where(height < 1.0, jnp.float32(1), jnp.float32(0))
        return state.replace(qp=qp, obs=obs, reward=reward, done=done,
                             metrics={**state.metrics, "distance": jnp.abs(x_rel)})
