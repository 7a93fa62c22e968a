"""The stock Ant locomotion env (registry name 'ant').

Behavioral equivalent of the legacy `brax.envs.ant.Ant` registered by the
reference factory (/root/reference/po_brax/envs/__init__.py:30): reward
forward x-velocity + survival - control cost - contact cost; terminate
outside the torso-height band. Observation layout matches the mask tables at
/root/reference/po_brax/standard_observability_masks.py (ant: pos [0,13) =
z(1)+quat(4)+angles(8), vel [13,27), cfrc [27,87) for 10 bodies).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pobrax_tpu.envs.base import Env, State
from pobrax_tpu.physics import ant as ant_model
from pobrax_tpu.physics.state import Info, QP


class Ant(Env):
    def __init__(self, **kwargs):
        super().__init__(ant_model.ant_config())
        self.torso_idx = self.sys.body.index["$ Torso"]

    def reset(self, rng: jnp.ndarray) -> State:
        rng, rng1, rng2 = jax.random.split(rng, 3)
        qpos = self.sys.default_angle() + jax.random.uniform(
            rng1, (self.sys.num_joint_dof,), minval=-0.1, maxval=0.1)
        qvel = jax.random.uniform(rng2, (self.sys.num_joint_dof,), minval=-0.1, maxval=0.1)
        qp = self.sys.default_qp(joint_angle=qpos, joint_velocity=qvel)
        info = self.sys.info(qp)
        obs = self._get_obs(qp, info)
        reward, done = jnp.float32(0), jnp.float32(0)
        zero = jnp.float32(0)
        metrics = {
            "reward_ctrl_cost": zero,
            "reward_contact_cost": zero,
            "reward_forward": zero,
            "reward_survive": zero,
        }
        return State(qp, obs, reward, done, metrics, {"rng": rng})

    def step(self, state: State, action: jnp.ndarray) -> State:
        qp, info = self.sys.step(state.qp, action)
        obs = self._get_obs(qp, info)

        x_before = state.qp.pos[self.torso_idx, 0]
        x_after = qp.pos[self.torso_idx, 0]
        forward = (x_after - x_before) / self.sys.config.dt
        ctrl_cost = 0.5 * jnp.sum(jnp.square(action))
        contact_cost = 0.5 * 1e-3 * jnp.sum(jnp.square(jnp.clip(info.contact.vel, -1, 1)))
        survive = jnp.float32(1.0)
        reward = forward - ctrl_cost - contact_cost + survive

        z = qp.pos[self.torso_idx, 2]
        done = jnp.where(z < 0.2, jnp.float32(1), jnp.float32(0))
        done = jnp.where(z > 1.0, jnp.float32(1), done)
        # merge (not rebuild) so wrapper-added metrics keys survive the step
        metrics = {
            **state.metrics,
            "reward_ctrl_cost": ctrl_cost,
            "reward_contact_cost": contact_cost,
            "reward_forward": forward,
            "reward_survive": survive,
        }
        return state.replace(qp=qp, obs=obs, reward=reward, done=done, metrics=metrics)

    def _get_obs(self, qp: QP, info: Info) -> jnp.ndarray:
        """Torso z + orientation + joint angles; velocities; clipped cfrc."""
        (joint_angle,), (joint_vel,) = self.sys.joints[0].angle_vel(qp)
        qpos = [qp.pos[0, 2:], qp.rot[0], joint_angle]
        qvel = [qp.vel[0], qp.ang[0], joint_vel]
        cfrc = [
            jnp.clip(info.contact.vel, -1, 1).reshape(-1),
            jnp.clip(info.contact.ang, -1, 1).reshape(-1),
        ]
        return jnp.concatenate(qpos + qvel + cfrc)
