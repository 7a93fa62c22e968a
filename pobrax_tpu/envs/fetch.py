"""Fetch env: a quadruped dog runs to a target ball; target resampled on
reach.

Behavioral equivalent of the stock brax fetch registered at
/root/reference/po_brax/envs/__init__.py:35. Observation (101) matches the
reference's mask tables: POSITION [0,6)+[10,49), TARGET_POS [6,10),
VELOCITY [49,88), CFRC [88,101).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pobrax_tpu.envs.base import Env, State
from pobrax_tpu.physics import quadruped
from pobrax_tpu.physics.state import Info, QP


class Fetch(Env):
    def __init__(self, target_distance: float = 15.0, **kwargs):
        super().__init__(quadruped.fetch_config())
        self.target_distance = target_distance
        self.torso = self.sys.body.index["torso"]
        self.target = self.sys.body.index["Target"]
        self._obs_bodies = jnp.asarray(
            [self.sys.body.index[n] for n in quadruped.BODY_ORDER])  # 13

    def reset(self, rng: jnp.ndarray) -> State:
        rng, rng1, rng2, rng3 = jax.random.split(rng, 4)
        qpos = self.sys.default_angle() + jax.random.uniform(
            rng1, (self.sys.num_joint_dof,), minval=-0.05, maxval=0.05)
        qvel = jax.random.uniform(
            rng2, (self.sys.num_joint_dof,), minval=-0.05, maxval=0.05)
        qp = self.sys.default_qp(joint_angle=qpos, joint_velocity=qvel)
        qp = self._teleport_target(qp, rng3)
        info = self.sys.info(qp)
        obs = self._get_obs(qp, info)
        zero = jnp.float32(0)
        metrics = {"hits": zero}
        return State(qp, obs, zero, zero, metrics, {"rng": rng})

    def _teleport_target(self, qp: QP, rng: jnp.ndarray) -> QP:
        r1, r2 = jax.random.split(rng)
        theta = jax.random.uniform(r1, (), minval=0.0, maxval=2.0 * jnp.pi)
        radius = jax.random.uniform(
            r2, (), minval=0.5 * self.target_distance, maxval=self.target_distance)
        tpos = jnp.array([0.0, 0.0, 0.2]).at[0].set(radius * jnp.cos(theta)) \
            .at[1].set(radius * jnp.sin(theta))
        return qp.replace(pos=qp.pos.at[self.target].set(tpos))

    def _get_obs(self, qp: QP, info: Info) -> jnp.ndarray:
        to_target = qp.pos[self.target] - qp.pos[self.torso]
        dist = jnp.linalg.norm(to_target[:2])
        body_pos = qp.pos[self._obs_bodies].reshape(-1)  # 39
        body_vel = qp.vel[self._obs_bodies].reshape(-1)  # 39
        contact_mag = jnp.linalg.norm(
            jnp.clip(info.contact.vel, -1, 1), axis=-1)[:13]  # 13 dynamic bodies
        return jnp.concatenate([
            qp.pos[self.torso, 2:], qp.rot[self.torso], dist[None],  # [0,6)
            to_target, jnp.arctan2(to_target[1], to_target[0])[None],  # [6,10)
            body_pos,  # [10,49)
            body_vel,  # [49,88)
            contact_mag,  # [88,101)
        ])

    def step(self, state: State, action: jnp.ndarray) -> State:
        qp, info = self.sys.step(state.qp, action)
        rng, rng1 = jax.random.split(state.info["rng"])
        d_before = jnp.linalg.norm(
            (state.qp.pos[self.target] - state.qp.pos[self.torso])[:2])
        d_after = jnp.linalg.norm((qp.pos[self.target] - qp.pos[self.torso])[:2])
        progress = (d_before - d_after) / self.sys.config.dt
        hit = jnp.where(d_after < 0.5, jnp.float32(1), jnp.float32(0))
        moved = self._teleport_target(qp, rng1)
        qp = qp.replace(pos=jnp.where(hit > 0, moved.pos, qp.pos))
        obs = self._get_obs(qp, info)
        ctrl = 0.01 * jnp.sum(jnp.square(jnp.clip(action, -1, 1)))
        reward = progress + 25.0 * hit - ctrl
        z = qp.pos[self.torso, 2]
        done = jnp.where((z < 0.1) | (z > 1.2), jnp.float32(1), jnp.float32(0))
        metrics = {**state.metrics, "hits": state.metrics["hits"] + hit}
        return state.replace(qp=qp, obs=obs, reward=reward, done=done,
                             metrics=metrics, info={**state.info, "rng": rng})
