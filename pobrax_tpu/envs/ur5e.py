"""ur5e env: 6-dof position-servo arm reaching a floating target.

Behavioral equivalent of the stock brax ur5e registered at
/root/reference/po_brax/envs/__init__.py:45. Observation (66) matches the
reference's mask tables: POSITION [0,6)+[10,34), TARGET_POS [6,10),
VELOCITY [34,58), CFRC [58,66).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pobrax_tpu.envs.base import Env, State
from pobrax_tpu.physics import manipulation
from pobrax_tpu.physics.state import Info, QP


class Ur5e(Env):
    def __init__(self, **kwargs):
        super().__init__(manipulation.ur5e_config())
        self.target = self.sys.body.index["Target"]
        self.wrist = self.sys.body.index["wrist_3"]
        # the 8 bodies whose positions/velocities enter the obs
        self._obs_bodies = jnp.asarray(
            [self.sys.body.index[n] for n in
             ("pedestal",) + manipulation.UR5E_LINKS + ("Target",)])

    def reset(self, rng: jnp.ndarray) -> State:
        rng, rng1, rng2, rng3 = jax.random.split(rng, 4)
        qpos = self.sys.default_angle() + jax.random.uniform(
            rng1, (self.sys.num_joint_dof,), minval=-0.1, maxval=0.1)
        qvel = jax.random.uniform(
            rng2, (self.sys.num_joint_dof,), minval=-0.005, maxval=0.005)
        qp = self.sys.default_qp(joint_angle=qpos, joint_velocity=qvel)
        qp = self._teleport_target(qp, rng3)
        info = self.sys.info(qp)
        obs = self._get_obs(qp, info)
        zero = jnp.float32(0)
        metrics = {"hits": zero}
        return State(qp, obs, zero, zero, metrics, {"rng": rng})

    def _teleport_target(self, qp: QP, rng: jnp.ndarray) -> QP:
        r1, r2, r3 = jax.random.split(rng, 3)
        theta = jax.random.uniform(r1, (), minval=0.0, maxval=2.0 * jnp.pi)
        radius = jax.random.uniform(r2, (), minval=0.3, maxval=0.7)
        z = jax.random.uniform(r3, (), minval=0.3, maxval=0.9)
        tpos = jnp.array([radius * jnp.cos(theta), radius * jnp.sin(theta), 0.0]
                         ).at[2].set(z)
        return qp.replace(pos=qp.pos.at[self.target].set(tpos))

    def _get_obs(self, qp: QP, info: Info) -> jnp.ndarray:
        (a,), (v,) = self.sys.joints[0].angle_vel(qp)
        to_target = qp.pos[self.target] - qp.pos[self.wrist]
        dist = jnp.linalg.norm(to_target)
        body_pos = qp.pos[self._obs_bodies].reshape(-1)  # 24
        link_ids = self._obs_bodies[1:7]
        body_vel = qp.vel[link_ids].reshape(-1)  # 18
        contact_mag = jnp.linalg.norm(
            jnp.clip(info.contact.vel, -1, 1), axis=-1)  # (nbody,) = 8
        return jnp.concatenate([
            a,  # [0,6) joint angles
            to_target, dist[None],  # [6,10) target block
            body_pos,  # [10,34)
            v, body_vel,  # [34,58)
            contact_mag,  # [58,66)
        ])

    def step(self, state: State, action: jnp.ndarray) -> State:
        # actions in [-1,1] command joint angles in [-pi, pi]
        target_angles = jnp.clip(action, -1.0, 1.0) * jnp.pi
        qp, info = self.sys.step(state.qp, target_angles)
        rng, rng1 = jax.random.split(state.info["rng"])
        dist = jnp.linalg.norm(qp.pos[self.target] - qp.pos[self.wrist])
        hit = jnp.where(dist < 0.1, jnp.float32(1), jnp.float32(0))
        # resample the target on a hit (stays put otherwise)
        moved = self._teleport_target(qp, rng1)
        qp = qp.replace(pos=jnp.where(hit > 0, moved.pos, qp.pos))
        obs = self._get_obs(qp, info)
        reward = -dist + 10.0 * hit
        metrics = {**state.metrics, "hits": state.metrics["hits"] + hit}
        return state.replace(qp=qp, obs=obs, reward=reward,
                             done=jnp.float32(0), metrics=metrics,
                             info={**state.info, "rng": rng})
