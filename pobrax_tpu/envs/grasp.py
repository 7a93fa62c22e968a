"""Grasp env: a flying 4-finger claw picks up a ball and carries it to a
floating target; target resampled on delivery.

Behavioral equivalent of the stock brax grasp registered at
/root/reference/po_brax/envs/__init__.py:36. Observation (132) matches the
reference's mask tables: OBJECT_POS [0,4), TARGET_POS [4,8),
POSITION [8,56), VELOCITY [56,104)+[107,110), HEADINGS [104,107)+[110,116),
CFRC [116,132).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pobrax_tpu.envs.base import Env, State
from pobrax_tpu.physics import manipulation
from pobrax_tpu.physics.state import Info, QP


class Grasp(Env):
    def __init__(self, **kwargs):
        super().__init__(manipulation.grasp_config())
        self.palm = self.sys.body.index["palm"]
        self.obj = self.sys.body.index["Object"]
        self.target = self.sys.body.index["Target"]
        # palm + 12 finger segments + Object + Target + Ground = 16 bodies
        # (Ground pads the block to the mask table's 48-wide POSITION span)
        self._obs_bodies = jnp.asarray(
            [self.sys.body.index[n] for n in manipulation.GRASP_BODY_ORDER]
            + [self.sys.body.index["Ground"]])

    def reset(self, rng: jnp.ndarray) -> State:
        rng, rng1, rng2 = jax.random.split(rng, 3)
        qpos = self.sys.default_angle() + jax.random.uniform(
            rng1, (self.sys.num_joint_dof,), minval=-0.05, maxval=0.05)
        qp = self.sys.default_qp(joint_angle=qpos)
        qp = self._teleport_target(qp, rng2)
        info = self.sys.info(qp)
        obs = self._get_obs(qp, info)
        zero = jnp.float32(0)
        metrics = {"hits": zero}
        return State(qp, obs, zero, zero, metrics, {"rng": rng})

    def _teleport_target(self, qp: QP, rng: jnp.ndarray) -> QP:
        r1, r2 = jax.random.split(rng)
        theta = jax.random.uniform(r1, (), minval=0.0, maxval=2.0 * jnp.pi)
        radius = jax.random.uniform(r2, (), minval=0.4, maxval=0.8)
        tpos = jnp.array([0.0, 0.0, 0.8]).at[0].set(radius * jnp.cos(theta)) \
            .at[1].set(radius * jnp.sin(theta))
        return qp.replace(pos=qp.pos.at[self.target].set(tpos))

    def _get_obs(self, qp: QP, info: Info) -> jnp.ndarray:
        n16 = self._obs_bodies  # 16 bodies: hand(13) + Object + Target
        obj_pos, tgt_pos = qp.pos[self.obj], qp.pos[self.target]
        palm_to_obj = obj_pos - qp.pos[self.palm]
        obj_to_tgt = tgt_pos - obj_pos
        body_pos = qp.pos[n16].reshape(-1)  # 48
        body_vel = qp.vel[n16].reshape(-1)  # 48
        contact_mag = jnp.linalg.norm(
            jnp.clip(info.contact.vel, -1, 1), axis=-1)[:16]  # 16
        return jnp.concatenate([
            obj_pos, jnp.linalg.norm(palm_to_obj)[None],  # [0,4) object block
            tgt_pos, jnp.linalg.norm(obj_to_tgt)[None],  # [4,8) target block
            body_pos,  # [8,56)
            body_vel,  # [56,104)
            palm_to_obj,  # [104,107) heading: palm -> object
            qp.vel[self.obj],  # [107,110) object velocity
            obj_to_tgt, qp.ang[self.obj],  # [110,116) heading: object -> target
            contact_mag,  # [116,132)
        ])

    def step(self, state: State, action: jnp.ndarray) -> State:
        # finger servos take [-1,1] -> their limit range; thrusters raw
        n_joint = self.sys.num_joint_dof
        g = self.sys.joints[0]
        limits = jnp.asarray(g.limit)  # (12, 1, 2)
        lo, hi = limits[:, 0, 0], limits[:, 0, 1]
        servo = lo + (jnp.clip(action[:n_joint], -1.0, 1.0) * 0.5 + 0.5) * (hi - lo)
        act = jnp.concatenate([servo, action[n_joint:]])
        qp, info = self.sys.step(state.qp, act)
        rng, rng1 = jax.random.split(state.info["rng"])
        obj_to_tgt = jnp.linalg.norm(qp.pos[self.target] - qp.pos[self.obj])
        palm_to_obj = jnp.linalg.norm(qp.pos[self.obj] - qp.pos[self.palm])
        hit = jnp.where(obj_to_tgt < 0.15, jnp.float32(1), jnp.float32(0))
        moved = self._teleport_target(qp, rng1)
        qp = qp.replace(pos=jnp.where(hit > 0, moved.pos, qp.pos))
        obs = self._get_obs(qp, info)
        reward = -0.5 * palm_to_obj - obj_to_tgt + 20.0 * hit
        metrics = {**state.metrics, "hits": state.metrics["hits"] + hit}
        return state.replace(qp=qp, obs=obs, reward=reward,
                             done=jnp.float32(0), metrics=metrics,
                             info={**state.info, "rng": rng})
