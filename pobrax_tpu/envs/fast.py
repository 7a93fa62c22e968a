"""The 'fast' debug env: trivial dynamics for wrapper/training plumbing tests.

Behavioral equivalent of the stock brax debug env registered at
/root/reference/po_brax/envs/__init__.py:34 — no contacts, no joints; the
single body drifts forward under a velocity command. Used to smoke-test
wrapper stacks and learners at near-zero physics cost.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pobrax_tpu.envs.base import Env, State
from pobrax_tpu.physics import config as c
from pobrax_tpu.physics.state import QP


class Fast(Env):
    def __init__(self, **kwargs):
        super().__init__(c.Config(
            bodies=(c.Body(name="body"),),
            dt=0.02, substeps=1,
        ))
        self._reset_count = 0

    def reset(self, rng: jnp.ndarray) -> State:
        qp = QP.zero(1)
        obs = jnp.zeros(2)
        zero = jnp.float32(0)
        return State(qp, obs, zero, zero, {}, {"rng": rng})

    def step(self, state: State, action: jnp.ndarray) -> State:
        dvx = jnp.where(action[0] > 0.0, self.sys.config.dt, -self.sys.config.dt)
        vel = state.qp.vel.at[0, 0].add(dvx)
        pos = state.qp.pos + vel * self.sys.config.dt
        qp = state.qp.replace(pos=pos, vel=vel)
        obs = jnp.stack([pos[0, 0], vel[0, 0]])
        reward = pos[0, 0]
        return state.replace(qp=qp, obs=obs, reward=reward, done=jnp.float32(0))

    @property
    def observation_size(self) -> int:
        return 2

    @property
    def action_size(self) -> int:
        return 1
