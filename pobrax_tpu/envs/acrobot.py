"""Acrobot: 2-link underactuated swing-up.

The reference's mask tables include an 'acrobot' entry
(/root/reference/po_brax/standard_observability_masks.py:6,23) with no env
behind it anywhere (brax v0 never shipped one). This env backs the entry:
a fixed-base 2-link pendulum actuated only at the elbow, obs layout matching
the table — POSITION [0,2) = joint angles, VELOCITY [2,4) = joint
velocities. Reward: negative distance of the tip below the swing-up height
(classic swing-up shaping); done when the tip passes above the top height.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pobrax_tpu.envs.base import Env, State
from pobrax_tpu.ops import quaternion as quat
from pobrax_tpu.physics import config as c
from pobrax_tpu.physics.state import QP

_HINGE_Y = (0.0, 0.0, 90.0)
_LINK_LEN = 1.0


def acrobot_config() -> c.Config:
    def link(name):
        return c.Body(
            name=name,
            colliders=(c.Collider(geom=c.Capsule(radius=0.05, length=_LINK_LEN)),),
            mass=1.0,
            frozen_position=(0.0, 1.0, 0.0),
            frozen_rotation=(1.0, 0.0, 1.0),
        )

    def hinge(name, parent, child, p_off):
        return c.Joint(
            name=name, parent=parent, child=child,
            stiffness=4000.0, spring_damping=126.0, angular_damping=0.5,
            parent_offset=p_off, child_offset=(0.0, 0.0, 0.5 * _LINK_LEN),
            rotation=_HINGE_Y,
            angle_limits=(c.AngleLimit(-360.0, 360.0),),
            limit_strength=0.0,
        )

    return c.Config(
        bodies=(c.Body(name="base", frozen=True), link("link1"), link("link2")),
        joints=(
            hinge("shoulder", "base", "link1", (0.0, 0.0, 0.0)),
            hinge("elbow", "link1", "link2", (0.0, 0.0, -0.5 * _LINK_LEN)),
        ),
        # underactuated: torque only at the elbow
        actuators=(c.Actuator(name="elbow", joint="elbow", strength=30.0),),
        default_qps=(c.DefaultQP(name="base", pos=(0.0, 0.0, 2.5)),),
        gravity=(0.0, 0.0, -9.8),
        dt=0.04, substeps=12,
    )


class Acrobot(Env):
    def __init__(self, **kwargs):
        super().__init__(acrobot_config())
        self.link2 = self.sys.body.index["link2"]
        self.base = self.sys.body.index["base"]

    def reset(self, rng: jnp.ndarray) -> State:
        rng, rng1, rng2 = jax.random.split(rng, 3)
        # hanging down IS the zero pose (child_offset +0.5L puts link centers
        # below their anchors at angle 0) — classic acrobot starts hanging
        # with small jitter; pi would be the inverted/goal configuration
        qpos = jax.random.uniform(rng1, (2,), minval=-0.1, maxval=0.1)
        qvel = jax.random.uniform(rng2, (2,), minval=-0.1, maxval=0.1)
        qp = self.sys.default_qp(joint_angle=qpos, joint_velocity=qvel)
        obs = self._get_obs(qp)
        zero = jnp.float32(0)
        return State(qp, obs, zero, zero, {"tip_height": zero}, {"rng": rng})

    def _tip(self, qp: QP) -> jnp.ndarray:
        return qp.pos[self.link2] + quat.rotate(
            jnp.array([0.0, 0.0, -0.5 * _LINK_LEN]), qp.rot[self.link2])

    def _get_obs(self, qp: QP) -> jnp.ndarray:
        (a,), (v,) = self.sys.joints[0].angle_vel(qp)
        return jnp.concatenate([a, v])  # POSITION [0,2), VELOCITY [2,4)

    def step(self, state: State, action: jnp.ndarray) -> State:
        qp, _ = self.sys.step(state.qp, action)
        obs = self._get_obs(qp)
        tip_h = self._tip(qp)[2] - qp.pos[self.base, 2]  # in [-2, 2]
        reward = tip_h - 1.0  # height shaping on top of the classic -1/step
        done = jnp.where(tip_h > 1.8, jnp.float32(1), jnp.float32(0))
        return state.replace(qp=qp, obs=obs, reward=reward, done=done,
                             metrics={**state.metrics, "tip_height": tip_h})
