"""Semi-implicit Euler integration with substeps.

Update order per substep (velocity first, then position — symplectic):
  1. potential: vel += (gravity + force-accels) * h, with exponential damping
  2. kinetic:   pos += vel * h; rot integrated by quaternion derivative
  3. collide:   vel += contact impulses (velocity-level, no dt)

Per-axis frozen masks (from `Bodies.active_pos` / `active_rot`) gate every
component update, so fully frozen targets/walls are bit-stable across steps
(the property the reference envs rely on for teleported targets, e.g.
ant_tag.py:116-117) and planar models (y-translation + x/z-rotation frozen)
stay exactly in-plane.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pobrax_tpu.ops import quaternion as quat
from pobrax_tpu.physics.bodies import Bodies
from pobrax_tpu.physics.state import P, QP


class Integrator:
    def __init__(self, *, dt: float, substeps: int, gravity, velocity_damping: float, angular_damping: float):
        self.h = float(dt) / int(substeps)
        self.substeps = int(substeps)
        self.gravity = np.asarray(gravity, np.float32)
        # exponential damping factors e^(c*h); c <= 0 damps
        self.vel_damp = float(np.exp(velocity_damping * self.h))
        self.ang_damp = float(np.exp(angular_damping * self.h))

    def potential(self, qp: QP, dp: P, bodies: Bodies) -> QP:
        mpos = jnp.asarray(bodies.active_pos)
        mrot = jnp.asarray(bodies.active_rot)
        vel = self.vel_damp * qp.vel + (self.gravity + dp.vel) * self.h
        ang = self.ang_damp * qp.ang + dp.ang * self.h
        return qp.replace(
            vel=jnp.where(mpos > 0, vel, qp.vel),
            ang=jnp.where(mrot > 0, ang, qp.ang),
        )

    def kinetic(self, qp: QP, bodies: Bodies) -> QP:
        mpos = jnp.asarray(bodies.active_pos)
        rot_free = jnp.asarray(np.any(bodies.active_rot > 0, axis=-1, keepdims=True))
        pos = qp.pos + qp.vel * self.h
        drot = 0.5 * self.h * quat.quat_mul(quat.ang_to_quat(qp.ang), qp.rot)
        rot = qp.rot + drot
        rot = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
        return qp.replace(
            pos=jnp.where(mpos > 0, pos, qp.pos),
            rot=jnp.where(rot_free, rot, qp.rot),
        )

    def collide(self, qp: QP, dp: P, bodies: Bodies) -> QP:
        mpos = jnp.asarray(bodies.active_pos)
        mrot = jnp.asarray(bodies.active_rot)
        return qp.replace(
            vel=jnp.where(mpos > 0, qp.vel + dp.vel, qp.vel),
            ang=jnp.where(mrot > 0, qp.ang + dp.ang, qp.ang),
        )
