"""Semi-implicit Euler integration with substeps.

Update order per substep (velocity first, then position — symplectic):
  1. potential: vel += (gravity + force-accels) * h, with exponential damping
  2. kinetic:   pos += vel * h; rot integrated by quaternion derivative
  3. collide:   vel += contact impulses (velocity-level, no dt)

Frozen bodies (mask from `Bodies.active`) receive no updates of any kind, so
frozen targets/walls are bit-stable across steps — the property the reference
envs rely on for teleported targets (e.g. ant_tag.py:116-117).
"""

from __future__ import annotations

import jax.numpy as jnp

from pobrax_tpu.ops import quaternion as quat
from pobrax_tpu.physics.bodies import Bodies
from pobrax_tpu.physics.state import P, QP


class Integrator:
    def __init__(self, *, dt: float, substeps: int, gravity, velocity_damping: float, angular_damping: float):
        self.h = float(dt) / int(substeps)
        self.substeps = int(substeps)
        import numpy as np

        self.gravity = np.asarray(gravity, np.float32)
        # exponential damping factors e^(c*h); c <= 0 damps
        self.vel_damp = float(np.exp(velocity_damping * self.h))
        self.ang_damp = float(np.exp(angular_damping * self.h))

    def potential(self, qp: QP, dp: P, bodies: Bodies) -> QP:
        active = jnp.asarray(bodies.active)
        vel = self.vel_damp * qp.vel + (self.gravity + dp.vel) * self.h
        ang = self.ang_damp * qp.ang + dp.ang * self.h
        return qp.replace(
            vel=jnp.where(active > 0, vel, qp.vel),
            ang=jnp.where(active > 0, ang, qp.ang),
        )

    def kinetic(self, qp: QP, bodies: Bodies) -> QP:
        active = jnp.asarray(bodies.active)
        pos = qp.pos + qp.vel * self.h
        drot = 0.5 * self.h * quat.quat_mul(quat.ang_to_quat(qp.ang), qp.rot)
        rot = qp.rot + drot
        rot = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
        return qp.replace(
            pos=jnp.where(active > 0, pos, qp.pos),
            rot=jnp.where(active > 0, rot, qp.rot),
        )

    def collide(self, qp: QP, dp: P, bodies: Bodies) -> QP:
        active = jnp.asarray(bodies.active)
        return qp.replace(
            vel=jnp.where(active > 0, qp.vel + dp.vel, qp.vel),
            ang=jnp.where(active > 0, qp.ang + dp.ang, qp.ang),
        )
