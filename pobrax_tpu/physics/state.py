"""Dynamic physics state pytrees.

`QP` mirrors the reference's dynamic-state contract (`brax.QP`:
pos/rot/vel/ang per body, immutable with `.replace()` updates — see
/root/reference/Notes/brax_basics.md:17-22 and usage at ant_tag.py:80).
`P` is a force/impulse increment; `Info` carries per-body contact/joint/
actuator aggregates (`info.contact.vel/.ang` consumed in observations, e.g.
ant_tag.py:174-177).

All leaves are `(..., nbody, k)` so batching is a leading-axis concern only.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class QP:
    pos: jnp.ndarray  # (..., nbody, 3)
    rot: jnp.ndarray  # (..., nbody, 4) unit quaternion (w, x, y, z)
    vel: jnp.ndarray  # (..., nbody, 3)
    ang: jnp.ndarray  # (..., nbody, 3) world-frame angular velocity

    @classmethod
    def zero(cls, nbody: int, dtype=jnp.float32) -> "QP":
        rot = jnp.zeros((nbody, 4), dtype).at[:, 0].set(1.0)
        return cls(
            pos=jnp.zeros((nbody, 3), dtype),
            rot=rot,
            vel=jnp.zeros((nbody, 3), dtype),
            ang=jnp.zeros((nbody, 3), dtype),
        )


@struct.dataclass
class P:
    """A per-body (velocity, angular-velocity) increment — force or impulse."""

    vel: jnp.ndarray  # (..., nbody, 3)
    ang: jnp.ndarray  # (..., nbody, 3)

    def __add__(self, other: "P") -> "P":
        return P(vel=self.vel + other.vel, ang=self.ang + other.ang)

    @classmethod
    def zero(cls, nbody: int, dtype=jnp.float32) -> "P":
        return cls(vel=jnp.zeros((nbody, 3), dtype), ang=jnp.zeros((nbody, 3), dtype))


@struct.dataclass
class Info:
    """Aggregated per-body dynamics diagnostics over one env step."""

    contact: P
    joint: P
    actuator: P

    @classmethod
    def zero(cls, nbody: int, dtype=jnp.float32) -> "Info":
        return cls(contact=P.zero(nbody, dtype), joint=P.zero(nbody, dtype), actuator=P.zero(nbody, dtype))
