"""Batched rigid-body spring-physics engine (legacy-Brax dynamics contract).

Layers:
  * `config`     — frozen-dataclass scene description (build-time)
  * `ant`        — the ant model as data
  * `scene`      — procedural arena / T-maze / wall builders
  * `system`     — compiled System: default_qp FK, step(qp, act), info(qp)
  * `state`      — QP / P / Info pytrees
  * `geometry`   — static-broadphase contacts + impulse resolution
  * `joints`     — revolute spring joints, angle_vel readout, actuators
  * `integrator` — substepped semi-implicit Euler
"""

from pobrax_tpu.physics import ant, config, scene
from pobrax_tpu.physics.state import QP, Info, P
from pobrax_tpu.physics.system import System

__all__ = ["ant", "config", "scene", "System", "QP", "P", "Info"]
