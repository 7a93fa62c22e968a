"""Env / State base API.

Mirrors the reference's `brax.envs.env` contract (SURVEY.md §2.9):
`State(qp, obs, reward, done, metrics, info)` and `Env` with
`reset(rng) -> State`, `step(State, action) -> State`,
`observation_size` / `action_size` / `sys` (consumed by the gym wrappers at
/root/reference/po_brax/envs/wrappers.py:148,154).

Envs are thin Python objects closing over a compiled `System`; `reset` and
`step` are pure pytree->pytree functions — jit/vmap/scan compose freely.
Metrics/info are plain dicts inside the State pytree; every env declares its
full metrics key set at reset so the State structure is invariant between
reset and step (a requirement for `lax.scan`-fused rollouts; the reference's
key-appearing-on-first-step quirks — SURVEY.md §3.3 — are structure-unstable
and documented per env where they were normalized).
"""

from __future__ import annotations

import abc
import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct

from pobrax_tpu.physics import config as pcfg
from pobrax_tpu.physics.state import QP
from pobrax_tpu.physics.system import System


@struct.dataclass
class State:
    qp: QP
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    metrics: Dict[str, jnp.ndarray]
    info: Dict[str, Any]


class Env(abc.ABC):
    """A physics-backed environment; subclasses build a Config in __init__."""

    def __init__(self, cfg: pcfg.Config):
        self._cfg = cfg
        self.sys = System(cfg)

    @abc.abstractmethod
    def reset(self, rng: jnp.ndarray) -> State:
        ...

    @abc.abstractmethod
    def step(self, state: State, action: jnp.ndarray) -> State:
        ...

    def rescale_time(self, action_repeat: int) -> None:
        """dt *= k, substeps *= k (ActionRepeatWrapper semantics,
        /root/reference/po_brax/envs/wrappers.py:22-23). Rebuilds the System
        since configs are immutable here."""
        self._cfg = self._cfg.scale_time(action_repeat)
        self.sys = System(self._cfg)

    def retune_substeps(self, substeps: int) -> None:
        """Opt-in integrator retune: same dt, fewer substeps (larger h_sub).

        The measured stability edge of the semi-implicit spring integrator
        on the ant bodies is h_sub = dt/8 = 0.00625 s (substeps 5/6/7 blow
        up, 8 matches production rollout stats — tools/substeps_probe.py);
        substeps=8 buys +18% fused-step throughput on TPU
        (tools/bench_substeps.py, docs/PERFORMANCE.md round 5). The DEFAULT
        stays 10: reference parity (tests/fixtures/ref_*.npz, golden
        fixtures) pins the substeps=10 trajectory. Call before wrapping —
        ActionRepeatWrapper's rescale_time then scales the retuned value."""
        if substeps < 1:
            raise ValueError(f"substeps must be >= 1, got {substeps}")
        if self.unwrapped is not self:
            # guard BEFORE mutating: assigning to self.sys on a Wrapper
            # raises (read-only property) and would otherwise leave a
            # stale shadow _cfg on the wrapper while physics runs the old
            # substeps
            raise TypeError(
                "retune_substeps must be called on the core env before "
                "wrapping (use env.unwrapped.retune_substeps(...) or "
                "create(..., substeps=N))")
        self._cfg = dataclasses.replace(self._cfg, substeps=substeps)
        self.sys = System(self._cfg)

    @property
    def observation_size(self) -> int:
        shape = jax.eval_shape(self.reset, jax.random.PRNGKey(0)).obs.shape
        return int(shape[-1])

    @property
    def action_size(self) -> int:
        return self.sys.action_size

    @property
    def unwrapped(self) -> "Env":
        return self


class Wrapper(Env):
    """Wraps an Env to delegate everything not overridden."""

    def __init__(self, env: Env):
        self.env = env

    def reset(self, rng: jnp.ndarray) -> State:
        return self.env.reset(rng)

    def step(self, state: State, action: jnp.ndarray) -> State:
        return self.env.step(state, action)

    @property
    def observation_size(self) -> int:
        return self.env.observation_size

    @property
    def action_size(self) -> int:
        return self.env.action_size

    @property
    def sys(self) -> System:
        return self.env.sys

    @property
    def unwrapped(self) -> Env:
        return self.env.unwrapped

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return getattr(self.env, name)
