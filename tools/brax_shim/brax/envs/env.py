"""brax.envs.env compatibility: Env / State / Wrapper.

The reference env classes subclass `env.Env` without calling
super().__init__ (they build `self.sys` themselves —
/root/reference/po_brax/envs/ant_tag.py:54-55) and construct
`env.State(qp, obs, reward, done, metrics, info)` positionally (:88).
State is our own pytree dataclass — same field order, same semantics.
"""

from __future__ import annotations

import abc

import jax

from pobrax_tpu.envs.base import State  # noqa: F401  (re-export)


class Env(abc.ABC):
    """API mirror of legacy brax.envs.env.Env."""

    def __init__(self, config=None):
        if config is not None:
            from brax import System
            self.sys = System(config)

    @abc.abstractmethod
    def reset(self, rng) -> State:
        ...

    @abc.abstractmethod
    def step(self, state: State, action) -> State:
        ...

    @property
    def observation_size(self) -> int:
        shape = jax.eval_shape(self.reset, jax.random.PRNGKey(0)).obs.shape
        return int(shape[-1])

    @property
    def action_size(self) -> int:
        return self.sys.num_joint_dof

    @property
    def unwrapped(self) -> "Env":
        return self


class Wrapper(Env):
    """Delegating wrapper (legacy brax.envs.env.Wrapper)."""

    def __init__(self, env: Env):
        self.env = env

    def reset(self, rng) -> State:
        return self.env.reset(rng)

    def step(self, state: State, action) -> State:
        return self.env.step(state, action)

    @property
    def observation_size(self) -> int:
        return self.env.observation_size

    @property
    def action_size(self) -> int:
        return self.env.action_size

    @property
    def unwrapped(self) -> Env:
        return self.env.unwrapped

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return getattr(self.env, name)
