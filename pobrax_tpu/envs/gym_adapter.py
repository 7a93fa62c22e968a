"""Gymnasium adapters: batched VectorEnv facade + host-side autoreset + eval
statistics.

Re-expression of the reference's gym layer
(/root/reference/po_brax/envs/wrappers.py:126-262) on gymnasium (classic gym
is not in this environment; step returns the 5-tuple
(obs, reward, terminated, truncated, info)). The adapter owns the PRNG key
and the jit boundaries, exactly like the reference's VmapGymWrapper
(:160-172); `backend` selects a device ('cpu'/'tpu') for those jitted
functions.

The native, fully-fused path (scan + on-device autoreset) lives in
`pobrax_tpu.envs.wrappers` / `pobrax_tpu.training`; these adapters exist for
host training-loop compatibility and incur one device->host sync per step on
the done check (:248), as in the reference.
"""

from __future__ import annotations

from typing import Optional

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np
from gymnasium import spaces
from gymnasium.vector import VectorEnv

from pobrax_tpu.envs.base import Env
from pobrax_tpu.envs.wrappers import where_done


def _resolve_device(backend: Optional[str]):
    if backend is None:
        return None
    return jax.devices(backend)[0]


class VmapGymWrapper(VectorEnv):
    """Batched Env -> gymnasium VectorEnv (reference :126-172)."""

    metadata = {"render_modes": []}

    def __init__(self, env: Env, batch_size: int, seed: int = 0,
                 backend: Optional[str] = None):
        self._env = env
        self.num_envs = batch_size
        self.seed(seed)
        self.backend = backend
        self._device = _resolve_device(backend)
        self._state = None

        obs_high = np.inf * np.ones(self._env.observation_size, dtype="float32")
        self.single_observation_space = spaces.Box(-obs_high, obs_high, dtype="float32")
        self.observation_space = gym.vector.utils.batch_space(
            self.single_observation_space, self.num_envs)
        action_high = np.ones(self._env.action_size, dtype="float32")
        self.single_action_space = spaces.Box(-action_high, action_high, dtype="float32")
        self.action_space = gym.vector.utils.batch_space(
            self.single_action_space, self.num_envs)

        def reset(key):
            keys = jax.random.split(key, self.num_envs + 1)
            key1, keys = keys[0], keys[1:]
            state = self._env.reset(keys)
            return state, state.obs, key1

        self._reset = jax.jit(reset)

        def step(state, action):
            state = self._env.step(state, action)
            return state, state.obs, state.reward, state.done, state.metrics

        self._step = jax.jit(step)

    def seed(self, seed: int = 0):
        self._key = jax.random.PRNGKey(seed)

    def reset(self, *, seed: Optional[int] = None, options=None):
        if seed is not None:
            self.seed(seed)
        with jax.default_device(self._device) if self._device else _null():
            self._state, obs, self._key = self._reset(self._key)
        return obs, {}

    def step(self, action):
        with jax.default_device(self._device) if self._device else _null():
            self._state, obs, reward, done, metrics = self._step(self._state, action)
        truncation = self._state.info.get("truncation", jnp.zeros_like(done))
        terminated = jnp.logical_and(done > 0, truncation == 0)
        return obs, reward, terminated, truncation > 0, {"metrics": metrics}


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class AutoresetVmapGymWrapper(VmapGymWrapper):
    """Host-side autoreset: on any done, reset all and merge per-env with
    where_done, zeroing info['steps'] (reference :240-262). One
    device->host sync per step on the done check (:248)."""

    def step(self, action):
        obs, reward, terminated, truncated, info = super().step(action)
        done = jnp.logical_or(terminated, truncated)
        if bool(done.any()):
            new_state, new_obs, self._key = self._reset(self._key)
            donef = done.astype(new_obs.dtype)
            qp = jax.tree.map(
                lambda x, y: where_done(donef, x, y), new_state.qp, self._state.qp)
            obs = where_done(donef, new_obs, obs)
            state_info = dict(self._state.info)
            if "steps" in state_info:
                state_info["steps"] = jnp.where(
                    done, jnp.zeros_like(state_info["steps"]), state_info["steps"])
            self._state = self._state.replace(qp=qp, obs=obs, info=state_info)
        return obs, reward, terminated, truncated, info


class AutoresetGymWrapper(gym.Env):
    """Unbatched Env -> gymnasium Env with host-side `if done: reset`
    (reference :232-237)."""

    metadata = {"render_modes": []}

    def __init__(self, env: Env, seed: int = 0, backend: Optional[str] = None):
        self._env = env
        self.backend = backend
        self._device = _resolve_device(backend)
        self.seed(seed)
        self._state = None

        obs_high = np.inf * np.ones(self._env.observation_size, dtype="float32")
        self.observation_space = spaces.Box(-obs_high, obs_high, dtype="float32")
        action_high = np.ones(self._env.action_size, dtype="float32")
        self.action_space = spaces.Box(-action_high, action_high, dtype="float32")

        def reset(key):
            key1, key2 = jax.random.split(key)
            state = self._env.reset(key2)
            return state, state.obs, key1

        self._reset = jax.jit(reset)

        def step(state, action):
            state = self._env.step(state, action)
            return state, state.obs, state.reward, state.done, state.metrics

        self._step = jax.jit(step)

    def seed(self, seed: int = 0):
        self._key = jax.random.PRNGKey(seed)

    def reset(self, *, seed: Optional[int] = None, options=None):
        if seed is not None:
            self.seed(seed)
        self._state, obs, self._key = self._reset(self._key)
        return obs, {}

    def step(self, action):
        self._state, obs, reward, done, metrics = self._step(self._state, action)
        truncation = self._state.info.get("truncation", jnp.zeros_like(done))
        terminated = bool(done) and not bool(truncation)
        if bool(done):
            self._state, obs, self._key = self._reset(self._key)
        return obs, reward, terminated, bool(truncation), {"metrics": metrics}


class EvalGymWrapper:
    """On-device episode statistics with host-side completed-episode queues
    and nan-mean summaries (reference :175-229).

    Duck-typed (not gymnasium.Wrapper): it must wrap both `gym.Env` and
    `gym.vector.VectorEnv`, which share no base class in gymnasium 1.x."""

    def __init__(self, env, discount: float = 1.0, queue_cap: int = 100_000):
        self.env = env
        self._discount = discount
        self.num_envs = getattr(env, "num_envs", 1)
        # completed-episode queues keep only the most recent `queue_cap`
        # entries — the reference's grow without bound (wrappers.py:209-219),
        # which leaks in long evaluations
        self._queue_cap = queue_cap

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return getattr(self.env, name)

    def reset(self, **kwargs):
        obs, info = self.env.reset(**kwargs)
        like = jnp.atleast_1d(jnp.asarray(obs)[..., -1])
        self.episode_returns = jnp.zeros_like(like)
        self.discounted_episode_returns = jnp.zeros_like(like)
        self.episode_lengths = jnp.zeros_like(like).astype(int)
        self.current_discount = jnp.ones_like(like)
        self.r_q, self.dr_q, self.l_q = [jnp.nan], [jnp.nan], [jnp.nan]
        return obs, info

    def step(self, action):
        obs, r, terminated, truncated, info = self.env.step(action)
        d = jnp.atleast_1d(jnp.logical_or(terminated, truncated))
        r = jnp.atleast_1d(r)
        self.episode_returns = self.episode_returns + r
        self.episode_lengths = self.episode_lengths + 1
        self.discounted_episode_returns = (
            self.discounted_episode_returns + r * self.current_discount)
        self.current_discount = self.current_discount * self._discount
        if bool(d.any()):
            d_idx = np.asarray(d).nonzero()
            self.r_q.extend(np.asarray(self.episode_returns)[d_idx])
            self.dr_q.extend(np.asarray(self.discounted_episode_returns)[d_idx])
            self.l_q.extend(np.asarray(self.episode_lengths)[d_idx])
            self.episode_returns = self.episode_returns.at[d_idx].set(0)
            self.discounted_episode_returns = self.discounted_episode_returns.at[d_idx].set(0)
            self.episode_lengths = self.episode_lengths.at[d_idx].set(0)
            self.current_discount = self.current_discount.at[d_idx].set(1)
            if len(self.r_q) > self._queue_cap:
                self.r_q = self.r_q[-self._queue_cap:]
                self.dr_q = self.dr_q[-self._queue_cap:]
                self.l_q = self.l_q[-self._queue_cap:]
        return obs, r, terminated, truncated, info

    def get_stats(self):
        return {
            "charts/mean_episodic_return": float(np.nanmean(np.asarray(self.r_q, np.float64))),
            "charts/mean_discounted_episodic_return": float(
                np.nanmean(np.asarray(self.dr_q, np.float64))),
            "charts/mean_episodic_length": float(np.nanmean(np.asarray(self.l_q, np.float64))),
        }
