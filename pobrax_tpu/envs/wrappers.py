"""Vectorization, episode-control, autoreset, and eval wrappers.

Functional re-expression of the reference wrapper suite
(/root/reference/po_brax/envs/wrappers.py + the stock wrappers it reuses).
Every wrapper keeps reset/step as pure pytree functions, so any stack of
them jits/vmaps/scans as one fused XLA program — the design goal the
reference reached only on its "pure-brax path" (SURVEY.md §3.4).

Autoreset semantics (exact, per wrapper):
  * AutoResetWrapper        — cached: restores the episode-initial qp/obs on
                              done (no resampling).
  * RandomizedAutoResetWrapperNaive — resample fresh initial states every
                              step, select per-env with where_done
                              (wrappers.py:30-52); fully jit/vmap-safe.
  * RandomizedAutoResetWrapperOnTerminal — same but resamples only when any
                              env is done, via lax.cond (wrappers.py:55-80).
  * RandomizedAutoResetWrapperCached — refreshes the cached reset state from
                              a fresh env.reset every
                              `n_steps_between_updates` host steps
                              (wrappers.py:83-123). The refresh counter is
                              host-side Python state, so (as in the
                              reference) `step` must not be jitted as a
                              whole for the refresh to fire.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from pobrax_tpu.envs.base import Env, State, Wrapper


def randomized_autoreset(env: Env, mode: str) -> "Wrapper":
    """Validated dispatch for the autoreset_mode knob: 'naive' (per-step
    resample, reference parity) or 'cached' (on-device cached refresh).
    Raises on anything else so a typo ('Cached') can never silently run a
    benchmark or training job in the wrong mode."""
    if mode == "cached":
        return RandomizedAutoResetWrapperCachedOnDevice(env)
    if mode == "naive":
        return RandomizedAutoResetWrapperNaive(env)
    raise ValueError(
        f"autoreset_mode must be 'naive' or 'cached', got {mode!r}")


def where_done(done: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Per-env select: x where done else y (reference wrappers.py:44-48)."""
    if done.shape:
        done = jnp.reshape(done, [x.shape[0]] + [1] * (len(x.shape) - 1))
    return jnp.where(done, x, y)


class ActionRepeatWrapper(Wrapper):
    """Scales the integrator: dt *= k, substeps *= k — wall-clock per action
    grows at constant integrator step (reference wrappers.py:16-24)."""

    def __init__(self, env: Env, action_repeat: int):
        super().__init__(env)
        if action_repeat != 1 and hasattr(self.unwrapped, "rescale_time"):
            self.unwrapped.rescale_time(action_repeat)
        self.action_repeat = action_repeat


class EpisodeWrapper(Wrapper):
    """Step-budget termination; tracks info['steps'] / info['truncation']."""

    def __init__(self, env: Env, episode_length: int, action_repeat: int = 1):
        super().__init__(env)
        self.episode_length = episode_length
        self.action_repeat = action_repeat

    def reset(self, rng: jnp.ndarray) -> State:
        state = self.env.reset(rng)
        info = {**state.info,
                "steps": jnp.zeros_like(state.reward),
                "truncation": jnp.zeros_like(state.reward)}
        return state.replace(info=info)

    def step(self, state: State, action: jnp.ndarray) -> State:
        def f(state, _):
            nstate = self.env.step(state, action)
            return nstate, nstate.reward

        state, rewards = jax.lax.scan(f, state, None, length=self.action_repeat)
        state = state.replace(reward=jnp.sum(rewards, axis=0))
        steps = state.info["steps"] + self.action_repeat
        one = jnp.ones_like(state.done)
        zero = jnp.zeros_like(state.done)
        episode_done = steps >= self.episode_length
        done = jnp.where(episode_done, one, state.done)
        truncation = jnp.where(episode_done, 1 - state.done, zero)
        info = {**state.info, "steps": steps, "truncation": truncation}
        return state.replace(done=done, info=info)


class VmapWrapper(Wrapper):
    """Batches reset/step; reset takes a (B, 2) batch of keys so each env
    owns an independent RNG stream in state.info['rng'] — the prerequisite
    for randomized autoreset (reference wrappers.py:13)."""

    def __init__(self, env: Env, batch_size: Optional[int] = None):
        super().__init__(env)
        self.batch_size = batch_size

    def reset(self, rng: jnp.ndarray) -> State:
        if rng.ndim == 1:
            if self.batch_size is None:
                raise ValueError("VmapWrapper.reset needs batched keys or a batch_size")
            rng = jax.random.split(rng, self.batch_size)
        return jax.vmap(self.env.reset)(rng)

    def step(self, state: State, action: jnp.ndarray) -> State:
        return jax.vmap(self.env.step)(state, action)


class AutoResetWrapper(Wrapper):
    """Cached autoreset: restore the episode-initial qp/obs on done (stock
    semantics reused by the reference at envs/__init__.py:68)."""

    def reset(self, rng: jnp.ndarray) -> State:
        state = self.env.reset(rng)
        info = {**state.info, "first_qp": state.qp, "first_obs": state.obs,
                "final_obs": state.obs}
        return state.replace(info=info)

    def step(self, state: State, action: jnp.ndarray) -> State:
        state = _zero_steps_where_done(state)
        state = state.replace(done=jnp.zeros_like(state.done))
        state = self.env.step(state, action)
        qp = jax.tree.map(
            lambda x, y: where_done(state.done, x, y), state.info["first_qp"], state.qp)
        obs = where_done(state.done, state.info["first_obs"], state.obs)
        # pre-reset observation, for learners that bootstrap across autoreset
        info = {**state.info, "final_obs": state.obs}
        return state.replace(qp=qp, obs=obs, info=info)


def _zero_steps_where_done(state: State) -> State:
    if "steps" in state.info:
        steps = where_done(state.done, jnp.zeros_like(state.info["steps"]), state.info["steps"])
        return state.replace(info={**state.info, "steps": steps})
    return state


def _split_info_rng(state: State):
    """Split each env's info['rng'] into (carried key, consumable key).

    The reference reuses info['rng'] verbatim for every autoreset
    (wrappers.py:42) and relies on the env's step to advance it — which only
    the adversary/teleport envs do; for the rest its 'randomized' reset
    resamples one fixed state forever. Splitting here delivers the comment's
    stated intent ('to do rng properly', reference wrappers.py:13) for every
    env."""
    rng = state.info["rng"]
    if rng.ndim > 1:
        split = jax.vmap(lambda r: jax.random.split(r, 2))(rng)
        keep, use = split[:, 0], split[:, 1]
    else:
        keep, use = jax.random.split(rng)
    return state.replace(info={**state.info, "rng": keep}), use


class RandomizedAutoResetWrapperNaive(Wrapper):
    """Resample a fresh initial state every step; one extra reset per step
    (reference wrappers.py:30-52).

    `info['final_obs']` carries the pre-reset observation of the step (equal
    to `obs` when the episode did not end) so off-policy learners can
    bootstrap from the true final state instead of the next episode's initial
    observation."""

    def reset(self, rng: jnp.ndarray) -> State:
        state = self.env.reset(rng)
        return state.replace(info={**state.info, "final_obs": state.obs})

    def step(self, state: State, action: jnp.ndarray) -> State:
        state = _zero_steps_where_done(state)
        state = state.replace(done=jnp.zeros_like(state.done))
        state = self.env.step(state, action)
        state, reset_rng = _split_info_rng(state)
        maybe_reset = self.reset(reset_rng)
        qp = jax.tree.map(lambda x, y: where_done(state.done, x, y), maybe_reset.qp, state.qp)
        obs = where_done(state.done, maybe_reset.obs, state.obs)
        info = {**state.info, "final_obs": state.obs}
        return state.replace(qp=qp, obs=obs, info=info)


class RandomizedAutoResetWrapperOnTerminal(Wrapper):
    """Resample only when >= 1 env is done (still resamples for all), via
    lax.cond (reference wrappers.py:55-80)."""

    def reset(self, rng: jnp.ndarray) -> State:
        state = self.env.reset(rng)
        return state.replace(info={**state.info, "final_obs": state.obs})

    def step(self, state: State, action: jnp.ndarray) -> State:
        state = _zero_steps_where_done(state)
        state = state.replace(done=jnp.zeros_like(state.done))
        state = self.env.step(state, action)
        state = state.replace(info={**state.info, "final_obs": state.obs})
        state, reset_rng = _split_info_rng(state)
        maybe_reset = jax.lax.cond(
            state.done.any(), self.reset, lambda rng: state, reset_rng)
        qp = jax.tree.map(lambda x, y: where_done(state.done, x, y), maybe_reset.qp, state.qp)
        obs = where_done(state.done, maybe_reset.obs, state.obs)
        return state.replace(qp=qp, obs=obs)


class RandomizedAutoResetWrapperCached(Wrapper):
    """Select from a cached first state, refreshed by a host-side counter
    every n_steps_between_updates calls (reference wrappers.py:83-123)."""

    def __init__(self, env: Env, n_steps_between_updates: int = 200):
        super().__init__(env)
        self.n_steps_between_updates = n_steps_between_updates
        self.steps = 0

    def reset(self, rng: jnp.ndarray) -> State:
        state = self.env.reset(rng)
        info = {**state.info, "first_qp": state.qp, "first_obs": state.obs,
                "final_obs": state.obs}
        return state.replace(info=info)

    def step(self, state: State, action: jnp.ndarray) -> State:
        self.steps += 1
        if (self.steps % self.n_steps_between_updates) == 0:
            rngs = state.info["rng"]
            if rngs.ndim > 1:
                new_rngs = jax.vmap(lambda r: jax.random.split(r, 2))(rngs)
                rng, rng1 = new_rngs[:, 0], new_rngs[:, 1]
            else:
                rng, rng1 = jax.random.split(rngs, 2)
            s = self.env.reset(rng1)
            state = state.replace(
                info={**state.info, "first_qp": s.qp, "first_obs": s.obs, "rng": rng})
        state = _zero_steps_where_done(state)
        state = state.replace(done=jnp.zeros_like(state.done))
        state = self.env.step(state, action)
        qp = jax.tree.map(
            lambda x, y: where_done(state.done, x, y), state.info["first_qp"], state.qp)
        obs = where_done(state.done, state.info["first_obs"], state.obs)
        info = {**state.info, "final_obs": state.obs}
        return state.replace(qp=qp, obs=obs, info=info)


class RandomizedAutoResetWrapperCachedOnDevice(Wrapper):
    """Randomized autoreset at near-zero cost: cached fresh states,
    refreshed ON DEVICE every `refresh_every` steps.

    The reference's Cached variant (wrappers.py:83-123) amortizes the
    resample with a HOST-side counter — which silently stops refreshing the
    moment `step` is jitted (the counter freezes under trace), so it cannot
    be used inside the fused scan that makes this framework fast. This
    wrapper keeps the counter in `state.info` and refreshes through
    `lax.cond` at batch level, so the reset cost is paid on 1/refresh_every
    steps INSIDE the jitted scan (XLA executes one conditional branch).
    Measured: the naive per-step resample costs 31% of the fused ant_tag
    step; this wrapper is within ~2% of no-autoreset throughput
    (docs/PERFORMANCE.md).

    Semantics match the reference's Cached variant: each env restarts from
    its cached freshly-sampled state; the cache re-randomizes every
    `refresh_every` steps. Must wrap the VmapWrapper (batch level), like
    the other autoreset wrappers."""

    def __init__(self, env: Env, refresh_every: int = 200):
        super().__init__(env)
        self.refresh_every = refresh_every

    def reset(self, rng: jnp.ndarray) -> State:
        state = self.env.reset(rng)
        info = {**state.info, "first_qp": state.qp, "first_obs": state.obs,
                "final_obs": state.obs,
                # per-env (uniform) so the inner VmapWrapper maps it cleanly
                "cache_age": jnp.zeros_like(state.reward, dtype=jnp.int32)}
        return state.replace(info=info)

    def step(self, state: State, action: jnp.ndarray) -> State:
        # cache_age is stored per-env ONLY because the inner VmapWrapper
        # vmaps every info leaf; this wrapper's own reset keeps it uniform
        # (one refresh clock for the whole batch, like the reference's
        # host-side counter). `any` rather than element [0] so that a
        # restored/mixed-age batch still refreshes — at the earliest env's
        # cadence — instead of silently desyncing.
        age = state.info["cache_age"] + 1
        pred = jnp.any(age % self.refresh_every == 0)

        def refresh(state: State) -> State:
            state, rng_use = _split_info_rng(state)
            fresh = self.env.reset(rng_use)
            return state.replace(info={**state.info, "first_qp": fresh.qp,
                                       "first_obs": fresh.obs})

        state = jax.lax.cond(pred, refresh, lambda s: s, state)
        state = state.replace(info={**state.info, "cache_age": age})
        state = _zero_steps_where_done(state)
        state = state.replace(done=jnp.zeros_like(state.done))
        state = self.env.step(state, action)
        qp = jax.tree.map(
            lambda x, y: where_done(state.done, x, y),
            state.info["first_qp"], state.qp)
        obs = where_done(state.done, state.info["first_obs"], state.obs)
        info = {**state.info, "final_obs": state.obs}
        return state.replace(qp=qp, obs=obs, info=info)


@struct.dataclass
class EvalMetrics:
    """On-device accumulators for eval episode statistics."""

    current_episode_metrics: dict
    completed_episodes_metrics: dict
    completed_episodes: jnp.ndarray
    completed_episodes_steps: jnp.ndarray


class EvalWrapper(Wrapper):
    """Accumulates per-episode metrics on device (stock EvalWrapper
    semantics, reused by the reference at envs/__init__.py:70)."""

    def reset(self, rng: jnp.ndarray) -> State:
        reset_state = self.env.reset(rng)
        metrics = {**reset_state.metrics, "reward": reset_state.reward}
        eval_metrics = EvalMetrics(
            current_episode_metrics=jax.tree.map(jnp.zeros_like, metrics),
            completed_episodes_metrics=jax.tree.map(
                lambda x: jnp.zeros_like(jnp.sum(x)), metrics),
            completed_episodes=jnp.zeros(()),
            completed_episodes_steps=jnp.zeros(()),
        )
        info = {**reset_state.info, "eval_metrics": eval_metrics}
        return reset_state.replace(metrics=metrics, info=info)

    def step(self, state: State, action: jnp.ndarray) -> State:
        state_metrics = state.info["eval_metrics"]
        inner = state.replace(
            info={k: v for k, v in state.info.items() if k != "eval_metrics"})
        nstate = self.env.step(inner, action)
        nmetrics = {**nstate.metrics, "reward": nstate.reward}
        curr = jax.tree.map(
            lambda a, b: a + b, state_metrics.current_episode_metrics, nmetrics)
        completed = jax.tree.map(
            lambda cum, cur: cum + jnp.sum(cur * nstate.done),
            state_metrics.completed_episodes_metrics, curr)
        curr = jax.tree.map(lambda x: x * (1 - nstate.done), curr)
        eval_metrics = EvalMetrics(
            current_episode_metrics=curr,
            completed_episodes_metrics=completed,
            completed_episodes=state_metrics.completed_episodes + jnp.sum(nstate.done),
            completed_episodes_steps=state_metrics.completed_episodes_steps
            + jnp.sum(jnp.ones_like(nstate.done)),
        )
        info = {**nstate.info, "eval_metrics": eval_metrics}
        return nstate.replace(metrics=nmetrics, info=info)
