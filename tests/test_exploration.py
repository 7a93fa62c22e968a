"""GridNoveltyBonusWrapper (envs/exploration.py) semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from pobrax_tpu.envs.exploration import GridNoveltyBonusWrapper
from pobrax_tpu.envs.pendulum import InvertedPendulum
from pobrax_tpu.envs import _envs


def test_first_visit_bonus_and_count_growth():
    """First visit pays beta/sqrt(1); staying in the cell decays the bonus
    as 1/sqrt(n); counts live in state.info and thread through step."""
    env = GridNoveltyBonusWrapper(_envs["ant_gather"](), beta=0.5,
                                  halflife_steps=None)
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert state.info["visit_counts"].shape == (16, 16)
    np.testing.assert_array_equal(np.asarray(state.info["visit_counts"]), 0)

    act = jnp.zeros(env.action_size)
    step = jax.jit(env.step)
    s1 = step(state, act)
    # one cell counted once; bonus == beta exactly on a first visit
    assert float(jnp.sum(s1.info["visit_counts"])) == 1.0
    inner = env.env.step(state, act)
    np.testing.assert_allclose(float(s1.reward - inner.reward), 0.5,
                               rtol=1e-6)

    # a near-stationary ant keeps hitting the same cell: bonus_n = b/sqrt(n)
    s2 = step(s1, act)
    s3 = step(s2, act)
    assert float(jnp.max(s3.info["visit_counts"])) >= 2.0
    total = float(jnp.sum(s3.info["visit_counts"]))
    np.testing.assert_allclose(total, 3.0, rtol=1e-6)


def test_decay_halflife():
    env = GridNoveltyBonusWrapper(InvertedPendulum(), beta=0.1, grid=4,
                                  half_extent=2.0, halflife_steps=2.0,
                                  torso_idx=0)
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    act = jnp.zeros(env.action_size)
    s = step(state, act)
    # after 2 more steps the first visit has decayed by ~0.5
    s = step(step(s, act), act)
    counts = np.asarray(s.info["visit_counts"])
    # geometric series with r = 0.5**(1/2): 1 + r + r^2 at the cell
    r = 0.5 ** 0.5
    np.testing.assert_allclose(counts.max(), 1 + r + r * r, rtol=1e-5)


def test_vmaps_under_training_stack():
    """The wrapper vmaps: per-env grids, no cross-env leakage."""
    from pobrax_tpu.envs import wrappers

    core = GridNoveltyBonusWrapper(_envs["ant_gather"](), beta=0.25)
    env = wrappers.EpisodeWrapper(core, 8, 1)
    env = wrappers.VmapWrapper(env, batch_size=3)
    env = wrappers.RandomizedAutoResetWrapperNaive(env)
    state = jax.jit(env.reset)(jax.random.split(jax.random.PRNGKey(0), 3))
    assert state.info["visit_counts"].shape == (3, 16, 16)
    act = jnp.zeros((3, env.action_size))
    state = jax.jit(env.step)(state, act)
    sums = np.asarray(jnp.sum(state.info["visit_counts"], axis=(1, 2)))
    np.testing.assert_allclose(sums, 1.0, rtol=1e-6)
    assert np.all(np.isfinite(np.asarray(state.reward)))


def test_bomb_memory_danger_grid():
    """bomb_memory: a bomb hit marks the current cell; standing in a
    marked cell costs bomb_memory per step; unmarked cells don't."""
    env = GridNoveltyBonusWrapper(_envs["ant_gather"](), beta=0.0,
                                  bomb_memory=0.5, halflife_steps=None)
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert state.info["bomb_cells"].shape == (16, 16)
    act = jnp.zeros(env.action_size)
    step = jax.jit(env.step)
    s1 = step(state, act)
    inner1 = env.env.step(state, act)
    hit1 = float(jnp.minimum(inner1.metrics["bombs"], 1.0))
    # bonus is -0.5 only if this step both marked AND occupies the cell
    np.testing.assert_allclose(float(s1.reward - inner1.reward),
                               -0.5 * hit1, atol=1e-6)
    # no bomb hit => no cells marked; with a forced mark, penalty applies
    forced = s1.replace(info={**s1.info,
                              "bomb_cells": jnp.ones((16, 16), jnp.float32)})
    s2 = step(forced, act)
    inner2 = env.env.step(forced, act)
    np.testing.assert_allclose(float(s2.reward - inner2.reward), -0.5,
                               atol=1e-6)
    # beta=0, bomb_memory>0 still threads both grids through the scan
    assert "visit_counts" in s2.info and "bomb_cells" in s2.info
