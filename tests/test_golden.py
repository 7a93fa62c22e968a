"""Golden-trajectory regression tests (SURVEY.md §4 implication (b)).

Fixed-seed single-env rollouts recorded once (tests/golden/*.npz) and
asserted bit-exact on CPU — any numerics change in the physics or task
logic shows up here first. (The cross-reference fixed-seed match of
BASELINE configs 1-3 needs the reference's brax installed, which this
environment does not provide; these fixtures lock OUR numerics so the
engine is at least internally reproducible across runs and refactors.)
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pobrax_tpu.envs import create

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "po_envs_seed7.npz")


def _rollout(name, T=20):
    env = create(name, episode_length=100, auto_reset=False)
    key = jax.random.PRNGKey(7)
    s = jax.jit(env.reset)(key)

    def roll(s, key):
        def body(carry, _):
            s, key = carry
            key, k = jax.random.split(key)
            a = jax.random.uniform(k, (env.action_size,), minval=-1, maxval=1)
            s = env.step(s, a)
            return (s, key), (s.obs, s.reward, s.done)
        return jax.lax.scan(body, (s, key), None, length=T)

    (_, _), (obs, rew, done) = jax.jit(roll)(s, key)
    return np.asarray(obs), np.asarray(rew), np.asarray(done)


@pytest.mark.parametrize("name", ["ant_tag", "ant_heavenhell", "ant_gather"])
def test_golden_trajectory_bit_exact(name):
    data = np.load(GOLDEN)
    obs, rew, done = _rollout(name)
    np.testing.assert_array_equal(obs, data[f"{name}_obs"])
    np.testing.assert_array_equal(rew, data[f"{name}_rew"])
    np.testing.assert_array_equal(done, data[f"{name}_done"])


def test_vmap_batch_matches_single():
    """Batch consistency (SURVEY.md §4 implication (c)): env b of a vmapped
    batch equals the same-seed single env. Tolerance is float32-ulp-tight but
    not bitwise: XLA fuses the batched and unbatched programs differently."""
    env = create("ant_tag", episode_length=100, auto_reset=False)
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    batched = jax.jit(jax.vmap(env.reset))(keys)
    single = jax.jit(env.reset)(keys[2])
    np.testing.assert_allclose(
        np.asarray(batched.obs[2]), np.asarray(single.obs), rtol=0, atol=1e-6)

    act = jnp.tile(jnp.linspace(-1, 1, env.action_size)[None], (4, 1))
    b1 = jax.jit(jax.vmap(env.step))(batched, act)
    s1 = jax.jit(env.step)(single, act[2])
    # the reset's 1-ulp fusion difference is amplified through 10 stiff
    # substeps; 1e-4 still catches any real divergence
    np.testing.assert_allclose(
        np.asarray(b1.obs[2]), np.asarray(s1.obs), rtol=0, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(b1.reward[2]), np.asarray(s1.reward), rtol=0, atol=1e-4)


GOLDEN_EVENTS = os.path.join(
    os.path.dirname(__file__), "golden", "po_envs_events_seed7.npz")

# must mirror tools/gen_golden.py SPECS exactly
EVENT_SPECS = {
    "ant_tag": (dict(tag_radius=8.0), 30),
    "ant_heavenhell": (dict(visible_radius=9.0), 30),
    "ant_gather": (dict(catch_range=5.0), 30),
    "ant_maze": (dict(), 40),
    "halfcheetah": (dict(), 40),
}


def _rollout_events(name, T=120):
    kwargs, ep_len = EVENT_SPECS[name]
    env = create(name, episode_length=ep_len, auto_reset=True,
                 randomized_autoreset=True, **kwargs)
    key = jax.random.PRNGKey(7)
    s = jax.jit(env.reset)(key)

    def roll(s, key):
        def body(carry, _):
            s, key = carry
            key, k = jax.random.split(key)
            a = jax.random.uniform(k, (env.action_size,), minval=-1, maxval=1)
            s = env.step(s, a)
            return (s, key), (s.obs, s.reward, s.done)
        return jax.lax.scan(body, (s, key), None, length=T)

    (_, _), (obs, rew, done) = jax.jit(roll)(s, key)
    return np.asarray(obs), np.asarray(rew), np.asarray(done)


@pytest.mark.parametrize("name", list(EVENT_SPECS))
def test_golden_events_bit_exact(name):
    """120-step windows that CROSS done/autoreset/catch/goal events, locked
    bit-exact (tools/gen_golden.py). The 20-step goldens above miss exactly
    these task-logic branches."""
    data = np.load(GOLDEN_EVENTS)
    obs, rew, done = _rollout_events(name)
    # the events the window exists to lock must actually fire
    assert done.sum() > 0, "no done/autoreset event inside the golden window"
    if name == "ant_tag":
        assert (rew == 1.0).any(), "no tag event in window"
    if name == "ant_heavenhell":
        assert ((rew == 1.0) | (rew == -1.0)).any(), "no goal entry in window"
    if name == "ant_gather":
        assert (np.abs(rew) == 1.0).any(), "no catch event in window"
    np.testing.assert_array_equal(obs, data[f"{name}_obs"])
    np.testing.assert_array_equal(rew, data[f"{name}_rew"])
    np.testing.assert_array_equal(done, data[f"{name}_done"])
