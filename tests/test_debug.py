"""Debug-guard and determinism-probe tests."""

import jax
import jax.numpy as jnp
import pytest

from pobrax_tpu.utils.debug import assert_deterministic, nan_guard


def test_nan_guard_passes_finite():
    f = nan_guard(lambda x: {"y": x * 2.0})
    out = f(jnp.ones(4))
    assert float(out["y"][0]) == 2.0


def test_nan_guard_raises_on_nan():
    f = nan_guard(lambda x: x / x, name="div")  # 0/0 -> nan
    with pytest.raises(Exception):
        f(jnp.zeros(3))


def test_assert_deterministic_on_env_rollout():
    from pobrax_tpu.envs import create

    env = create("ant_tag", batch_size=2, episode_length=16,
                 randomized_autoreset=True)

    def roll(key):
        s = env.reset(jax.random.split(key, 2))
        def body(carry, _):
            s = env.step(carry, jnp.zeros((2, env.action_size)))
            return s, s.obs
        _, obs = jax.lax.scan(body, s, None, length=5)
        return obs

    assert_deterministic(jax.jit(roll), seed=11)
