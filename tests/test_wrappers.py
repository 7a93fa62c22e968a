"""Wrapper-suite semantics tests (reference wrappers.py behaviors)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pobrax_tpu import envs
from pobrax_tpu.envs import wrappers
from pobrax_tpu.envs.ant import Ant
from pobrax_tpu.envs.masked import MaskedObservationWrapper
from pobrax_tpu.envs.masks import segment_mask


@pytest.fixture(scope="module")
def ant():
    return Ant()


def _batched_reset(env, B, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), B)
    return jax.jit(env.reset)(keys), keys


class TestEpisodeWrapper:
    def test_truncates_at_budget(self, ant):
        env = wrappers.EpisodeWrapper(ant, episode_length=5)
        s = jax.jit(env.reset)(jax.random.PRNGKey(0))

        def roll(s):
            def body(s, _):
                s = env.step(s, jnp.zeros(8))
                return s, (s.done, s.info["truncation"], s.info["steps"])
            return jax.lax.scan(body, s, None, length=6)

        _, (done, trunc, steps) = jax.jit(roll)(s)
        np.testing.assert_array_equal(np.asarray(done), [0, 0, 0, 0, 1, 1])
        assert float(trunc[4]) == 1.0  # truncated, not terminated
        np.testing.assert_array_equal(np.asarray(steps), [1, 2, 3, 4, 5, 6])


class TestVmapWrapper:
    def test_batched_keys_give_distinct_envs(self, ant):
        env = wrappers.VmapWrapper(ant)
        s, _ = _batched_reset(env, 4)
        obs = np.asarray(s.obs)
        assert len({tuple(np.round(o, 6)) for o in obs}) == 4

    def test_batch_matches_single(self, ant):
        env = wrappers.VmapWrapper(ant)
        s, keys = _batched_reset(env, 4)
        single = jax.jit(ant.reset)(keys[1])
        np.testing.assert_allclose(np.asarray(s.obs[1]), np.asarray(single.obs), atol=1e-6)


class TestAutoReset:
    def _stack(self, ant, cls):
        env = wrappers.EpisodeWrapper(ant, episode_length=3)
        env = wrappers.VmapWrapper(env)
        return cls(env)

    def test_cached_restores_initial_state(self, ant):
        env = self._stack(ant, wrappers.AutoResetWrapper)
        s, _ = _batched_reset(env, 2)
        first_obs = np.asarray(s.obs)

        def roll(s):
            def body(s, _):
                s = env.step(s, jnp.zeros((2, 8)))
                return s, s.obs
            return jax.lax.scan(body, s, None, length=3)

        _, obs_seq = jax.jit(roll)(s)
        # after episode end (step 3), obs is the cached initial obs
        np.testing.assert_allclose(np.asarray(obs_seq[2]), first_obs, atol=1e-6)

    def test_randomized_naive_resamples(self, ant):
        env = self._stack(ant, wrappers.RandomizedAutoResetWrapperNaive)
        s, _ = _batched_reset(env, 2)
        first_obs = np.asarray(s.obs)

        def roll(s):
            def body(s, _):
                s = env.step(s, jnp.zeros((2, 8)))
                return s, s.obs
            return jax.lax.scan(body, s, None, length=3)

        _, obs_seq = jax.jit(roll)(s)
        # resampled state differs from episode-initial state
        assert not np.allclose(np.asarray(obs_seq[2]), first_obs, atol=1e-5)

    def test_randomized_on_terminal_matches_naive_on_done(self, ant):
        naive = self._stack(ant, wrappers.RandomizedAutoResetWrapperNaive)
        ont = self._stack(ant, wrappers.RandomizedAutoResetWrapperOnTerminal)
        s_n, _ = _batched_reset(naive, 2)
        s_o, _ = _batched_reset(ont, 2)

        def roll(env):
            def f(s):
                def body(s, _):
                    s = env.step(s, jnp.zeros((2, 8)))
                    return s, s.obs
                return jax.lax.scan(body, s, None, length=3)
            return f

        _, obs_n = jax.jit(roll(naive))(s_n)
        _, obs_o = jax.jit(roll(ont))(s_o)
        np.testing.assert_allclose(np.asarray(obs_n[2]), np.asarray(obs_o[2]), atol=1e-6)

    def test_steps_zeroed_after_reset(self, ant):
        env = self._stack(ant, wrappers.RandomizedAutoResetWrapperNaive)
        s, _ = _batched_reset(env, 2)

        def roll(s):
            def body(s, _):
                s = env.step(s, jnp.zeros((2, 8)))
                return s, s.info["steps"]
            return jax.lax.scan(body, s, None, length=5)

        _, steps = jax.jit(roll)(s)
        # episode_length=3: steps 1,2,3 then reset zeroing -> 1,2
        np.testing.assert_array_equal(np.asarray(steps)[:, 0], [1, 2, 3, 1, 2])


class TestEvalWrapper:
    def test_accumulates_completed_episodes(self, ant):
        env = wrappers.EvalWrapper(
            wrappers.AutoResetWrapper(
                wrappers.VmapWrapper(wrappers.EpisodeWrapper(ant, episode_length=3))))
        s, _ = _batched_reset(env, 2)

        def roll(s):
            def body(s, _):
                s = env.step(s, jnp.zeros((2, 8)))
                return s, None
            s, _ = jax.lax.scan(body, s, None, length=7)
            return s

        s = jax.jit(roll)(s)
        em = s.info["eval_metrics"]
        assert float(em.completed_episodes) == 4.0  # 2 envs x 2 episodes
        assert float(em.completed_episodes_steps) == 14.0
        assert "reward" in em.completed_episodes_metrics


class TestMasks:
    def test_segment_mask_ant(self):
        mask = segment_mask("ant", 87, hidden=("VELOCITY",))
        assert mask[:13].all() and not mask[13:27].any() and mask[27:].all()

    def test_masked_wrapper_zeroes_segment(self, ant):
        env = MaskedObservationWrapper(ant, env_name="ant", hidden=("VELOCITY",))
        s = jax.jit(env.reset)(jax.random.PRNGKey(0))
        obs = np.asarray(s.obs)
        assert (obs[13:27] == 0).all()
        s2 = jax.jit(env.step)(s, jnp.zeros(8))
        assert (np.asarray(s2.obs)[13:27] == 0).all()
        assert np.abs(np.asarray(s2.obs)[:13]).sum() > 0

    def test_unknown_segment_raises(self, ant):
        with pytest.raises(KeyError):
            MaskedObservationWrapper(ant, env_name="ant", hidden=("TARGET_POS",))


class TestActionRepeat:
    def test_scales_dt_and_substeps(self):
        ant = Ant()
        dt0, sub0 = ant.sys.config.dt, ant.sys.config.substeps
        env = wrappers.ActionRepeatWrapper(ant, action_repeat=6)
        assert env.sys.config.dt == pytest.approx(dt0 * 6)
        assert env.sys.config.substeps == sub0 * 6


class TestFactory:
    def test_full_stack_runs(self):
        env = envs.create("ant_heavenhell", episode_length=50, action_repeat=2,
                          batch_size=4, auto_reset=True, eval_metrics=True)
        keys = jax.random.split(jax.random.PRNGKey(0), 4)
        s = jax.jit(env.reset)(keys)
        s = jax.jit(env.step)(s, jnp.zeros((4, 8)))
        assert s.obs.shape == (4, 114)
        assert "eval_metrics" in s.info


class TestFinalObs:
    """info['final_obs'] must carry the PRE-autoreset observation."""

    def test_naive_final_obs_is_pre_reset(self):
        from pobrax_tpu.envs.fast import Fast

        env = wrappers.EpisodeWrapper(Fast(), episode_length=2, action_repeat=1)
        env = wrappers.VmapWrapper(env, batch_size=3)
        env = wrappers.RandomizedAutoResetWrapperNaive(env)
        state, _ = _batched_reset(env, 3)
        act = jnp.ones((3, 1))
        step = jax.jit(env.step)
        state = step(state, act)
        state = step(state, act)  # episode_length hit -> done+truncation
        assert bool(jnp.all(state.done == 1.0))
        # obs was replaced by the fresh reset (zeros for Fast)...
        np.testing.assert_array_equal(np.asarray(state.obs), 0.0)
        # ...but final_obs kept the stepped, nonzero observation
        assert bool(jnp.all(jnp.abs(state.info["final_obs"][:, 0]) > 0.0))

    def test_final_obs_equals_obs_mid_episode(self):
        from pobrax_tpu.envs.fast import Fast

        env = wrappers.EpisodeWrapper(Fast(), episode_length=100, action_repeat=1)
        env = wrappers.VmapWrapper(env, batch_size=2)
        env = wrappers.RandomizedAutoResetWrapperNaive(env)
        state, _ = _batched_reset(env, 2)
        state = jax.jit(env.step)(state, jnp.ones((2, 1)))
        np.testing.assert_array_equal(
            np.asarray(state.obs), np.asarray(state.info["final_obs"]))


class TestCachedOnDevice:
    def _stack(self, B=4, refresh=5, env=None):
        env = env or Ant()
        e = wrappers.EpisodeWrapper(env, episode_length=2, action_repeat=1)
        e = wrappers.VmapWrapper(e, batch_size=B)
        return wrappers.RandomizedAutoResetWrapperCachedOnDevice(
            e, refresh_every=refresh)

    def test_restores_cached_state_on_done(self, ant):
        env = self._stack(env=ant)
        state, _ = _batched_reset(env, 4)
        first_obs = np.asarray(state.info["first_obs"])
        act = jnp.zeros((4, ant.action_size))
        step = jax.jit(env.step)
        state = step(state, act)
        state = step(state, act)  # episode_length=2 -> done
        assert bool(jnp.all(state.done == 1.0))
        np.testing.assert_array_equal(np.asarray(state.obs), first_obs)

    def test_cache_refreshes_on_schedule_inside_scan(self, ant):
        env = self._stack(env=ant, refresh=3)
        state, _ = _batched_reset(env, 4)
        act = jnp.zeros((4, ant.action_size))

        def roll(state, n):
            def body(s, _):
                s = env.step(s, act)
                return s, s.info["first_obs"]
            return jax.lax.scan(body, state, None, length=n)

        _, cached = jax.jit(lambda s: roll(s, 7))(state)
        c = np.asarray(cached)
        # steps 1,2 keep the reset-time cache; step 3 refreshes; 4,5 keep;
        # 6 refreshes again (fully inside the jitted scan)
        np.testing.assert_array_equal(c[0], c[1])
        assert np.abs(c[2] - c[1]).max() > 0
        np.testing.assert_array_equal(c[2], c[3])
        np.testing.assert_array_equal(c[3], c[4])
        assert np.abs(c[5] - c[4]).max() > 0

    def test_episode_starts_repeat_within_refresh_window(self, ant):
        """The SAMPLING-SEMANTICS delta vs naive, pinned (and quantified on
        heavenhell by tools/autoreset_study.py): between refreshes an env
        slot restarts from the SAME cached state every time it finishes;
        naive mode draws a fresh state per reset. This temporal correlation
        (not a bias — the cache itself is freshly sampled) is the price of
        the ~31%-cheaper step."""
        act = jnp.zeros((4, ant.action_size))

        def starts(env, n=9):
            state, _ = _batched_reset(env, 4)

            def body(s, _):
                s = env.step(s, act)
                return s, (s.done, s.obs)

            _, (done, obs) = jax.lax.scan(body, state, None, length=n)
            d, o = np.asarray(done), np.asarray(obs)
            return [o[t] for t in range(n) if d[t].all()]

        # episode_length=2 -> a reset every 2 steps; refresh_every=50 ->
        # never refreshes within the 9-step window
        cached = starts(self._stack(env=ant, refresh=50))
        assert len(cached) >= 3
        for s in cached[1:]:
            np.testing.assert_array_equal(s, cached[0])

        e = wrappers.EpisodeWrapper(ant, episode_length=2, action_repeat=1)
        e = wrappers.VmapWrapper(e, batch_size=4)
        naive = starts(wrappers.RandomizedAutoResetWrapperNaive(e))
        assert any(np.abs(s - naive[0]).max() > 0 for s in naive[1:])
