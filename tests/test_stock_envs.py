"""Stock env suite: obs layouts (mask-table sizes), stability, planarity."""

import jax
import jax.numpy as jnp
import pytest

from pobrax_tpu.envs import _envs, masks

# exact observation sizes implied by the reference's mask tables
# (/root/reference/po_brax/standard_observability_masks.py)
OBS_SIZES = {
    "fast": 2,
    "fetch": 101,
    "grasp": 132,
    "halfcheetah": 23,
    "hopper": 14,
    "humanoid": 299,
    "humanoidstandup": 299,
    "inverted_pendulum": 10,
    "inverted_double_pendulum": 25,
    "reacher": 11,
    "reacherangle": 11,
    "ur5e": 66,
    "walker2d": 20,
}

PLANAR = ("halfcheetah", "hopper", "walker2d",
          "inverted_pendulum", "inverted_double_pendulum")


def _rollout(env, T=100, seed=0):
    key = jax.random.PRNGKey(seed)
    s = jax.jit(env.reset)(key)

    def roll(s, key):
        def body(carry, _):
            s, key = carry
            key, k = jax.random.split(key)
            a = jax.random.uniform(k, (env.action_size,), minval=-1, maxval=1)
            s = env.step(s, a)
            return (s, key), (s.obs, s.reward, s.done, s.qp.pos)
        return jax.lax.scan(body, (s, key), None, length=T)

    (_, _), out = jax.jit(roll)(s, key)
    return s, out


@pytest.mark.parametrize("name", sorted(OBS_SIZES))
def test_obs_size_and_stability(name):
    env = _envs[name]()
    s0, (obs, rew, done, pos) = _rollout(env)
    assert s0.obs.shape == (OBS_SIZES[name],)
    assert obs.shape[-1] == OBS_SIZES[name]
    assert bool(jnp.all(jnp.isfinite(obs)))
    assert bool(jnp.all(jnp.isfinite(rew)))
    assert bool(jnp.all(jnp.isfinite(pos)))


@pytest.mark.parametrize("name", PLANAR)
def test_planar_envs_stay_in_plane(name):
    env = _envs[name]()
    _, (_, _, _, pos) = _rollout(env, T=60)
    assert float(jnp.abs(pos[..., 1]).max()) < 1e-5


def test_mask_tables_cover_stock_envs():
    # every env with a POSITION entry has the mask span inside its obs vector
    for name, size in OBS_SIZES.items():
        if name in masks.POSITION:
            assert masks.POSITION[name].max() < size
            m = masks.segment_mask(name, size, ["POSITION"])
            assert m.shape == (size,)
            assert not m[masks.POSITION[name]].any()


def test_reacher_tracks_target():
    # fingertip-minus-target obs segment [8,11) is consistent with positions
    env = _envs["reacher"]()
    s = jax.jit(env.reset)(jax.random.PRNGKey(1))
    to_target = s.obs[8:11]
    tgt = s.qp.pos[env.target]
    tip = env._fingertip(s.qp)
    assert jnp.allclose(to_target, tip - tgt, atol=1e-6)


def test_inverted_pendulum_terminates_on_tip():
    env = _envs["inverted_pendulum"]()
    _, (_, _, done, _) = _rollout(env, T=150)
    assert float(done.max()) == 1.0  # random forcing tips the pole
