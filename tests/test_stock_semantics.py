"""Per-env reward-direction and termination semantics (VERDICT round-1 #9).

One semantic assertion per registry env: forward-velocity rewards reward
forward motion, distance costs grow with distance, alive bonuses/termination
fire at the documented state thresholds. States are posed directly (teleport
/ velocity boost on the dynamic bodies) so each assertion isolates the
reward/done law rather than the policy's ability to reach the state.
"""

import math

import jax
import jax.numpy as jnp
import pytest

from pobrax_tpu.envs import _envs


def _reset(env, seed=0):
    return jax.jit(env.reset)(jax.random.PRNGKey(seed))


def _zeros(env):
    return jnp.zeros((env.action_size,))


def _boost(env, state, vx):
    """Add vx to every DYNAMIC body's x velocity (frozen bodies must keep
    vel 0 — the contact solver reads them)."""
    active = jnp.asarray(env.sys.body.active)  # (n, 1)
    vel = state.qp.vel + jnp.array([vx, 0.0, 0.0]) * active
    return state.replace(qp=state.qp.replace(vel=vel))


def _lift(env, state, dz):
    active = jnp.asarray(env.sys.body.active)
    pos = state.qp.pos + jnp.array([0.0, 0.0, dz]) * active
    return state.replace(qp=state.qp.replace(pos=pos))


# ---- forward-velocity rewards -------------------------------------------------

@pytest.mark.parametrize("name,vx", [
    ("ant", 2.0), ("halfcheetah", 2.0), ("hopper", 2.0),
    ("walker2d", 2.0), ("humanoid", 2.0),
])
def test_forward_velocity_increases_reward(name, vx):
    env = _envs[name]()
    s = _reset(env)
    step = jax.jit(env.step)
    r_rest = float(step(s, _zeros(env)).reward)
    r_fwd = float(step(_boost(env, s, vx), _zeros(env)).reward)
    assert r_fwd > r_rest + 0.5 * vx, (
        f"{name}: forward motion must increase reward ({r_fwd} vs {r_rest})")


# ---- termination at unhealthy heights ------------------------------------------

@pytest.mark.parametrize("name", ["ant", "hopper", "walker2d", "humanoid"])
def test_out_of_healthy_height_terminates(name):
    env = _envs[name]()
    s = _reset(env)
    step = jax.jit(env.step)
    assert float(step(s, _zeros(env)).done) == 0.0
    # lifted far above the healthy band: one free-fall step cannot re-enter it
    assert float(step(_lift(env, s, 5.0), _zeros(env)).done) == 1.0


def test_fetch_fall_terminates():
    env = _envs["fetch"]()
    s = _reset(env)
    step = jax.jit(env.step)
    assert float(step(s, _zeros(env)).done) == 0.0
    assert float(step(_lift(env, s, 5.0), _zeros(env)).done) == 1.0


# ---- balance envs ----------------------------------------------------------------

def test_inverted_pendulum_tips_over():
    env = _envs["inverted_pendulum"]()
    s = _reset(env)
    step = jax.jit(env.step)
    n0 = step(s, _zeros(env))
    assert float(n0.done) == 0.0 and float(n0.reward) == 1.0
    tilted = s.replace(qp=env.sys.default_qp(joint_angle=jnp.array([0.5])))
    assert float(step(tilted, _zeros(env)).done) == 1.0


def test_inverted_double_pendulum_distance_penalty_and_fall():
    env = _envs["inverted_double_pendulum"]()
    s = _reset(env)
    step = jax.jit(env.step)
    r_up = float(step(s, _zeros(env)).reward)
    tilted = s.replace(
        qp=env.sys.default_qp(joint_angle=jnp.array([0.8, 0.0])))
    r_tilt = float(step(tilted, _zeros(env)).reward)
    assert r_up > r_tilt, "upright pole must out-reward a tilted pole"
    hanging = s.replace(
        qp=env.sys.default_qp(joint_angle=jnp.array([math.pi, 0.0])))
    assert float(step(hanging, _zeros(env)).done) == 1.0


def test_acrobot_swingup_reward_and_done():
    env = _envs["acrobot"]()
    s = _reset(env)
    step = jax.jit(env.step)
    hang = step(s, _zeros(env))
    assert float(hang.done) == 0.0
    assert float(hang.reward) < 0.0  # tip below base: shaped reward negative
    # zero pose hangs; the inverted configuration is shoulder = pi
    upright = s.replace(
        qp=env.sys.default_qp(joint_angle=jnp.array([math.pi, 0.0])))
    up = step(upright, _zeros(env))
    assert float(up.done) == 1.0  # tip above the 1.8 swing-up height
    assert float(up.reward) > float(hang.reward)


# ---- reaching / manipulation distance costs -------------------------------------

def _teleport_body(env, state, body_idx, pos):
    qp = state.qp.replace(pos=state.qp.pos.at[body_idx].set(pos))
    return state.replace(qp=qp)


@pytest.mark.parametrize("name", ["reacher", "reacherangle"])
def test_reacher_distance_cost(name):
    env = _envs[name]()
    s = _reset(env)
    step = jax.jit(env.step)
    near = _teleport_body(env, s, env.target, env._fingertip(s.qp))
    far = _teleport_body(env, s, env.target,
                         jnp.array([0.25, 0.25, float(s.qp.pos[env.target, 2])]))
    r_near = float(step(near, _zeros(env)).reward)
    r_far = float(step(far, _zeros(env)).reward)
    assert r_near > r_far, "reward must fall with fingertip-target distance"


def test_ur5e_hit_bonus_and_distance():
    env = _envs["ur5e"]()
    s = _reset(env)
    step = jax.jit(env.step)
    near = _teleport_body(env, s, env.target, s.qp.pos[env.wrist])
    far = _teleport_body(env, s, env.target, jnp.array([2.0, 2.0, 1.0]))
    r_near = float(step(near, _zeros(env)).reward)
    r_far = float(step(far, _zeros(env)).reward)
    assert r_near > 0.0 > r_far  # +10 hit bonus vs pure -distance


def test_grasp_delivery_reward():
    env = _envs["grasp"]()
    s = _reset(env)
    step = jax.jit(env.step)
    near = _teleport_body(env, s, env.target, s.qp.pos[env.obj])
    far = _teleport_body(env, s, env.target, jnp.array([3.0, 3.0, 1.0]))
    r_near = float(step(near, _zeros(env)).reward)
    r_far = float(step(far, _zeros(env)).reward)
    assert r_near > r_far


def test_fetch_hit_bonus():
    env = _envs["fetch"]()
    s = _reset(env)
    step = jax.jit(env.step)
    torso_xy = s.qp.pos[env.torso]
    near = _teleport_body(env, s, env.target,
                          torso_xy + jnp.array([0.1, 0.0, 0.0]))
    far = _teleport_body(env, s, env.target, jnp.array([10.0, 10.0, 0.5]))
    r_near = float(step(near, _zeros(env)).reward)
    r_far = float(step(far, _zeros(env)).reward)
    assert r_near > 10.0  # +25 hit bonus fires
    assert r_near > r_far


def test_humanoidstandup_rewards_height():
    env = _envs["humanoidstandup"]()
    s = _reset(env)
    step = jax.jit(env.step)
    r_low = float(step(s, _zeros(env)).reward)
    r_high = float(step(_lift(env, s, 1.0), _zeros(env)).reward)
    assert r_high > r_low


def test_fast_reward_tracks_position():
    env = _envs["fast"]()
    s = _reset(env)
    step = jax.jit(env.step)
    s = step(s, jnp.ones(1))
    s = step(s, jnp.ones(1))
    assert float(s.reward) > 0.0
