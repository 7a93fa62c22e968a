"""Rollout + eval-stats demo (the reference's scratch.py, framework-style).

Runs a batched AntTag rollout two ways:
  1. the gym VectorEnv path with host-side autoreset + EvalGymWrapper stats
     (reference scratch.py:13-22 semantics), and
  2. the native fused path — one jitted lax.scan carrying the env state,
     with on-device randomized autoreset (the shape SURVEY.md §3.4 calls
     out as the one to make primary).

Usage: python examples/rollout_demo.py [env_name] [batch] [steps]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from pobrax_tpu.envs import create, create_gym_env  # noqa: E402


def gym_path(env_name="ant_tag", batch=16, steps=200):
    egym = create_gym_env(env_name, batch_size=batch, seed=0, eval_metrics=True)
    egym.reset()
    t0 = time.perf_counter()
    for _ in range(steps):
        action = egym.action_space.sample()
        egym.step(action)
    stats = egym.get_stats()
    dt = time.perf_counter() - t0
    print(f"[gym path]    {batch * steps / dt:,.0f} env-steps/s; stats: "
          f"{ {k: round(float(v), 3) for k, v in stats.items()} }")


def native_path(env_name="ant_tag", batch=16, steps=200):
    env = create(env_name, batch_size=batch, randomized_autoreset=True)
    key = jax.random.PRNGKey(0)
    state = jax.jit(env.reset)(jax.random.split(key, batch))

    def rollout(state, key):
        def body(carry, _):
            state, key = carry
            key, k = jax.random.split(key)
            a = jax.random.uniform(
                k, (batch, env.action_size), minval=-1.0, maxval=1.0)
            state = env.step(state, a)
            return (state, key), state.reward
        return jax.lax.scan(body, (state, key), None, length=steps)

    rollout = jax.jit(rollout)
    (state, _), rewards = rollout(state, key)  # compile
    jax.block_until_ready(rewards)
    t0 = time.perf_counter()
    (state, _), rewards = rollout(state, key)
    jax.block_until_ready(rewards)
    dt = time.perf_counter() - t0
    print(f"[native path] {batch * steps / dt:,.0f} env-steps/s; "
          f"mean reward {float(rewards.mean()):.4f}")


if __name__ == "__main__":
    env_name = sys.argv[1] if len(sys.argv) > 1 else "ant_tag"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    gym_path(env_name, batch, steps)
    native_path(env_name, batch, steps)
