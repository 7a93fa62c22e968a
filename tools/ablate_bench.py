"""Phase attribution for the fused TPU step (docs/PERFORMANCE.md roofline).

Measures ant_tag throughput under targeted ablations to attribute substep
time between contacts / joints+integration / task logic, and to expose the
serial-dependency-chain cost via substep scaling:

  full        — the production program (physics x task logic x autoreset)
  no-walls    — arena wall pairs removed (ground contacts kept)
  no-contacts — collide_include=() (contact phase fully gone)
  physics     — raw sys.step scan, no task logic/autoreset/obs
  substeps-1  — full env but substeps=1 (fixed-work-per-substep check:
                if time/step scales ~linearly in substeps, the program is
                substep-serial — latency-bound, not throughput-bound)

Run on the TPU chip:  python tools/ablate_bench.py
Prints one JSON line per variant.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

BATCH = 4096
STEPS = 200


def _time_scan(step_state, rollout_jit, block):
    state = step_state
    state = rollout_jit(state)  # compile + warmup
    jax.block_until_ready(block(state))
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        state = rollout_jit(state)
        jax.block_until_ready(block(state))
        best = max(best, BATCH * STEPS / (time.perf_counter() - t0))
    return best


def bench_env(env) -> float:
    from pobrax_tpu.envs import wrappers

    wrapped = wrappers.EpisodeWrapper(env, 1000, 1)
    wrapped = wrappers.VmapWrapper(wrapped, batch_size=BATCH)
    wrapped = wrappers.RandomizedAutoResetWrapperNaive(wrapped)
    key = jax.random.PRNGKey(0)
    state = jax.jit(wrapped.reset)(jax.random.split(key, BATCH))

    def rollout(carry):
        state, key = carry

        def body(carry, _):
            state, key = carry
            key, k = jax.random.split(key)
            a = jax.random.uniform(k, (BATCH, env.action_size),
                                   minval=-1.0, maxval=1.0)
            return (wrapped.step(state, a), key), None

        return jax.lax.scan(body, (state, key), None, length=STEPS)[0]

    return _time_scan((state, key), jax.jit(rollout, donate_argnums=(0,)),
                      lambda c: c[0].obs)


def bench_physics_only(sys_) -> float:
    qp1 = sys_.default_qp()
    qps = jax.tree.map(lambda x: jnp.broadcast_to(x, (BATCH,) + x.shape), qp1)

    def rollout(carry):
        qps, key = carry

        def body(carry, _):
            qps, key = carry
            key, k = jax.random.split(key)
            a = jax.random.uniform(k, (BATCH, 8), minval=-1.0, maxval=1.0)
            qps2, _ = jax.vmap(sys_.step)(qps, a)
            return (qps2, key), None

        return jax.lax.scan(body, (qps, key), None, length=STEPS)[0]

    return _time_scan((qps, jax.random.PRNGKey(0)),
                      jax.jit(rollout, donate_argnums=(0,)),
                      lambda c: c[0].pos)


def _rebuild(env, **cfg_overrides):
    from pobrax_tpu.physics.system import System

    env.sys = System(dataclasses.replace(env.sys.config, **cfg_overrides))
    return env


def main() -> None:
    from pobrax_tpu.envs.ant_tag import AntTagEnv

    results = {}

    env = AntTagEnv()
    results["full"] = bench_env(env)
    results["physics_only"] = bench_physics_only(env.sys)

    no_walls = tuple(p for p in env.sys.config.collide_include
                     if "Arena" not in p)
    results["no_walls"] = bench_env(_rebuild(AntTagEnv(),
                                             collide_include=no_walls))
    results["no_contacts"] = bench_env(_rebuild(AntTagEnv(),
                                                collide_include=()))
    results["substeps_1"] = bench_env(_rebuild(AntTagEnv(), substeps=1))

    for k, v in results.items():
        print(json.dumps({"variant": k, "env_steps_per_s": round(v, 1)}),
              flush=True)

    full = results["full"]
    t_full = 1e9 / full  # ns per env-step
    shares = {
        # fraction of full step time attributable to each ablated phase
        "wall_contact_share": 1 - (1e9 / results["no_walls"]) / t_full,
        "all_contact_share": 1 - (1e9 / results["no_contacts"]) / t_full,
        "task_logic_share": 1 - (1e9 / results["physics_only"]) / t_full,
        # 10x the substeps costs how much more than 1x? ~10 = fully serial
        "substeps10_vs_1_time_ratio": results["substeps_1"] / full,
    }
    print(json.dumps({k: round(v, 3) for k, v in shares.items()}))


if __name__ == "__main__":
    main()
