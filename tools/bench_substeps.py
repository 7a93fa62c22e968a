"""TPU A/B of the substeps retune (ROADMAP #2 / VERDICT-r4 next-step #2).

The CPU stability probe (tools/substeps_probe.py) rejected substeps=5 at
every stiffness retune (plain halving locks into instant termination;
h*omega-preserving rescales inject energy) and located the stability edge
of the semi-implicit spring integrator at h_sub = 0.00625 s: substeps=8
is the ONLY candidate whose random-rollout stats match production
(z/done/speed within a few %; 7 and 6 blow up). This tool measures what
substeps=8 actually buys on the TPU fused path — same jitted
scan/autoreset harness as bench.py, same chip, back-to-back.

Usage: python tools/bench_substeps.py [env_name] [batch] [steps]
Env: SUBSTEPS_LIST="10,8" (candidates, first = reference).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from pobrax_tpu.envs import _envs, wrappers  # noqa: E402
from tools.substeps_probe import retuned_env  # noqa: E402


def bench_substeps(env_name: str, substeps: int, batch: int, steps: int,
                   repeats: int = 3) -> float:
    core = retuned_env(env_name, substeps)
    env = wrappers.ActionRepeatWrapper(core, action_repeat=1)
    env = wrappers.EpisodeWrapper(env, 1000, 1)
    env = wrappers.VmapWrapper(env, batch_size=batch)
    env = wrappers.randomized_autoreset(
        env, os.environ.get("BENCH_AUTORESET", "cached"))
    action_size = env.action_size

    def rollout(state, key):
        def body(carry, _):
            state, key = carry
            key, k_act = jax.random.split(key)
            action = jax.random.uniform(
                k_act, (batch, action_size), minval=-1.0, maxval=1.0)
            state = env.step(state, action)
            return (state, key), None

        (state, key), _ = jax.lax.scan(body, (state, key), None, length=steps)
        return state, key

    key = jax.random.PRNGKey(0)
    state = jax.jit(env.reset)(jax.random.split(key, batch))
    rollout_jit = jax.jit(rollout, donate_argnums=(0,))
    state, key = rollout_jit(state, key)
    jax.block_until_ready(state.obs)

    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, key = rollout_jit(state, key)
        jax.block_until_ready(state.obs)
        best = max(best, batch * steps / (time.perf_counter() - t0))
    return best


def main():
    env_name = sys.argv[1] if len(sys.argv) > 1 else "ant_tag"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    cands = [int(x) for x in
             os.environ.get("SUBSTEPS_LIST", "10,8").split(",")]
    out = {}
    for ss in cands:
        v = bench_substeps(env_name, ss, batch, steps)
        out[str(ss)] = round(v, 1)
        print(json.dumps({"env": env_name, "substeps": ss,
                          "env_steps_per_s": round(v, 1)}), flush=True)
    ref = out[str(cands[0])]
    for ss in cands[1:]:
        print(json.dumps({"env": env_name,
                          "speedup_vs_substeps10": round(out[str(ss)] / ref, 4),
                          "substeps": ss}), flush=True)


if __name__ == "__main__":
    main()
