"""Quantify the cached-autoreset state-distribution effect vs naive.

`RandomizedAutoResetWrapperCachedOnDevice` (the bench + training default)
restarts a finished env from its CACHED freshly-sampled state, and the
whole batch's cache re-randomizes every `refresh_every` steps on one
shared clock. Between refreshes an env slot that finishes repeatedly
restarts from the SAME state — for AntHeavenHell that freezes the
heaven/hell side assignment of that slot until the next refresh.

This script measures the effect on AntHeavenHell (worst case: episodes
much shorter than the refresh window):
  * swap_rate      — fraction of consecutive episode starts (per slot)
                     whose heaven side differs (naive expectation: 0.5)
  * heaven_balance — overall fraction of episode starts with heaven on
                     the right (both modes should stay ~0.5: no side BIAS,
                     only temporal correlation)
  * distinct_rate  — fraction of resets that load a different state than
                     the slot's previous reset (side or spawn xy moved)

Run: python tools/autoreset_study.py [episode_length] [steps]
(defaults 50 / 1000 — ~20 episodes per slot, refresh window 200 spans ~4
episodes, so the cached correlation is clearly visible)
Prints one JSON line per mode.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("STUDY_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")


def run_mode(mode: str, episode_length: int, steps: int, batch: int = 64,
             seed: int = 0):
    from pobrax_tpu.envs import create

    env = create("ant_heavenhell", episode_length=episode_length,
                 batch_size=batch, auto_reset=True,
                 randomized_autoreset=True, autoreset_mode=mode)
    tgt = env.unwrapped.target_idx
    torso = env.unwrapped.torso_idx
    action_size = env.action_size

    def rollout(state, key):
        def body(carry, _):
            state, key = carry
            key, k = jax.random.split(key)
            a = jax.random.uniform(k, (batch, action_size),
                                   minval=-1.0, maxval=1.0)
            state = env.step(state, a)
            # post-step (post-autoreset-where-done) snapshot
            out = (state.done,
                   jnp.sign(state.qp.pos[:, tgt, 0]),
                   state.qp.pos[:, torso, :2])
            return (state, key), out

        return jax.lax.scan(body, (state, key), None, length=steps)[1]

    key = jax.random.PRNGKey(seed)
    state = jax.jit(env.reset)(jax.random.split(key, batch))
    init_side = np.sign(np.asarray(state.qp.pos[:, tgt, 0]))
    init_xy = np.asarray(state.qp.pos[:, torso, :2])
    done, side, xy = jax.jit(rollout)(state, key)
    done = np.asarray(done)          # (T, B)
    side = np.asarray(side)          # (T, B)
    xy = np.asarray(xy)              # (T, B, 2)

    swaps = same = distinct = resets = 0
    heaven_right = total_eps = 0
    for b in range(batch):
        prev_side, prev_xy = init_side[b], init_xy[b]
        heaven_right += prev_side > 0
        total_eps += 1
        for t in range(done.shape[0]):
            if done[t, b]:
                # step t's post-state IS the new episode's start
                s, p = side[t, b], xy[t, b]
                resets += 1
                total_eps += 1
                heaven_right += s > 0
                if s != prev_side:
                    swaps += 1
                else:
                    same += 1
                if s != prev_side or np.linalg.norm(p - prev_xy) > 1e-5:
                    distinct += 1
                prev_side, prev_xy = s, p
    return {
        "mode": mode, "episode_length": episode_length, "steps": steps,
        "batch": batch, "episodes": int(total_eps), "resets": int(resets),
        "swap_rate": round(swaps / max(resets, 1), 4),
        "heaven_balance": round(heaven_right / max(total_eps, 1), 4),
        "distinct_reset_rate": round(distinct / max(resets, 1), 4),
    }


if __name__ == "__main__":
    episode_length = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    for mode in ("naive", "cached"):
        print(json.dumps(run_mode(mode, episode_length, steps)), flush=True)
