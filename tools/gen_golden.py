"""Regenerate the event-crossing golden fixtures (tests/golden/*.npz).

Usage (CPU, generic path — the numerics the fixtures lock):

    POBRAX_FUSED=0 python tools/gen_golden.py

Unlike the original 20-step goldens (po_envs_seed7.npz, kept as-is), these
windows are T=120 with env parameters chosen so the task-logic branches most
likely to regress FIRE inside the locked window: tag events (big
tag_radius), heaven/hell entry (big visible_radius), gather catches +
waiting-area teleports (big catch_range), episode truncation + randomized
autoreset for every env. Regenerate deliberately after any intended numerics
change; never loosen the bit-exact assert to allclose.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")
os.environ.setdefault("POBRAX_FUSED", "0")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from pobrax_tpu.envs import create

T = 120
SEED = 7
# name -> (event-forcing kwargs, episode_length)
SPECS = {
    "ant_tag": (dict(tag_radius=8.0), 30),
    "ant_heavenhell": (dict(visible_radius=9.0), 30),
    "ant_gather": (dict(catch_range=5.0), 30),
    "ant_maze": (dict(), 40),
    "halfcheetah": (dict(), 40),
}
OUT = os.path.join(os.path.dirname(__file__), os.pardir,
                   "tests", "golden", "po_envs_events_seed7.npz")


def rollout(name: str, kwargs: dict, episode_length: int):
    env = create(name, episode_length=episode_length, auto_reset=True,
                 randomized_autoreset=True, **kwargs)
    key = jax.random.PRNGKey(SEED)
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


def main() -> None:
    out = {}
    for name, (kwargs, ep_len) in SPECS.items():
        obs, rew, done = rollout(name, kwargs, ep_len)
        print(f"{name:16s} T={len(rew)} dones={int(done.sum())} "
              f"reward[min,max]=[{rew.min():.2f},{rew.max():.2f}]")
        out[f"{name}_obs"] = obs
        out[f"{name}_rew"] = rew
        out[f"{name}_done"] = done
    np.savez_compressed(OUT, **out)
    print("wrote", os.path.abspath(OUT))


if __name__ == "__main__":
    main()
