"""Cross-implementation fixed-seed comparison against the reference po-brax.

BASELINE.json configs 1-3 call for bit-exact AntHeavenHell/AntTag/AntGather
rollouts vs the reference. The reference's physics lives in external
`brax>=0.0.12`, which is NOT installed in the build container, so this
comparison cannot run there; this tool is the executable pathway for any
environment that has it:

    pip install brax==0.0.12 gym==0.21 protobuf==3.20
    python tools/compare_reference.py ant_tag --steps 100 --seed 7

It constructs both envs, drives them with the same action sequence from the
same PRNG key, and reports per-step max |obs diff| / reward diff / done
mismatches. Exact agreement additionally requires matching float32 op order
inside brax's engine; the realistic acceptance gate is trajectory
equivalence within float32 drift (SURVEY.md §7 item 3's pragmatic
fallback), tightened as discrepancies are root-caused.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def run_ours(env_name: str, steps: int, seed: int):
    import jax
    import jax.numpy as jnp

    from pobrax_tpu.envs import create

    env = create(env_name, episode_length=steps + 1, auto_reset=False)
    key = jax.random.PRNGKey(seed)
    state = jax.jit(env.reset)(key)

    def roll(state, key):
        def body(carry, _):
            state, key = carry
            key, k = jax.random.split(key)
            a = jax.random.uniform(k, (env.action_size,), minval=-1.0, maxval=1.0)
            state = env.step(state, a)
            return (state, key), (state.obs, state.reward, state.done, a)
        return jax.lax.scan(body, (state, key), None, length=steps)

    (_, _), (obs, rew, done, acts) = jax.jit(roll)(state, key)
    return (np.asarray(state.obs), np.asarray(obs), np.asarray(rew),
            np.asarray(done), np.asarray(acts))


def run_reference(env_name: str, steps: int, seed: int, actions: np.ndarray):
    try:
        import brax  # noqa: F401
    except ImportError:
        print("reference brax is not installed in this environment; "
              "see the module docstring for the required pins.")
        sys.exit(2)
    sys.path.insert(0, "/root/reference")
    import jax
    from po_brax.envs import create as ref_create

    env = ref_create(env_name, episode_length=steps + 1, auto_reset=False)
    import jax.numpy as jnp
    state = jax.jit(env.reset)(jax.random.PRNGKey(seed))
    obs0 = np.asarray(state.obs)
    step = jax.jit(env.step)
    obs, rew, done = [], [], []
    for t in range(steps):
        state = step(state, jnp.asarray(actions[t]))
        obs.append(np.asarray(state.obs))
        rew.append(float(state.reward))
        done.append(float(state.done))
    return obs0, np.stack(obs), np.asarray(rew), np.asarray(done)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("env", choices=["ant_tag", "ant_heavenhell", "ant_gather"])
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    obs0, obs, rew, done, acts = run_ours(args.env, args.steps, args.seed)
    r_obs0, r_obs, r_rew, r_done = run_reference(
        args.env, args.steps, args.seed, acts)

    d0 = np.abs(obs0 - r_obs0).max()
    dt = np.abs(obs - r_obs).max(axis=1)
    print(f"reset obs  max|diff| = {d0:.3e}")
    print(f"rollout    max|diff| = {dt.max():.3e} (worst step {int(dt.argmax())})")
    print(f"reward     max|diff| = {np.abs(rew - r_rew).max():.3e}")
    print(f"done mismatches      = {int((done != r_done).sum())}/{args.steps}")


if __name__ == "__main__":
    main()
