"""Cross-implementation trajectory parity: record/replay fixture protocol.

BASELINE.json configs 1-3 call for bit-exact AntHeavenHell/AntTag/AntGather
fixed-seed rollouts vs the reference po-brax. The reference's physics lives
in external `brax>=0.0.12`, which is NOT installed in the build container —
but its TASK LOGIC is pure Python in /root/reference, and tools/brax_shim
provides a brax-v0 compatibility layer backed by our engine, so
`--impl reference` runs the reference's LITERAL env code in-container
(shared physics, their reset/step/obs/reward code). The fixture protocol
decouples the two sides:

  dump    — roll out an env (either implementation) and record
            (reset_obs, obs[T], reward[T], done[T], actions[T]) plus
            metadata to a .npz fixture:

              # here (our side), or anywhere:
              python tools/compare_reference.py dump ant_tag \
                  --steps 100 --seed 7 --impl ours --out ant_tag_s7.npz

              # reference task logic via the brax shim (in-container), or on
              # any machine with real brax==0.0.12 installed ahead of the shim:
              python tools/compare_reference.py dump ant_tag \
                  --steps 100 --seed 7 --impl reference --out ref_ant_tag_s7.npz

  replay  — re-run OUR implementation against a fixture's recorded action
            sequence and seed, and report/assert the deltas:

              python tools/compare_reference.py replay ref_ant_tag_s7.npz --tol 1e-5

  compare — live mode: run both implementations in-process and diff directly.

The committed fixtures under tests/fixtures/ are of BOTH kinds: `*_ours.npz`
self-dumps (replayed bit-exact) and `ref_*.npz` reference-side dumps whose
trajectories were produced by the reference's own env code (replayed at the
float32 cross-program drift gate) — see tests/test_replay_fixtures.py.

Actions are stored as data (not re-derived from PRNG), so replay only
requires the env's internal PRNG consumption to match — which is exactly the
quirk-parity surface (rng3 reuse, ant_indices including Ground, etc.) the
envs reproduce deliberately. The realistic acceptance gate vs the reference
is trajectory equivalence within float32 drift (SURVEY.md §7 item 3),
tightened as discrepancies are root-caused.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")

FIXTURE_VERSION = 1


def run_ours(env_name: str, steps: int, seed: int, actions=None):
    """Rollout of our implementation; samples uniform actions when none are
    given (recording them), else replays the provided sequence."""
    import jax
    import jax.numpy as jnp

    from pobrax_tpu.envs import create

    env = create(env_name, episode_length=steps + 1, auto_reset=False)
    key = jax.random.PRNGKey(seed)
    state = jax.jit(env.reset)(key)

    if actions is None:
        def roll(state, key):
            def body(carry, _):
                state, key = carry
                key, k = jax.random.split(key)
                a = jax.random.uniform(
                    k, (env.action_size,), minval=-1.0, maxval=1.0)
                state = env.step(state, a)
                return (state, key), (state.obs, state.reward, state.done, a)
            return jax.lax.scan(body, (state, key), None, length=steps)

        (_, _), (obs, rew, done, acts) = jax.jit(roll)(state, key)
    else:
        acts = jnp.asarray(actions)

        def roll(state, acts):
            def body(state, a):
                state = env.step(state, a)
                return state, (state.obs, state.reward, state.done)
            return jax.lax.scan(body, state, acts)

        _, (obs, rew, done) = jax.jit(roll)(state, acts)

    return (np.asarray(state.obs), np.asarray(obs), np.asarray(rew),
            np.asarray(done), np.asarray(acts))


def run_reference(env_name: str, steps: int, seed: int, actions=None):
    """Rollout of the reference's LITERAL env code on our engine.

    tools/brax_shim makes `import brax` resolve to a compatibility layer
    backed by pobrax_tpu (real protobuf Config, our System/QP/jumpy/math),
    so /root/reference/po_brax/envs/{ant_tag,ant_heavenhell,ant_gather}.py
    run unmodified: reset sampling, RNG threading, adversary FSM, sensor
    binning, reward/done are all the reference's own code. Physics is shared
    (both sides call the same engine), which is exactly what makes the dump
    a TASK-LOGIC parity oracle — any divergence isolates to the env layer.

    The raw env is used without wrappers: the reference's create() stack
    (ActionRepeat k=1 + EpisodeWrapper) is trajectory-neutral for
    T < episode_length (/root/reference/po_brax/envs/__init__.py:59-62 —
    ActionRepeat with k=1 leaves dt/substeps unchanged, EpisodeWrapper only
    forces done at the budget), matching run_ours' episode_length=steps+1.
    """
    import jax
    import jax.numpy as jnp

    from tools.brax_shim import loader

    env = loader.make_reference_env(env_name)
    key = jax.random.PRNGKey(seed)
    state = jax.jit(env.reset)(key)
    obs0 = np.asarray(state.obs)
    if actions is None:
        # identical sampling scheme to run_ours, so both sides see the same
        # action sequence for a given seed
        acts = []
        k = key
        for _ in range(steps):
            k, ka = jax.random.split(k)
            acts.append(np.asarray(jax.random.uniform(
                ka, (env.action_size,), minval=-1.0, maxval=1.0)))
        actions = np.stack(acts)
    step = jax.jit(env.step)
    obs, rew, done = [], [], []
    for t in range(steps):
        state = step(state, jnp.asarray(actions[t]))
        obs.append(np.asarray(state.obs))
        rew.append(float(state.reward))
        done.append(float(state.done))
    return obs0, np.stack(obs), np.asarray(rew), np.asarray(done), actions


def dump(env_name: str, steps: int, seed: int, impl: str, out: str) -> None:
    runner = run_ours if impl == "ours" else run_reference
    obs0, obs, rew, done, acts = runner(env_name, steps, seed)
    if impl == "ours":
        # re-record through the actions-as-input program — the one replay
        # uses — so replays are bit-exact (the action-SAMPLING scan is a
        # different XLA program and may reassociate ~1e-7 differently)
        obs0, obs, rew, done, _ = run_ours(env_name, steps, seed,
                                           actions=acts)
    np.savez_compressed(
        out,
        meta=json.dumps({
            "version": FIXTURE_VERSION, "env": env_name, "steps": steps,
            "seed": seed, "impl": impl,
        }),
        reset_obs=obs0, obs=obs, reward=rew, done=done, actions=acts)
    print(f"wrote {out}: {impl} {env_name} seed={seed} T={steps} "
          f"obs={obs.shape}")


def replay(path: str, tol: float) -> int:
    """Replay a fixture against our implementation; returns #failures."""
    fx = np.load(path)
    meta = json.loads(str(fx["meta"]))
    obs0, obs, rew, done, _ = run_ours(
        meta["env"], meta["steps"], meta["seed"], actions=fx["actions"])

    d0 = float(np.abs(obs0 - fx["reset_obs"]).max())
    dt = np.abs(obs - fx["obs"]).max(axis=1)
    dr = float(np.abs(rew - fx["reward"]).max())
    dd = int((done != fx["done"]).sum())
    print(f"fixture {path} ({meta['impl']} {meta['env']} seed={meta['seed']})")
    print(f"  reset obs  max|diff| = {d0:.3e}")
    print(f"  rollout    max|diff| = {dt.max():.3e} "
          f"(worst step {int(dt.argmax())})")
    print(f"  reward     max|diff| = {dr:.3e}")
    print(f"  done mismatches      = {dd}/{meta['steps']}")
    failures = int(d0 > tol) + int(dt.max() > tol) + int(dr > tol) + int(dd > 0)
    print("  PASS" if failures == 0 else f"  FAIL (tol={tol})")
    return failures


def compare(env_name: str, steps: int, seed: int) -> None:
    obs0, obs, rew, done, acts = run_ours(env_name, steps, seed)
    r_obs0, r_obs, r_rew, r_done, _ = run_reference(
        env_name, steps, seed, actions=acts)
    d0 = np.abs(obs0 - r_obs0).max()
    dt = np.abs(obs - r_obs).max(axis=1)
    print(f"reset obs  max|diff| = {d0:.3e}")
    print(f"rollout    max|diff| = {dt.max():.3e} (worst step {int(dt.argmax())})")
    print(f"reward     max|diff| = {np.abs(rew - r_rew).max():.3e}")
    print(f"done mismatches      = {int((done != r_done).sum())}/{steps}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    # the three PO envs are the BASELINE bit-exactness targets; any other
    # registry env may also be dumped/replayed (ours-side locks)
    envs = ["ant_tag", "ant_heavenhell", "ant_gather"]
    p = sub.add_parser("dump")
    p.add_argument("env")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--impl", choices=["ours", "reference"], default="ours")
    p.add_argument("--out", required=True)

    p = sub.add_parser("replay")
    p.add_argument("fixture")
    p.add_argument("--tol", type=float, default=1e-5)

    p = sub.add_parser("compare")
    p.add_argument("env", choices=envs)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--seed", type=int, default=7)

    args = ap.parse_args()
    # fixtures are CPU artifacts: the committed ones were recorded on the CPU
    # backend and the test suite replays them there (tests/conftest.py)
    import jax
    jax.config.update("jax_platforms", "cpu")
    if args.cmd == "dump":
        dump(args.env, args.steps, args.seed, args.impl, args.out)
    elif args.cmd == "replay":
        sys.exit(1 if replay(args.fixture, args.tol) else 0)
    else:
        compare(args.env, args.steps, args.seed)


if __name__ == "__main__":
    main()
