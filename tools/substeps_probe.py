"""Substeps-retune stability probe (ROADMAP #2 / VERDICT-r4 next-step #2).

The measured substeps 10-vs-1 time ratio is only 1.68 (docs/PERFORMANCE.md
round-3 attribution), so halving base substeps (10 -> 5, i.e. the inner
spring-dynamics h_sub doubling 0.005 -> 0.01 s) plausibly buys double-digit
headline %. The open question is STABILITY: the semi-implicit spring joints
(physics/joints.py) and the Baumgarte contact impulses (geometry.py:296
divides by h_sub) were tuned at h_sub = 0.005.

This probe measures, on CPU (generic path), for each candidate
(substeps, stiffness_scale) pair on ant / ant_tag at the HAI action repeat:

  * nan fraction over a 64-env x 1000-control-step random rollout
  * torso z mean/p5/p95 (sagging joints or launch-offs move these)
  * done rate per step (termination band exits = instability blowups)
  * mean |joint angle| and mean speed (energy-injection check)

vs the substeps=10 production reference stats. A candidate is PLAUSIBLE if
nan==0 and the stats sit within a few % of reference; the decisive checks
(learning at matched budget + full-suite TPU A/B) run only for plausible
candidates. Reference semantics anchor for dt/substeps scaling:
/root/reference/po_brax/envs/wrappers.py:22-23.

Usage: python tools/substeps_probe.py [env_name] [batch] [steps]
"""

from __future__ import annotations

import dataclasses
import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, ".")

from pobrax_tpu.envs import HAI_ACTION_REPEAT, _envs  # noqa: E402
from pobrax_tpu.envs import wrappers  # noqa: E402
from pobrax_tpu.physics.system import System  # noqa: E402


def retuned_env(env_name: str, substeps: int, stiffness_scale: float = 1.0):
    """Core env with base substeps overridden (and, optionally, every
    joint's stiffness/damping scaled: k *= s, spring_damping *= sqrt(s) to
    hold the damping ratio, limit_strength follows k)."""
    env = _envs[env_name]()
    cfg = env._cfg
    joints = cfg.joints
    if stiffness_scale != 1.0:
        s = stiffness_scale
        joints = tuple(
            dataclasses.replace(
                j,
                stiffness=j.stiffness * s,
                spring_damping=(None if j.spring_damping is None
                                else j.spring_damping * s ** 0.5),
                limit_strength=(None if j.limit_strength is None
                                else j.limit_strength * s),
            )
            for j in joints)
    env._cfg = dataclasses.replace(cfg, substeps=substeps, joints=joints)
    env.sys = System(env._cfg)
    return env


def probe(env_name: str, substeps: int, stiffness_scale: float,
          batch: int, steps: int, seed: int = 0) -> dict:
    core = retuned_env(env_name, substeps, stiffness_scale)
    torso = getattr(core, "torso_idx", 0)
    env = wrappers.ActionRepeatWrapper(core, HAI_ACTION_REPEAT)
    env = wrappers.EpisodeWrapper(env, 1000, 1)
    env = wrappers.VmapWrapper(env, batch_size=batch)
    env = wrappers.RandomizedAutoResetWrapperNaive(env)
    asz = core.action_size

    def run(key):
        k_reset, key = jax.random.split(key)
        state = env.reset(jax.random.split(k_reset, batch))

        def body(carry, _):
            state, key = carry
            key, k = jax.random.split(key)
            act = jax.random.uniform(k, (batch, asz), minval=-1.0, maxval=1.0)
            state = env.step(state, act)
            z = state.qp.pos[:, torso, 2]
            ang_speed = jnp.mean(jnp.abs(state.qp.ang))
            speed = jnp.mean(jnp.linalg.norm(state.qp.vel, axis=-1))
            stats = (jnp.mean(jnp.float32(~jnp.isfinite(state.qp.pos))),
                     jnp.mean(z), jnp.percentile(z, 5), jnp.percentile(z, 95),
                     jnp.mean(state.done), speed, ang_speed)
            return (state, key), stats

        (_, _), stats = jax.lax.scan(body, (state, key), None, length=steps)
        return stats

    stats = jax.jit(run)(jax.random.PRNGKey(seed))
    nanfrac, zmean, z5, z95, done, speed, ang = [
        float(jnp.mean(s)) for s in stats]
    return {"env": env_name, "substeps": substeps,
            "stiffness_scale": stiffness_scale,
            "nan_frac": nanfrac, "z_mean": round(zmean, 4),
            "z_p5": round(z5, 4), "z_p95": round(z95, 4),
            "done_rate": round(done, 5), "speed": round(speed, 4),
            "ang_speed": round(ang, 4)}


def main():
    env_name = sys.argv[1] if len(sys.argv) > 1 else "ant_tag"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    candidates = [
        (10, 1.0),    # production reference
        (5, 1.0),     # plain halving (h_sub 0.01)
        (5, 0.5),     # soft retune
        (5, 0.25),    # h*omega-preserving retune
    ]
    out = []
    for substeps, scale in candidates:
        r = probe(env_name, substeps, scale, batch, steps)
        out.append(r)
        print(json.dumps(r), flush=True)
    ref = out[0]
    for r in out[1:]:
        ok = (r["nan_frac"] == 0.0
              and abs(r["z_mean"] - ref["z_mean"]) < 0.1 * max(ref["z_mean"], 0.1)
              and r["done_rate"] < 3 * max(ref["done_rate"], 1e-3))
        print(f"# substeps={r['substeps']} scale={r['stiffness_scale']}: "
              f"{'PLAUSIBLE' if ok else 'REJECT'}", flush=True)


if __name__ == "__main__":
    main()
