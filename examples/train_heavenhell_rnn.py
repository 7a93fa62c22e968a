"""Recurrent PPO on AntHeavenHell — the priest-memory task.

Heaven and hell swap sides every episode; the heaven direction appears in
the observation ONLY while the ant is within visible_radius of the priest
(reference ant_heavenhell.py:129-131). A memoryless policy entering an arm
can do no better than 50% heaven among completed episodes; a GRU can carry
the priest's bit from the junction to the arm.

Training uses privileged progress shaping toward heaven (training-time
only; the policy still cannot SEE which side is heaven without visiting
the priest, so following the shaped gradient requires the memory). Eval
reports, on the TRUE env: completion rate (episodes ending at either goal)
and heaven rate among completions.

Usage: python examples/train_heavenhell_rnn.py [num_timesteps] [num_envs]
"""

import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from pobrax_tpu.envs import HAI_ACTION_REPEAT, _envs  # noqa: E402
from pobrax_tpu.envs import wrappers  # noqa: E402
from pobrax_tpu.envs.base import Wrapper  # noqa: E402
from pobrax_tpu.training import ppo_rnn  # noqa: E402


class ShapedHeavenHell(Wrapper):
    """Training-time progress shaping toward the (privileged) heaven goal:
    r' = r + coef * (d_prev - d_new), d = ||ant_xy - heaven_xy||."""

    def __init__(self, env, coef=5.0):
        super().__init__(env)
        self.coef = coef

    def _dist(self, qp):
        u = self.unwrapped
        return jnp.linalg.norm(
            qp.pos[u.torso_idx, :2] - qp.pos[u.target_idx, :2])

    def step(self, state, action):
        d0 = self._dist(state.qp)
        nstate = self.env.step(state, action)
        d1 = self._dist(nstate.qp)
        return nstate.replace(reward=nstate.reward + self.coef * (d0 - d1))


def outcome_rates(env_core, act_fn, carry_init, episodes=256,
                  episode_length=1000, seed=0, action_repeat=1):
    """(completion_rate, heaven_rate | completed) on the TRUE env."""
    env = wrappers.ActionRepeatWrapper(env_core, action_repeat)
    env = wrappers.EpisodeWrapper(env, episode_length, 1)
    env = wrappers.VmapWrapper(env, batch_size=episodes)

    def run(key):
        k_reset, k_act = jax.random.split(key)
        state = env.reset(jax.random.split(k_reset, episodes))
        z = jnp.zeros(episodes)

        def body(c, _):
            state, carry, alive, heaven, hell, key = c
            key, k = jax.random.split(key)
            carry, act = act_fn(carry, state.obs, k)
            state = env.step(state, act)
            first_done = state.done * alive
            heaven = heaven + first_done * (state.reward > 0.5)
            hell = hell + first_done * (jnp.abs(state.reward + 1.0) < 0.25)
            alive = alive * (1.0 - state.done)
            return (state, carry, alive, heaven, hell, key), None

        (_, _, _, heaven, hell, _), _ = jax.lax.scan(
            body, (state, carry_init(episodes), jnp.ones(episodes), z, z,
                   k_act), None, length=episode_length)
        completed = heaven.sum() + hell.sum()
        return (completed / episodes,
                jnp.where(completed > 0, heaven.sum() / completed, 0.0))

    c, h = jax.jit(run)(jax.random.PRNGKey(seed))
    return float(c), float(h)


# HH_SUBSTEPS=8 validates the integrator fast preset (Env.retune_substeps,
# docs/PERFORMANCE.md round 5) at matched learning budget: trains on the
# retuned env, evaluates on BOTH the retuned and the TRUE substeps=10 env
# (transfer check). Results go to a _substeps-suffixed json.
SUBSTEPS = int(os.environ.get("HH_SUBSTEPS", "10"))


def _hh(substeps=None):
    env = _envs["ant_heavenhell"]()
    if (substeps or SUBSTEPS) != 10:
        env.retune_substeps(substeps or SUBSTEPS)
    return env


def main(num_timesteps=400_000_000, num_envs=2048):
    env = _envs["ant_heavenhell"]()
    rand_c, rand_h = outcome_rates(
        _envs["ant_heavenhell"](),
        lambda c, obs, k: (c, jax.random.uniform(
            k, obs.shape[:-1] + (env.action_size,), minval=-1.0, maxval=1.0)),
        carry_init=lambda n: jnp.zeros(n),
        action_repeat=HAI_ACTION_REPEAT)
    print(f"random: completion {rand_c:.3f}, heaven|completed {rand_h:.3f}",
          flush=True)

    history = []

    def progress(steps, metrics):
        history.append({"steps": steps,
                        "mean_reward": metrics.get("mean_reward")})
        if len(history) % 50 == 0:
            print(f"  {steps:>12,} steps  mean_reward="
                  f"{history[-1]['mean_reward']:+.4f}", flush=True)

    hidden = 128
    inference_fn, params, _ = ppo_rnn.train(
        ShapedHeavenHell(_hh(), coef=5.0),
        num_timesteps=num_timesteps,
        num_envs=num_envs,
        episode_length=1000,
        action_repeat=HAI_ACTION_REPEAT,
        unroll_length=32,
        num_minibatches=8,
        num_update_epochs=4,
        learning_rate=3e-4,
        entropy_cost=3e-3,
        discounting=0.97,
        reward_scaling=1.0,
        hidden_size=hidden,
        encoder_sizes=(256,),
        seed=0,
        progress_fn=progress,
    )

    det_c, det_h = outcome_rates(
        _hh(),
        lambda h, obs, k: inference_fn(params, h, obs, k, deterministic=True),
        carry_init=lambda n: jnp.zeros((n, hidden)),
        action_repeat=HAI_ACTION_REPEAT)
    sto_c, sto_h = outcome_rates(
        _hh(),
        lambda h, obs, k: inference_fn(params, h, obs, k),
        carry_init=lambda n: jnp.zeros((n, hidden)),
        action_repeat=HAI_ACTION_REPEAT, seed=1)
    print(f"GRU det:   completion {det_c:.3f}, heaven|completed {det_h:.3f}",
          flush=True)
    print(f"GRU stoch: completion {sto_c:.3f}, heaven|completed {sto_h:.3f}",
          flush=True)

    payload = {"num_timesteps": num_timesteps, "num_envs": num_envs,
               "substeps": SUBSTEPS,
               "random": {"completion": rand_c, "heaven": rand_h},
               "gru_det": {"completion": det_c, "heaven": det_h},
               "gru_stoch": {"completion": sto_c, "heaven": sto_h},
               "curve": history}
    if SUBSTEPS != 10:
        # transfer: the retuned-env policy evaluated on TRUE physics
        t_c, t_h = outcome_rates(
            _hh(substeps=10),
            lambda h, obs, k: inference_fn(params, h, obs, k,
                                           deterministic=True),
            carry_init=lambda n: jnp.zeros((n, hidden)),
            action_repeat=HAI_ACTION_REPEAT)
        payload["gru_det_on_true_substeps10"] = {"completion": t_c,
                                                 "heaven": t_h}
        print(f"GRU det on TRUE substeps=10 env: completion {t_c:.3f}, "
              f"heaven|completed {t_h:.3f}", flush=True)
    out = ("docs/learning_heavenhell_rnn.json" if SUBSTEPS == 10
           else f"docs/learning_heavenhell_rnn_substeps{SUBSTEPS}.json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    main(*args)
