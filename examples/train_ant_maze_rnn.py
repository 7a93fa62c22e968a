"""Recurrent PPO learns AntMaze — the fourth PO env's learning demo.

AntMaze is this framework's working build of what the reference's broken
ant_maze.py was evidently for (SURVEY.md §2.8): navigate a maze sensed
through an egocentric wall-range sensor to a goal whose direction is
visible only within `visible_radius`. Like the other PO tasks, the true
reward is terminal-sparse (goal_reward on arrival), so training uses
privileged potential-based progress shaping — but in a maze the euclidean
potential is WRONG: on maze 0's U-shaped corridor the straight line to
the goal points through the dividing wall, and progress shaping on
||xy - goal|| rewards pressing into it. `ShapedAntMaze` therefore shapes
on the GEODESIC (in-maze shortest-path) distance, precomputed host-side
by `maze_utils.geodesic_distance_field` and bilinearly interpolated
inside the jitted step. Evaluation reports the TRUE sparse goal rate on
the unshaped env, as for the other tasks (docs/LEARNING.md methodology).

Usage: python examples/train_ant_maze_rnn.py [num_timesteps] [num_envs]
"""

import os
import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from pobrax_tpu.envs import HAI_ACTION_REPEAT, _envs  # noqa: E402
from pobrax_tpu.envs import maze_utils, wrappers  # noqa: E402
from pobrax_tpu.envs.base import Wrapper  # noqa: E402
from pobrax_tpu.training import ppo_rnn  # noqa: E402


class ShapedAntMaze(Wrapper):
    """TRAINING-TIME geodesic progress shaping: r' = r + coef*(phi'-phi),
    phi = -geodesic_dist_to_goal(ant_xy). Pure progress form (shaping
    gamma = 1) for the measured reasons in examples/train_ant_tag.py."""

    def __init__(self, env, coef=1.0, subdivisions=5):
        super().__init__(env)
        self.coef = coef
        u = self.unwrapped
        structure = maze_utils.construct_maze(u.maze_id, u.length)
        if u._goals.shape[0] != 1:
            raise ValueError("geodesic shaping assumes a single-goal maze")
        field, x0, y0, res = maze_utils.geodesic_distance_field(
            structure, u.scaling, subdivisions)
        self._field = jnp.asarray(field)
        self._x0, self._y0, self._res = x0, y0, res

    def _phi(self, qp):
        u = self.unwrapped
        xy = qp.pos[u.torso_idx, :2]
        f = self._field
        a = (self._y0 - xy[1]) / self._res
        b = (xy[0] - self._x0) / self._res
        a = jnp.clip(a, 0.0, f.shape[0] - 1.001)
        b = jnp.clip(b, 0.0, f.shape[1] - 1.001)
        ia, ib = jnp.floor(a).astype(jnp.int32), jnp.floor(b).astype(jnp.int32)
        ta, tb = a - ia, b - ib
        v00 = f[ia, ib]
        v01 = f[ia, ib + 1]
        v10 = f[ia + 1, ib]
        v11 = f[ia + 1, ib + 1]
        d = ((1 - ta) * (1 - tb) * v00 + (1 - ta) * tb * v01
             + ta * (1 - tb) * v10 + ta * tb * v11)
        return -d

    def step(self, state, action):
        p0 = self._phi(state.qp)
        nstate = self.env.step(state, action)
        shaped = nstate.reward + self.coef * (self._phi(nstate.qp) - p0)
        return nstate.replace(reward=shaped)


def goal_rate_rnn(env_core, inference_fn, params, hidden_size, episodes=256,
                  episode_length=1000, seed=0, action_repeat=1,
                  deterministic=True):
    """Fraction of eval episodes ending AT THE GOAL (terminal reward
    +goal_reward; death at dying_cost and truncation do not count)."""
    env = wrappers.ActionRepeatWrapper(env_core, action_repeat)
    env = wrappers.EpisodeWrapper(env, episode_length, 1)
    env = wrappers.VmapWrapper(env, batch_size=episodes)

    def run(key):
        k_reset, k_act = jax.random.split(key)
        state = env.reset(jax.random.split(k_reset, episodes))
        h0 = jnp.zeros((episodes, hidden_size))

        def body(carry, _):
            state, h, alive, reached, key = carry
            key, k = jax.random.split(key)
            h, act = inference_fn(params, h, state.obs, k,
                                  deterministic=deterministic)
            state = env.step(state, act)
            hit = state.done * alive * (state.reward > 1.0)
            reached = jnp.maximum(reached, hit)
            alive = alive * (1.0 - state.done)
            return (state, h, alive, reached, key), None

        (_, _, _, reached, _), _ = jax.lax.scan(
            body, (state, h0, jnp.ones(episodes), jnp.zeros(episodes), k_act),
            None, length=episode_length)
        return reached.mean()

    return float(jax.jit(run)(jax.random.PRNGKey(seed)))


def goal_rate_random(env_core, episodes=256, episode_length=1000, seed=0,
                     action_repeat=1):
    asz = env_core.action_size
    env = wrappers.ActionRepeatWrapper(env_core, action_repeat)
    env = wrappers.EpisodeWrapper(env, episode_length, 1)
    env = wrappers.VmapWrapper(env, batch_size=episodes)

    def run(key):
        k_reset, k_act = jax.random.split(key)
        state = env.reset(jax.random.split(k_reset, episodes))

        def body(carry, _):
            state, alive, reached, key = carry
            key, k = jax.random.split(key)
            act = jax.random.uniform(k, (episodes, asz), minval=-1.0,
                                     maxval=1.0)
            state = env.step(state, act)
            hit = state.done * alive * (state.reward > 1.0)
            reached = jnp.maximum(reached, hit)
            alive = alive * (1.0 - state.done)
            return (state, alive, reached, key), None

        (_, _, reached, _), _ = jax.lax.scan(
            body, (state, jnp.ones(episodes), jnp.zeros(episodes), k_act),
            None, length=episode_length)
        return reached.mean()

    return float(jax.jit(run)(jax.random.PRNGKey(seed)))


def main(num_timesteps=400_000_000, num_envs=2048,
         checkpoint_dir="/tmp/ant_maze_rnn_ckpt"):
    rand = goal_rate_random(_envs["ant_maze"](),
                            action_repeat=HAI_ACTION_REPEAT)
    print(f"random-policy goal rate: {rand:.3f}", flush=True)

    history = []

    def progress(steps, metrics):
        history.append({"steps": steps,
                        "mean_reward": metrics.get("mean_reward")})
        if len(history) % 20 == 0:
            print(f"  {steps:>12,} steps  mean_reward="
                  f"{history[-1]['mean_reward']:+.4f}", flush=True)

    hidden = 128
    inference_fn, params, _ = ppo_rnn.train(
        ShapedAntMaze(_envs["ant_maze"](), coef=5.0),
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
        epochs_per_call=8,
        autoreset_mode="cached",
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=50_000_000,
        seed=int(os.environ.get("MAZE_SEED", "0")),
        progress_fn=progress,
    )

    results = {}
    for det in (True, False):
        r = goal_rate_rnn(_envs["ant_maze"](), inference_fn, params, hidden,
                          action_repeat=HAI_ACTION_REPEAT,
                          deterministic=det)
        results["det" if det else "stoch"] = r
        print(f"GRU goal rate ({'det' if det else 'stoch'}): {r:.3f} "
              f"(random: {rand:.3f})", flush=True)

    # seed-suffixed default so robustness reruns never clobber the
    # canonical seed-0 record (same convention as the gather script)
    seed = int(os.environ.get("MAZE_SEED", "0"))
    out = os.environ.get(
        "MAZE_OUT", "docs/learning_ant_maze_rnn"
        + (f"_seed{seed}" if seed != 0 else "") + ".json")
    with open(out, "w") as f:
        json.dump({"num_timesteps": num_timesteps, "num_envs": num_envs,
                   "hidden_size": hidden, "seed": seed,
                   "random_goal_rate": rand,
                   "results": results, "curve": history[::10]}, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    main(*args)
