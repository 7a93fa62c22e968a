"""Memory vs no-memory on a masked LOCOMOTION body (VERDICT-r4 #8).

masked_ant hides the VELOCITY segment (obs[13:27] — the reference's
standard_observability_masks.py:24-39 table, reproduced in envs/masks.py):
the policy sees joint/torso positions and contact forces but no rates. A
feedforward policy cannot tell a leg swinging forward from one swinging
back through the same pose; a GRU can estimate rates from consecutive
frames. This extends the controlled masked-pendulum memory study
(examples/train_masked_pendulum.py, docs/learning_masked_pendulum.json)
to a locomotion body — the L8 mask layer's real use-case.

Trains three arms at identical small budget and evaluates each
deterministic policy's mean EPISODE REWARD and torso X-DISPLACEMENT on
its own observation regime (full-obs ceiling, masked feedforward gap,
masked GRU recovery). Results -> docs/learning_masked_ant.json.

Usage: python examples/train_masked_ant.py [num_timesteps] [num_envs]
"""

import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from pobrax_tpu.envs import _envs  # noqa: E402
from pobrax_tpu.envs import wrappers  # noqa: E402
from pobrax_tpu.envs.masked import MaskedObservationWrapper  # noqa: E402
from pobrax_tpu.training import ppo, ppo_rnn  # noqa: E402

EPISODE_LENGTH = 1000
ENV_NAME = os.environ.get("MASKED_ENV", "ant")


def masked_env():
    return MaskedObservationWrapper(
        _envs[ENV_NAME](), env_name=ENV_NAME, hidden=("VELOCITY",))


def eval_policy(env_core, act_fn, carry_init=None, episodes=256, seed=0):
    """Mean episode reward + torso x-displacement, deterministic policy."""
    env = wrappers.EpisodeWrapper(env_core, EPISODE_LENGTH, 1)
    env = wrappers.VmapWrapper(env, batch_size=episodes)
    torso = getattr(env_core, "torso_idx", 0)

    def run(key):
        k_reset, k_act = jax.random.split(key)
        state = env.reset(jax.random.split(k_reset, episodes))
        x0 = state.qp.pos[:, torso, 0]
        carry0 = carry_init(episodes) if carry_init else jnp.zeros(episodes)

        def body(c, _):
            state, carry, alive, ret, xlast, key = c
            key, k = jax.random.split(key)
            carry, act = act_fn(carry, state.obs, k)
            state = env.step(state, act)
            ret = ret + alive * state.reward
            xlast = jnp.where(alive > 0, state.qp.pos[:, torso, 0], xlast)
            alive = alive * (1.0 - state.done)
            return (state, carry, alive, ret, xlast, key), None

        z = jnp.zeros(episodes)
        (_, _, _, ret, xlast, _), _ = jax.lax.scan(
            body, (state, carry0, jnp.ones(episodes), z, x0, k_act),
            None, length=EPISODE_LENGTH)
        return ret.mean(), (xlast - x0).mean()

    r, dx = jax.jit(run)(jax.random.PRNGKey(seed))
    return {"episode_reward": float(r), "x_displacement": float(dx)}


def main(num_timesteps=100_000_000, num_envs=2048):
    common = dict(
        num_timesteps=num_timesteps, num_envs=num_envs,
        episode_length=EPISODE_LENGTH, unroll_length=32,
        num_update_epochs=4, learning_rate=3e-4, entropy_cost=1e-2,
        discounting=0.97, reward_scaling=1.0,
        seed=int(os.environ.get("MASKED_SEED", "0")),
        progress_fn=lambda s, m: None)

    results = {}

    ff_full_inf, ff_full_params, _ = ppo.train(
        _envs[ENV_NAME](), num_minibatches=32, **common)
    results["feedforward_full_obs"] = eval_policy(
        _envs[ENV_NAME](),
        lambda c, obs, k: (c, ff_full_inf(ff_full_params, obs, k,
                                          deterministic=True)))
    print(f"feedforward, full obs:  {results['feedforward_full_obs']}",
          flush=True)

    ff_inf, ff_params, _ = ppo.train(masked_env(), num_minibatches=32,
                                     **common)
    results["feedforward_masked"] = eval_policy(
        masked_env(),
        lambda c, obs, k: (c, ff_inf(ff_params, obs, k, deterministic=True)))
    print(f"feedforward, masked:    {results['feedforward_masked']}",
          flush=True)

    hidden = 128
    rnn_inf, rnn_params, _ = ppo_rnn.train(
        masked_env(), num_minibatches=8, hidden_size=hidden,
        encoder_sizes=(256,), **common)
    results["gru_masked"] = eval_policy(
        masked_env(),
        lambda h, obs, k: rnn_inf(rnn_params, h, obs, k, deterministic=True),
        carry_init=lambda n: jnp.zeros((n, hidden)))
    print(f"GRU, masked:            {results['gru_masked']}", flush=True)

    results.update(env=ENV_NAME, hidden=("VELOCITY",),
                   num_timesteps=num_timesteps, num_envs=num_envs,
                   episode_cap=EPISODE_LENGTH)
    out = os.environ.get("MASKED_OUT", f"docs/learning_masked_{ENV_NAME}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:3]])
