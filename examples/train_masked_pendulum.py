"""Memory vs no-memory on a PURE partial-observability task.

masked_inverted_pendulum hides the VELOCITY segment (the obs-mask layer the
reference ships tables for): the policy sees cart/pole positions only. A
feedforward policy cannot distinguish a pole falling left from one swinging
right through the same angle; a GRU can estimate velocity from consecutive
positions. This is the budget-friendly demonstration that the recurrent
learner (training/ppo_rnn.py) actually exploits memory — unlike AntTag,
locomotion skill is not a confound.

Trains BOTH learners on the identical masked env and reports mean episode
length (cap = episode_length) of the deterministic policies, plus the
full-obs feedforward reference. Results -> docs/learning_masked_pendulum.json.

Usage: python examples/train_masked_pendulum.py [num_timesteps]
"""

import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from pobrax_tpu.envs import _envs  # noqa: E402
from pobrax_tpu.envs import wrappers  # noqa: E402
from pobrax_tpu.envs.masked import MaskedObservationWrapper  # noqa: E402
from pobrax_tpu.training import ppo, ppo_rnn  # noqa: E402

EPISODE_LENGTH = 500


def masked_env():
    return MaskedObservationWrapper(
        _envs["inverted_pendulum"](), env_name="inverted_pendulum",
        hidden=("VELOCITY",))


def mean_length(env_core, act_fn, carry_init=None, episodes=256, seed=0):
    """Mean steps survived (cap EPISODE_LENGTH), deterministic policy.
    act_fn(carry, obs, key) -> (carry, action); carry_init=None for
    stateless policies."""
    env = wrappers.EpisodeWrapper(env_core, EPISODE_LENGTH, 1)
    env = wrappers.VmapWrapper(env, batch_size=episodes)

    def run(key):
        k_reset, k_act = jax.random.split(key)
        state = env.reset(jax.random.split(k_reset, episodes))
        carry0 = carry_init(episodes) if carry_init else jnp.zeros(episodes)
        alive0 = jnp.ones(episodes)

        def body(c, _):
            state, carry, alive, length, key = c
            key, k = jax.random.split(key)
            carry, act = act_fn(carry, state.obs, k)
            state = env.step(state, act)
            length = length + alive
            alive = alive * (1.0 - state.done)
            return (state, carry, alive, length, key), None

        (_, _, _, length, _), _ = jax.lax.scan(
            body, (state, carry0, alive0, jnp.zeros(episodes), k_act),
            None, length=EPISODE_LENGTH)
        return length.mean()

    return float(jax.jit(run)(jax.random.PRNGKey(seed)))


def main(num_timesteps=20_000_000):
    common = dict(
        num_timesteps=num_timesteps, num_envs=1024,
        episode_length=EPISODE_LENGTH, unroll_length=32,
        num_update_epochs=4, learning_rate=3e-4, entropy_cost=1e-2,
        discounting=0.97, reward_scaling=1.0, seed=0,
        progress_fn=lambda s, m: None)

    results = {}

    # feedforward on the FULL observation — the skill ceiling
    ff_full_inf, ff_full_params, _ = ppo.train(
        _envs["inverted_pendulum"](), num_minibatches=32, **common)
    results["feedforward_full_obs"] = mean_length(
        _envs["inverted_pendulum"](),
        lambda c, obs, k: (c, ff_full_inf(ff_full_params, obs, k,
                                          deterministic=True)))
    print(f"feedforward, full obs:   {results['feedforward_full_obs']:.1f}",
          flush=True)

    # feedforward on the MASKED observation — the PO gap
    ff_inf, ff_params, _ = ppo.train(masked_env(), num_minibatches=32, **common)
    results["feedforward_masked"] = mean_length(
        masked_env(),
        lambda c, obs, k: (c, ff_inf(ff_params, obs, k, deterministic=True)))
    print(f"feedforward, masked:     {results['feedforward_masked']:.1f}",
          flush=True)

    # GRU on the MASKED observation — memory closes the gap
    hidden = 64
    rnn_inf, rnn_params, _ = ppo_rnn.train(
        masked_env(), num_minibatches=8, hidden_size=hidden,
        encoder_sizes=(64,), **common)
    results["gru_masked"] = mean_length(
        masked_env(),
        lambda h, obs, k: rnn_inf(rnn_params, h, obs, k, deterministic=True),
        carry_init=lambda n: jnp.zeros((n, hidden)))
    print(f"GRU, masked:             {results['gru_masked']:.1f}", flush=True)

    results["episode_cap"] = EPISODE_LENGTH
    results["num_timesteps"] = num_timesteps
    with open("docs/learning_masked_pendulum.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote docs/learning_masked_pendulum.json", flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:2]]
    main(*args)
