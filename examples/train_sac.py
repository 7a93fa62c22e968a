"""Train SAC on a registered env.

Usage: python examples/train_sac.py [env_name] [num_timesteps]
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from pobrax_tpu.envs import _envs  # noqa: E402
from pobrax_tpu.training import sac  # noqa: E402


def main(env_name="ant", num_timesteps=500_000):
    env = _envs[env_name]()

    def progress(steps, m):
        print(f"steps {steps:>10,}  reward {m['mean_reward']:+.3f}  "
              f"q_loss {m['q_loss']:.3f}  alpha {m['alpha']:.3f}  "
              f"sps {m['steps_per_second']:,.0f}")

    inference_fn, params, _ = sac.train(
        env, num_timesteps=num_timesteps, num_envs=128,
        episode_length=1000, replay_capacity=4096, batch_size=64,
        steps_per_epoch=32, min_replay=64, progress_fn=progress)

    key = jax.random.PRNGKey(1)
    obs = jnp.zeros((1, env.observation_size))
    act = inference_fn(params, obs, key, deterministic=True)
    print("trained; deterministic action on zero obs:", act[0][:4])


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "ant",
         int(sys.argv[2]) if len(sys.argv) > 2 else 500_000)
