"""Train PPO on a PO env, checkpoint, and render an evaluation trajectory.

Usage: python examples/train_ppo.py [env_name] [num_timesteps]

Data-parallel over all visible devices via a ('data','model') mesh; on one
chip the same program runs on a 1-device mesh.
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from pobrax_tpu.envs import _envs  # noqa: E402
from pobrax_tpu.io import html  # noqa: E402
from pobrax_tpu.parallel import make_mesh  # noqa: E402
from pobrax_tpu.training import checkpoint, ppo  # noqa: E402


def main(env_name="ant_tag", num_timesteps=500_000):
    env = _envs[env_name]()
    mesh = make_mesh()

    def progress(steps, metrics):
        print(f"steps {steps:>10,}  reward {metrics['mean_reward']:+.3f}  "
              f"sps {metrics['steps_per_second']:,.0f}")

    inference_fn, params, _ = ppo.train(
        env, num_timesteps=num_timesteps, num_envs=1024,
        episode_length=1000, unroll_length=20,
        num_minibatches=16, num_update_epochs=4,
        mesh=mesh, progress_fn=progress)

    # evaluation rollout with the deterministic policy, rendered to HTML
    key = jax.random.PRNGKey(1)
    state = jax.jit(env.reset)(key)
    step = jax.jit(env.step)

    qps = [state.qp]
    for _ in range(300):
        act = inference_fn(params, state.obs, key, deterministic=True)
        state = step(state, act)
        qps.append(state.qp)
    html.save(f"{env_name}_eval.html", env.sys, qps)
    print(f"wrote {env_name}_eval.html")


if __name__ == "__main__":
    env_name = sys.argv[1] if len(sys.argv) > 1 else "ant_tag"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    main(env_name, steps)
