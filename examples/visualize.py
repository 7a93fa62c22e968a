"""Render a random-policy trajectory of any registered env to HTML.

The framework-native replacement for the reference's notebook workflow
(run N steps, `brax.io.html.render`, eyeball it — SURVEY.md §4 item 2).

Usage: python examples/visualize.py [env_name] [steps] [out.html]
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from pobrax_tpu.envs import _envs  # noqa: E402
from pobrax_tpu.io import html  # noqa: E402


def main(env_name="ant_tag", steps=300, out=None):
    env = _envs[env_name]()
    key = jax.random.PRNGKey(0)
    state = jax.jit(env.reset)(key)

    def rollout(state, key):
        def body(carry, _):
            state, key = carry
            key, k = jax.random.split(key)
            a = jax.random.uniform(k, (env.action_size,), minval=-1.0, maxval=1.0)
            state = env.step(state, a)
            return (state, key), state.qp
        return jax.lax.scan(body, (state, key), None, length=steps)

    (_, _), qps = jax.jit(rollout)(state, key)
    out = out or f"{env_name}_random.html"
    html.save(out, env.sys, qps)  # batched-over-time QP is accepted
    print(f"wrote {out} ({steps} frames)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "ant_tag",
         int(sys.argv[2]) if len(sys.argv) > 2 else 300,
         sys.argv[3] if len(sys.argv) > 3 else None)
