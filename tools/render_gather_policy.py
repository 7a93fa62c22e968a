"""Render the TRAINED AntGather GRU policy to an offline HTML sample.

Restores the ppo_rnn sensor-range-curriculum checkpoint
(checkpoints/ant_gather_rnn_800M — the run recorded in
docs/learning_gather_rnn_curriculum.json: 6.09 apples det, net +2.88)
and rolls one deterministic episode on the TRUE env, reporting the
apples/bombs caught in the rendered window.

Usage: python tools/render_gather_policy.py [out.html] [ckpt_dir]
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from pobrax_tpu.envs import HAI_ACTION_REPEAT, _envs, wrappers  # noqa: E402
from pobrax_tpu.io import html  # noqa: E402
from pobrax_tpu.training import checkpoint as ckpt  # noqa: E402
from pobrax_tpu.training import ppo_rnn  # noqa: E402

HIDDEN = 128  # must match examples/train_ant_gather_rnn.py


def main(out="docs/samples/ant_gather_trained.html",
         ckpt_dir="checkpoints/ant_gather_rnn_800M", steps=500):
    core = _envs["ant_gather"]()
    env = wrappers.ActionRepeatWrapper(core, HAI_ACTION_REPEAT)
    env = wrappers.EpisodeWrapper(env, 1000, 1)
    env = wrappers.VmapWrapper(env, batch_size=1)

    cfg = ppo_rnn.RNNPPOConfig(num_envs=8, num_minibatches=8,
                               hidden_size=HIDDEN, encoder_sizes=(256,))
    learner = ppo_rnn.RNNPPOLearner(env, cfg)
    ts = learner.init(jax.random.PRNGKey(0))
    path = ckpt_dir if ckpt.latest_step_dir(ckpt_dir) is None \
        else ckpt.latest_step_dir(ckpt_dir)
    ts = ckpt.restore(path, template=ts)
    inference_fn = learner.make_inference_fn()
    params_tuple = (ts.normalizer, ts.params)

    state = jax.jit(env.reset)(jax.random.split(jax.random.PRNGKey(1), 1))

    def rollout(state, key):
        h0 = jnp.zeros((1, HIDDEN))

        def body(carry, _):
            state, h, key = carry
            key, k = jax.random.split(key)
            h, act = inference_fn(params_tuple, h, state.obs, k,
                                  deterministic=True)
            state = env.step(state, act)
            return (state, h, key), (state.qp, state.metrics["apples"],
                                     state.metrics["bombs"])

        (_, _, _), (qps, apples, bombs) = jax.lax.scan(
            body, (state, h0, key), None, length=steps)
        return qps, apples, bombs

    qps, apples, bombs = jax.jit(rollout)(state, jax.random.PRNGKey(2))
    qps = jax.tree.map(lambda x: x[:, 0], qps)  # drop the batch axis
    html.save(out, core.sys, qps)
    print(f"wrote {out} ({steps} frames, apples {float(apples.sum()):.0f}, "
          f"bombs {float(bombs.sum()):.0f})")


if __name__ == "__main__":
    main(*sys.argv[1:3])
