"""Reproduce the AntTag solve from the committed checkpoint artifact.

Restores the ppo_rnn visibility-curriculum checkpoint
(checkpoints/ant_tag_rnn_900M — the 20->6->4 recipe of
examples/train_ant_tag_rnn.py --curriculum, docs/LEARNING.md) and reports
the TRUE sparse tag rate, det and stochastic, on 256 episodes — the same
evaluator the training script uses (tag_rate_rnn). This makes the flagship
solve replayable-from-artifact like maze/gather, not just
reproducible-by-script.

Usage: python tools/eval_tag_checkpoint.py [ckpt_dir]
"""

import json
import sys

import jax

sys.path.insert(0, ".")

from pobrax_tpu.envs import HAI_ACTION_REPEAT, _envs, wrappers  # noqa: E402
from pobrax_tpu.training import checkpoint as ckpt  # noqa: E402
from pobrax_tpu.training import ppo_rnn  # noqa: E402
from examples.train_ant_tag_rnn import tag_rate_rnn  # noqa: E402

HIDDEN = 128  # must match examples/train_ant_tag_rnn.py


def main(ckpt_dir="checkpoints/ant_tag_rnn_900M"):
    core = _envs["ant_tag"]()
    env = wrappers.ActionRepeatWrapper(core, HAI_ACTION_REPEAT)
    env = wrappers.EpisodeWrapper(env, 1000, 1)
    env = wrappers.VmapWrapper(env, batch_size=8)

    cfg = ppo_rnn.RNNPPOConfig(num_envs=8, num_minibatches=8,
                               hidden_size=HIDDEN, encoder_sizes=(256,))
    learner = ppo_rnn.RNNPPOLearner(env, cfg)
    ts = learner.init(jax.random.PRNGKey(0))
    path = ckpt.latest_step_dir(ckpt_dir) or ckpt_dir
    ts = ckpt.restore(path, template=ts)
    inference_fn = learner.make_inference_fn()
    params_tuple = (ts.normalizer, ts.params)

    det = tag_rate_rnn(_envs["ant_tag"](), inference_fn, params_tuple,
                       HIDDEN, action_repeat=HAI_ACTION_REPEAT)
    stoch = tag_rate_rnn(_envs["ant_tag"](), inference_fn, params_tuple,
                         HIDDEN, action_repeat=HAI_ACTION_REPEAT, seed=1,
                         deterministic=False)
    print(json.dumps({"ckpt": str(path), "true_tag_rate_det": det,
                      "true_tag_rate_stoch": stoch}))


if __name__ == "__main__":
    main(*sys.argv[1:2])
