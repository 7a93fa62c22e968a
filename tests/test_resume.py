"""PPO checkpoint/resume integration (the restart half of failure recovery)."""

import os

import jax
import numpy as np

from pobrax_tpu.envs.ant import Ant
from pobrax_tpu.training import checkpoint, ppo

_KW = dict(num_envs=8, episode_length=16, unroll_length=4,
           num_minibatches=2, num_update_epochs=1, seed=0)


def test_train_checkpoints_and_resumes(tmp_path):
    d = str(tmp_path)
    ppo.train(Ant(), num_timesteps=256, checkpoint_dir=d,
              checkpoint_every=128, **_KW)
    assert checkpoint.latest_step_dir(d).endswith("000256")

    # resume: only the remaining 256 steps run, and new checkpoints extend
    _, params, hist = ppo.train(
        Ant(), num_timesteps=512, checkpoint_dir=d, checkpoint_every=128,
        progress_fn=lambda s, m: None, **_KW)
    assert checkpoint.latest_step_dir(d).endswith("000512")
    assert len(hist) == (512 - 256) // (4 * 8)

    # restored state round-trips structurally
    env = Ant()
    from pobrax_tpu.envs import wrappers
    wrapped = wrappers.VmapWrapper(
        wrappers.EpisodeWrapper(env, 16, 1), batch_size=8)
    learner = ppo.PPOLearner(wrapped, ppo.PPOConfig(num_envs=8))
    template = learner.init(jax.random.PRNGKey(0))
    ts = checkpoint.restore(checkpoint.latest_step_dir(d), template=template)
    # 512 steps / (4 unroll * 8 envs) = 16 epochs
    assert int(ts.epochs) == 16


def test_rnn_ppo_checkpoint_resume(tmp_path):
    """Recurrent trainer resumes params/epoch from the latest step dir."""
    from pobrax_tpu.envs.fast import Fast
    from pobrax_tpu.training import ppo_rnn

    ckpt = str(tmp_path / "rnn_ckpt")
    _, params1, hist1 = ppo_rnn.train(
        Fast(), num_timesteps=128, num_envs=8, episode_length=8,
        unroll_length=4, num_minibatches=2, num_update_epochs=1,
        hidden_size=8, encoder_sizes=(16,), seed=3,
        checkpoint_dir=ckpt, checkpoint_every=1,
        progress_fn=lambda s, m: None)
    # resume with a LARGER budget: continues, does not restart at epoch 0
    _, params2, hist2 = ppo_rnn.train(
        Fast(), num_timesteps=256, num_envs=8, episode_length=8,
        unroll_length=4, num_minibatches=2, num_update_epochs=1,
        hidden_size=8, encoder_sizes=(16,), seed=3,
        checkpoint_dir=ckpt, checkpoint_every=1,
        progress_fn=lambda s, m: None)
    assert len(hist2) < len(hist1) + 8  # resumed, not re-run from scratch
    n1 = params1[0]  # normalizer state advanced further after resume
    n2 = params2[0]
    assert float(n2.count) > float(n1.count)
