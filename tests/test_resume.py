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


def test_sac_rnn_checkpoint_resume(tmp_path):
    """GRU-SAC resumes params/opt/normalizer (NOT the replay buffer — it
    re-warms through min_replay) from the latest step dir."""
    from pobrax_tpu.envs.fast import Fast
    from pobrax_tpu.training import sac_rnn

    kw = dict(num_envs=4, episode_length=16, seq_len=8, burn_in=2,
              replay_capacity=8, batch_size=4, seqs_per_epoch=2,
              min_replay=2, hidden_size=8, encoder_sizes=(16,),
              head_sizes=(16,), seed=5, autoreset_mode="cached",
              progress_fn=lambda s, m: None)
    ckpt = str(tmp_path / "rsac_ckpt")
    steps_per_epoch = 2 * 8 * 4  # seqs * seq_len * envs (repeat 1)
    _, params1, hist1 = sac_rnn.train(
        Fast(), num_timesteps=4 * steps_per_epoch,
        checkpoint_dir=ckpt, checkpoint_every=1, **kw)
    assert checkpoint.latest_step_dir(ckpt) is not None

    _, params2, hist2 = sac_rnn.train(
        Fast(), num_timesteps=8 * steps_per_epoch,
        checkpoint_dir=ckpt, checkpoint_every=1, **kw)
    # resumed: only the remaining ~4 epochs ran
    assert len(hist2) <= len(hist1) + 1
    # and the restored params differ from a fresh init (training continued)
    a = jax.tree.leaves(params1[1])
    b = jax.tree.leaves(params2[1])
    assert any(float(np.abs(np.asarray(x) - np.asarray(y)).max()) > 0
               for x, y in zip(a, b))
