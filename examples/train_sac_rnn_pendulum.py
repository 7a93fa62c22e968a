"""Recurrent SAC on the masked-pendulum memory task.

Same PO task as examples/train_masked_pendulum.py (VELOCITY segment hidden
-> a memoryless policy cannot tell a pole falling left from one swinging
right): trains the OFF-POLICY memory agent (training/sac_rnn.py) and
reports deterministic mean episode length against the on-policy numbers in
docs/learning_masked_pendulum.json (feedforward_masked ~147 is the
no-memory score, 500 is the cap).

Usage: python examples/train_sac_rnn_pendulum.py [num_timesteps]
Appends "gru_sac_masked" to docs/learning_masked_pendulum.json.
"""

import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from examples.train_masked_pendulum import (EPISODE_LENGTH, masked_env,
                                            mean_length)  # noqa: E402
from pobrax_tpu.training import sac_rnn  # noqa: E402


def main(num_timesteps=600_000):
    hidden = 64

    def progress(steps, m):
        if steps % 65536 < 4096:
            print(f"steps {steps:>8,}  q_loss {m['q_loss']:.3f}  "
                  f"reward {m['mean_reward']:.3f}  "
                  f"sps {m['steps_per_second']:,.0f}", flush=True)

    inf, params, _ = sac_rnn.train(
        masked_env(),
        num_timesteps=num_timesteps, num_envs=64,
        episode_length=EPISODE_LENGTH,
        seq_len=16, burn_in=4, replay_capacity=1024, batch_size=64,
        seqs_per_epoch=4, grad_steps_per_seq=8, min_replay=32,
        learning_rate=3e-4, discounting=0.97,
        encoder_sizes=(64,), hidden_size=hidden, head_sizes=(64,),
        seed=0, progress_fn=progress)

    score = mean_length(
        masked_env(),
        lambda h, obs, k: inf(params, h, obs, k, deterministic=True),
        carry_init=lambda n: jnp.zeros((n, hidden)))
    print(f"GRU-SAC, masked: {score:.1f} / {EPISODE_LENGTH}", flush=True)

    path = "docs/learning_masked_pendulum.json"
    with open(path) as f:
        results = json.load(f)
    results["gru_sac_masked"] = score
    results["gru_sac_num_timesteps"] = num_timesteps
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"updated {path}", flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:2]]
    main(*args)
