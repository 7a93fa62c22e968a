"""GRU-SAC on AntTag via the staged visibility curriculum — off-policy.

The on-policy solve (examples/train_ant_tag_rnn.py --curriculum) reached a
100% deterministic tag rate with a 20 -> 6 -> 4 visibility curriculum.
This script runs the same curriculum with the off-policy memory agent
(recurrent SAC + n-step(5) targets, the recipe that solved heavenhell —
docs/LEARNING.md), resuming a shared checkpoint between phases
(sac_rnn.train checkpoints params/opt/normalizer; the replay re-warms each
phase, which is the right semantic when the env changes under the agent).

OUTCOME (round 4, measured — docs/LEARNING.md "Off-policy visibility
narrowing FAILS"): phase 0 (radius 20) reaches 0.812 stoch tag rate and
0.207 on the TRUE env, but every narrowing continuation COLLAPSES the
true-env rate to ~random (0.020 / 0.074 / 0.047; direct 20->4 with lr
1e-4: 0.016) — the critic's value surface over the visibility-gated
observation channel goes off-distribution and the actor follows it down.
The script and phase artifacts are kept as the record of that negative
result; the on-policy curriculum remains the AntTag solve.

Usage: python examples/train_ant_tag_sac_rnn.py PHASE [num_envs]
  PHASE indexes CURRICULUM; rerun with the same checkpoint dir to
  continue or advance phases across sessions.
"""

import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from pobrax_tpu.envs import HAI_ACTION_REPEAT, _envs  # noqa: E402
from pobrax_tpu.training import sac_rnn  # noqa: E402
from examples.train_ant_tag import ShapedAntTag  # noqa: E402
from examples.train_ant_tag_rnn import tag_rate_rnn  # noqa: E402

# (visible_radius, cumulative num_timesteps through the end of the phase)
# Phase 0 was extended in-flight to 750M (still climbing at 450M —
# docs/learning_ant_tag_sac_rnn_phase0.json); later budgets shifted to match.
CURRICULUM = ((20.0, 750_000_000), (6.0, 1_150_000_000), (4.0, 1_550_000_000),
              # phase 3 added in round 4: the 6.0 phase SPECIALIZED the
              # policy to 4-6-distance sightings (r6 eval 0.559, but the
              # true-env rate fell 0.207 -> 0.020) and one 400M phase at
              # 4.0 only recovered 0.074 — keep training at the true
              # radius (docs/learning_ant_tag_sac_rnn_phase*.json)
              (4.0, 1_950_000_000))
HIDDEN = 128


def run_phase(phase: int, num_envs: int = 512,
              checkpoint_dir: str = "/tmp/ant_tag_sac_rnn_ckpt"):
    radius, budget = CURRICULUM[phase]
    history = []

    def progress(steps, m):
        history.append({"steps": steps, "mean_reward": m.get("mean_reward")})
        if len(history) % 100 == 0:
            print(f"  {steps:>13,}  r={history[-1]['mean_reward']:+.4f}",
                  flush=True)

    inf, params, _ = sac_rnn.train(
        ShapedAntTag(_envs["ant_tag"](visible_radius=radius), coef=5.0),
        num_timesteps=budget,
        num_envs=num_envs,
        episode_length=1000,
        action_repeat=HAI_ACTION_REPEAT,
        seq_len=32, burn_in=8,
        replay_capacity=192, batch_size=128,
        seqs_per_epoch=4, grad_steps_per_seq=2, min_replay=24,
        learning_rate=3e-4, discounting=0.97,
        reward_scaling=10.0, nstep=5,
        hidden_size=HIDDEN, encoder_sizes=(256,), head_sizes=(256,),
        autoreset_mode="cached",
        checkpoint_dir=checkpoint_dir, checkpoint_every=50_000_000,
        seed=0, progress_fn=progress)

    results = {}
    for name, env_radius in (("phase", radius), ("true", 4.0)):
        for det in (True, False):
            r = tag_rate_rnn(_envs["ant_tag"](visible_radius=env_radius),
                             inf, params, HIDDEN,
                             action_repeat=HAI_ACTION_REPEAT,
                             deterministic=det)
            results[f"{name}_r{env_radius:g}_{'det' if det else 'stoch'}"] = r
            print(f"tag rate [{name} r={env_radius:g} "
                  f"{'det' if det else 'stoch'}]: {r:.3f}", flush=True)
    with open(f"docs/learning_ant_tag_sac_rnn_phase{phase}.json", "w") as f:
        json.dump({"phase": phase, "radius": radius, "budget": budget,
                   "results": results, "curve": history[::10]}, f, indent=1)
    print(f"wrote docs/learning_ant_tag_sac_rnn_phase{phase}.json", flush=True)


if __name__ == "__main__":
    run_phase(int(sys.argv[1]) if len(sys.argv) > 1 else 0,
              int(sys.argv[2]) if len(sys.argv) > 2 else 512)
