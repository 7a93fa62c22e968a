"""The replay carry-over remedy for the off-policy curriculum collapse.

Round 4 measured that narrowing AntTag's visible_radius under GRU-SAC
collapses true-env performance (docs/LEARNING.md "Off-policy visibility
narrowing FAILS"): the critic's value surface over the visibility-gated
observation channel goes off-distribution the moment the radius shrinks,
and the actor follows the broken critic down. Three remedies failed; the
one untried remedy (docs/ROADMAP.md #3) is REHEARSAL — keep old-phase
data flowing through the replay across the boundary so the critic keeps
on-distribution anchors while it extends its surface to the narrowed env.

This script resumes the committed radius-20 checkpoint
(checkpoints/ant_tag_sac_rnn_phase0_750M, 0.812 stoch tag rate at r20,
0.207 on the TRUE r4 env) and trains +400M steps DIRECTLY at the true
radius 4 with `carry_env` = the radius-20 env on `carry_frac` of the env
batch (sac_rnn's mixed-env collection). Success bar: the true-env rate
holds >= 0.207 (no collapse) or climbs; every no-carry variant measured
0.016-0.074.

Usage: python examples/train_ant_tag_sac_rnn_carry.py [carry_frac] [freeze_epochs] [num_envs]
"""

import json
import os
import shutil
import sys

sys.path.insert(0, ".")

from pobrax_tpu.envs import HAI_ACTION_REPEAT, _envs  # noqa: E402
from pobrax_tpu.training import sac_rnn  # noqa: E402
from examples.train_ant_tag import ShapedAntTag  # noqa: E402
from examples.train_ant_tag_rnn import tag_rate_rnn  # noqa: E402

PHASE0 = "checkpoints/ant_tag_sac_rnn_phase0_750M"
HIDDEN = 128


def main(carry_frac=0.25, freeze_epochs=0, num_envs=512,
         checkpoint_dir="/tmp/ant_tag_sac_rnn_carry_ckpt"):
    # seed the resume dir with the committed phase-0 params (750M steps)
    step_dir = os.path.join(checkpoint_dir, "step_000750000000")
    if not os.path.isdir(step_dir):
        os.makedirs(checkpoint_dir, exist_ok=True)
        shutil.copytree(PHASE0, step_dir)
        print(f"seeded {step_dir} from {PHASE0}", flush=True)

    history = []

    def progress(steps, m):
        history.append({"steps": steps, "mean_reward": m.get("mean_reward")})
        if len(history) % 100 == 0:
            print(f"  {steps:>13,}  r={history[-1]['mean_reward']:+.4f}",
                  flush=True)

    inf, params, _ = sac_rnn.train(
        ShapedAntTag(_envs["ant_tag"](visible_radius=4.0), coef=5.0),
        carry_env=ShapedAntTag(_envs["ant_tag"](visible_radius=20.0),
                               coef=5.0),
        carry_frac=carry_frac,
        num_timesteps=1_150_000_000,  # 750M resumed + 400M new
        num_envs=num_envs,
        episode_length=1000,
        action_repeat=HAI_ACTION_REPEAT,
        seq_len=32, burn_in=8,
        replay_capacity=192, batch_size=128,
        seqs_per_epoch=4, grad_steps_per_seq=2, min_replay=24,
        learning_rate=3e-4, discounting=0.97,
        reward_scaling=10.0, nstep=5,
        actor_freeze_epochs=freeze_epochs,
        hidden_size=HIDDEN, encoder_sizes=(256,), head_sizes=(256,),
        autoreset_mode="cached",
        checkpoint_dir=checkpoint_dir, checkpoint_every=100_000_000,
        seed=0, progress_fn=progress)

    results = {}
    for name, env_radius in (("anchor", 20.0), ("true", 4.0)):
        for det in (True, False):
            r = tag_rate_rnn(_envs["ant_tag"](visible_radius=env_radius),
                             inf, params, HIDDEN,
                             action_repeat=HAI_ACTION_REPEAT,
                             deterministic=det)
            results[f"{name}_r{env_radius:g}_{'det' if det else 'stoch'}"] = r
            print(f"tag rate [{name} r={env_radius:g} "
                  f"{'det' if det else 'stoch'}]: {r:.3f}", flush=True)
    out = "docs/learning_ant_tag_sac_rnn_carry.json"
    with open(out, "w") as f:
        json.dump({"carry_frac": carry_frac, "freeze_epochs": freeze_epochs,
                   "budget": 1_150_000_000, "results": results,
                   "curve": history[::10]}, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 0.25,
         int(sys.argv[2]) if len(sys.argv) > 2 else 0,
         int(sys.argv[3]) if len(sys.argv) > 3 else 512)
