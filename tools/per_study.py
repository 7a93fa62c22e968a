"""Prioritized sequence replay: does it buy sample efficiency here?

training/sac_rnn.py has R2D2-style prioritized sequence replay
(`per_alpha > 0`: P ~ p^alpha with p = eta*max|TD| + (1-eta)*mean|TD|,
importance-weighted critic loss) implemented and unit-tested
(tests/test_sac_rnn.py) but never EVALUATED — docs/ROADMAP.md round 3
left "prioritized sequence replay for the sample-efficiency gap" open.

This runs the controlled masked-pendulum memory task (the repo's clean
PO benchmark: VELOCITY segment hidden, so the agent must integrate
positions — no embodied-state confounds) at a ladder of step budgets,
uniform vs prioritized, multiple seeds, and reports the deterministic
eval score per budget. The question is whether the PER curve dominates
the uniform curve at sub-solve budgets (R2D2's claim) on a task this
size, not whether both eventually hit the 500 cap (they should).

CPU run (forced): python tools/per_study.py
Writes docs/learning_per_study.json.
"""

import json
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, ".")

from examples.train_masked_pendulum import (EPISODE_LENGTH, masked_env,
                                            mean_length)  # noqa: E402
from pobrax_tpu.training import sac_rnn  # noqa: E402

BUDGETS = (100_000, 200_000, 400_000)
SEEDS = (0, 1, 2)
HIDDEN = 64
COMMON = dict(
    num_envs=64, episode_length=EPISODE_LENGTH,
    seq_len=16, burn_in=4, replay_capacity=1024, batch_size=64,
    seqs_per_epoch=4, grad_steps_per_seq=8, min_replay=32,
    learning_rate=3e-4, discounting=0.97,
    encoder_sizes=(64,), hidden_size=HIDDEN, head_sizes=(64,),
    watchdog_deadline_s=None,
)


def run(per: bool, budget: int, seed: int) -> float:
    kwargs = dict(COMMON)
    if per:
        # R2D2's published exponents (priority 0.9, IS 0.6); eta stays at
        # the config default 0.9
        kwargs.update(per_alpha=0.9, per_beta=0.6)
    inf, params, _ = sac_rnn.train(
        masked_env(), num_timesteps=budget, seed=seed, **kwargs)
    return mean_length(
        masked_env(),
        lambda h, obs, k: inf(params, h, obs, k, deterministic=True),
        carry_init=lambda n: jnp.zeros((n, HIDDEN)))


def main():
    results = {"budgets": list(BUDGETS), "seeds": list(SEEDS),
               "uniform": {}, "per": {}}
    for per in (False, True):
        name = "per" if per else "uniform"
        for budget in BUDGETS:
            scores = []
            for seed in SEEDS:
                t0 = time.perf_counter()
                s = run(per, budget, seed)
                scores.append(s)
                print(f"{name:8s} budget {budget:>8,} seed {seed}: "
                      f"{s:6.1f}  ({time.perf_counter() - t0:.0f}s)",
                      flush=True)
            results[name][str(budget)] = scores
    with open("docs/learning_per_study.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote docs/learning_per_study.json", flush=True)


if __name__ == "__main__":
    main()
