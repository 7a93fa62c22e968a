"""Steady-state TRAINING throughput: env-steps/s through the full jitted
PPO epoch (rollout scan + GAE + minibatch SGD) on one chip.

This is the harness behind docs/PERFORMANCE.md's training table (round-2
recorded config: ant_tag @ 4096 envs, unroll 16, 32 minibatches x 4 update
epochs, cached autoreset, bf16 nets). Prints one JSON line.

Usage: python tools/bench_train.py [env_name]
Env overrides: TRAIN_BATCH, TRAIN_UNROLL, TRAIN_MB, TRAIN_EPOCHS,
TRAIN_AUTORESET (cached|naive), TRAIN_DTYPE (bfloat16|float32),
TRAIN_REPEATS, TRAIN_EPC (epochs scanned inside one jitted call —
amortizes the fixed ~25-30ms per-dispatch cost of the TPU relay).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_train(env_name: str = "ant_tag", batch: int = 4096,
                unroll: int = 16, minibatches: int = 32,
                update_epochs: int = 4, autoreset: str = "cached",
                dtype: str = "bfloat16", repeats: int = 3,
                flatten: bool = True, epochs_per_call: int = 1) -> dict:
    from pobrax_tpu.envs import _envs, wrappers
    from pobrax_tpu.training import ppo

    cfg = ppo.PPOConfig(
        num_envs=batch, episode_length=1000, unroll_length=unroll,
        num_minibatches=minibatches, num_update_epochs=update_epochs,
        network_dtype=dtype, flatten_optimizer=flatten,
        epochs_per_call=epochs_per_call)
    env = _envs[env_name]()
    # TRAIN_SUBSTEPS=8: integrator fast preset (docs/PERFORMANCE.md r5)
    ss = int(os.environ.get("TRAIN_SUBSTEPS", "0"))
    if ss:
        env.retune_substeps(ss)
    wrapped = wrappers.ActionRepeatWrapper(env, cfg.action_repeat)
    wrapped = wrappers.EpisodeWrapper(wrapped, cfg.episode_length, 1)
    wrapped = wrappers.VmapWrapper(wrapped, batch_size=batch)
    wrapped = wrappers.randomized_autoreset(wrapped, autoreset)

    learner = ppo.PPOLearner(wrapped, cfg)
    key = jax.random.PRNGKey(0)
    key, k_init, k_reset = jax.random.split(key, 3)
    ts = learner.init(k_init)
    env_state = jax.jit(wrapped.reset)(jax.random.split(k_reset, batch))
    epc = max(1, epochs_per_call)
    epoch_fn = learner.jit_epochs(epc) if epc > 1 else learner.jit_epoch()
    steps_per_call = unroll * batch * cfg.action_repeat * epc

    def run_call(key):
        if epc > 1:
            ts2, env2, key, metrics = epoch_fn(run_call.ts, run_call.env, key)
        else:
            key, k = jax.random.split(key)
            ts2, env2, metrics = epoch_fn(run_call.ts, run_call.env, k)
        run_call.ts, run_call.env = ts2, env2
        jax.block_until_ready(metrics["total_loss"])
        return key
    run_call.ts, run_call.env = ts, env_state

    # compile + warmup
    t0 = time.perf_counter()
    key = run_call(key)
    compile_s = time.perf_counter() - t0

    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        key = run_call(key)
        best = max(best, steps_per_call / (time.perf_counter() - t0))
    return {"metric": f"{env_name} TRAIN env-steps/s/chip @ {batch} envs",
            "value": round(best, 1), "unit": "env_steps/s/chip",
            "autoreset": autoreset, "network_dtype": dtype,
            "unroll": unroll, "minibatches": minibatches,
            "update_epochs": update_epochs, "flatten_optimizer": flatten,
            "epochs_per_call": epc, "compile_s": round(compile_s, 1)}


def bench_train_rnn(env_name: str = "ant_tag", batch: int = 2048,
                    unroll: int = 32, minibatches: int = 8,
                    update_epochs: int = 4, autoreset: str = "cached",
                    repeats: int = 3, epochs_per_call: int = 1) -> dict:
    """Steady-state GRU-PPO epoch throughput (TRAIN_PROGRAM=rnn)."""
    from pobrax_tpu.envs import _envs, wrappers
    from pobrax_tpu.training import ppo_rnn

    cfg = ppo_rnn.RNNPPOConfig(
        num_envs=batch, episode_length=1000, unroll_length=unroll,
        num_minibatches=minibatches, num_update_epochs=update_epochs,
        epochs_per_call=epochs_per_call)
    env = _envs[env_name]()
    wrapped = wrappers.ActionRepeatWrapper(env, cfg.action_repeat)
    wrapped = wrappers.EpisodeWrapper(wrapped, cfg.episode_length, 1)
    wrapped = wrappers.VmapWrapper(wrapped, batch_size=batch)
    wrapped = wrappers.randomized_autoreset(wrapped, autoreset)

    learner = ppo_rnn.RNNPPOLearner(wrapped, cfg)
    key = jax.random.PRNGKey(0)
    key, k_init, k_reset = jax.random.split(key, 3)
    ts = learner.init(k_init)
    env_state = jax.jit(wrapped.reset)(jax.random.split(k_reset, batch))
    h = learner.h0(batch)
    epc = max(1, epochs_per_call)
    epoch_fn = learner.jit_epochs(epc) if epc > 1 else learner.jit_epoch()
    steps_per_call = unroll * batch * cfg.action_repeat * epc

    state = {"ts": ts, "env": env_state, "h": h}

    def run_call(key):
        if epc > 1:
            state["ts"], state["env"], state["h"], key, metrics = epoch_fn(
                state["ts"], state["env"], state["h"], key)
        else:
            key, k = jax.random.split(key)
            state["ts"], state["env"], state["h"], metrics = epoch_fn(
                state["ts"], state["env"], state["h"], k)
        jax.block_until_ready(metrics["total_loss"])
        return key

    t0 = time.perf_counter()
    key = run_call(key)
    compile_s = time.perf_counter() - t0

    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        key = run_call(key)
        best = max(best, steps_per_call / (time.perf_counter() - t0))
    return {"metric": f"{env_name} RNN TRAIN env-steps/s/chip @ {batch} envs",
            "value": round(best, 1), "unit": "env_steps/s/chip",
            "autoreset": autoreset, "unroll": unroll,
            "minibatches": minibatches, "update_epochs": update_epochs,
            "epochs_per_call": epc, "compile_s": round(compile_s, 1)}


def bench_train_sac_rnn(env_name: str = "ant_heavenhell", batch: int = 512,
                        seq_len: int = 32, burn_in: int = 8,
                        batch_size: int = 128, seqs_per_epoch: int = 4,
                        grad_steps: int = 2, autoreset: str = "naive",
                        repeats: int = 3) -> dict:
    """Steady-state GRU-SAC epoch throughput (TRAIN_PROGRAM=sac_rnn) at the
    docs/LEARNING.md heavenhell-solve config shape — the only trainer family
    without a recorded single-chip TPU number before round 5 (VERDICT-r4
    weak #4). env-steps/epoch = seqs_per_epoch*seq_len*num_envs*repeat."""
    from pobrax_tpu.envs import HAI_ACTION_REPEAT, _envs, wrappers
    from pobrax_tpu.training import sac_rnn

    cfg = sac_rnn.RSACConfig(
        num_envs=batch, episode_length=1000,
        action_repeat=HAI_ACTION_REPEAT, seq_len=seq_len, burn_in=burn_in,
        replay_capacity=192, batch_size=batch_size,
        seqs_per_epoch=seqs_per_epoch, grad_steps_per_seq=grad_steps,
        min_replay=1, nstep=5, hidden_size=128, encoder_sizes=(256,),
        head_sizes=(256,))
    env = _envs[env_name]()
    wrapped = wrappers.ActionRepeatWrapper(env, cfg.action_repeat)
    wrapped = wrappers.EpisodeWrapper(wrapped, cfg.episode_length, 1)
    wrapped = wrappers.VmapWrapper(wrapped, batch_size=batch)
    wrapped = wrappers.randomized_autoreset(wrapped, autoreset)

    learner = sac_rnn.RSACLearner(wrapped, cfg)
    key = jax.random.PRNGKey(0)
    key, k_init, k_reset = jax.random.split(key, 3)
    env_state = jax.jit(wrapped.reset)(jax.random.split(k_reset, batch))
    ts = learner.init(k_init, env_state)
    h = learner.h0(batch)
    epoch_fn = jax.jit(learner.build_epoch_fn(), donate_argnums=(0, 1, 2))
    steps_per_call = seqs_per_epoch * seq_len * batch * cfg.action_repeat

    state = {"ts": ts, "env": env_state, "h": h}

    def run_call(key):
        key, k = jax.random.split(key)
        state["ts"], state["env"], state["h"], metrics = epoch_fn(
            state["ts"], state["env"], state["h"], k)
        jax.block_until_ready(metrics["q_loss"])
        return key

    t0 = time.perf_counter()
    key = run_call(key)
    compile_s = time.perf_counter() - t0

    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        key = run_call(key)
        best = max(best, steps_per_call / (time.perf_counter() - t0))
    return {"metric": f"{env_name} SAC-RNN TRAIN env-steps/s/chip "
                      f"@ {batch} envs",
            "value": round(best, 1), "unit": "env_steps/s/chip",
            "autoreset": autoreset, "seq_len": seq_len, "burn_in": burn_in,
            "batch_size": batch_size, "seqs_per_epoch": seqs_per_epoch,
            "grad_steps_per_seq": grad_steps, "nstep": 5,
            "compile_s": round(compile_s, 1)}


def main_all(out_path: str) -> None:
    """Run all three training programs back-to-back on the same chip and
    write the standing TRAINBENCH artifact bench.py:168 references, so
    training-speed regressions are visible between rounds."""
    results = {
        "ppo": bench_train(epochs_per_call=int(
            os.environ.get("TRAIN_EPC", "32"))),
        "ppo_rnn": bench_train_rnn(epochs_per_call=int(
            os.environ.get("TRAIN_EPC", "32"))),
        "sac_rnn": bench_train_sac_rnn(),
    }
    record = {"unit": "env_steps/s/chip",
              "programs": {k: {"value": v["value"], "metric": v["metric"],
                               "config": {kk: vv for kk, vv in v.items()
                                          if kk not in ("value", "metric",
                                                        "unit")}}
                           for k, v in results.items()}}
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({k: v["value"] for k, v in results.items()}))
    print(f"# wrote {out_path}", flush=True)


if __name__ == "__main__":
    if os.environ.get("TRAIN_PROGRAM") == "all":
        main_all(os.environ.get("TRAINBENCH_OUT", "TRAINBENCH_r05.json"))
        raise SystemExit(0)
    if os.environ.get("TRAIN_PROGRAM") == "sac_rnn":
        print(json.dumps(bench_train_sac_rnn(
            env_name=sys.argv[1] if len(sys.argv) > 1 else "ant_heavenhell",
            batch=int(os.environ.get("TRAIN_BATCH", "512")),
            repeats=int(os.environ.get("TRAIN_REPEATS", "3")),
        )))
        raise SystemExit(0)
    if os.environ.get("TRAIN_PROGRAM") == "rnn":
        print(json.dumps(bench_train_rnn(
            env_name=sys.argv[1] if len(sys.argv) > 1 else "ant_tag",
            batch=int(os.environ.get("TRAIN_BATCH", "2048")),
            unroll=int(os.environ.get("TRAIN_UNROLL", "32")),
            minibatches=int(os.environ.get("TRAIN_MB", "8")),
            update_epochs=int(os.environ.get("TRAIN_EPOCHS", "4")),
            autoreset=os.environ.get("TRAIN_AUTORESET", "cached"),
            repeats=int(os.environ.get("TRAIN_REPEATS", "3")),
            epochs_per_call=int(os.environ.get("TRAIN_EPC", "1")),
        )))
        raise SystemExit(0)
    out = bench_train(
        env_name=sys.argv[1] if len(sys.argv) > 1 else "ant_tag",
        batch=int(os.environ.get("TRAIN_BATCH", "4096")),
        unroll=int(os.environ.get("TRAIN_UNROLL", "16")),
        minibatches=int(os.environ.get("TRAIN_MB", "32")),
        update_epochs=int(os.environ.get("TRAIN_EPOCHS", "4")),
        autoreset=os.environ.get("TRAIN_AUTORESET", "cached"),
        dtype=os.environ.get("TRAIN_DTYPE", "bfloat16"),
        repeats=int(os.environ.get("TRAIN_REPEATS", "3")),
        flatten=os.environ.get("TRAIN_FLATTEN", "1") == "1",
        epochs_per_call=int(os.environ.get("TRAIN_EPC", "1")),
    )
    print(json.dumps(out))
