"""Multi-device scaling-efficiency benchmark (BASELINE.json config 5).

Weak scaling: per-device env batch is held constant while the mesh 'data'
axis grows 1 -> 2 -> 4 -> N devices; ideal throughput is linear in devices
and efficiency(N) = rate(N) / (N * rate(1)).

Two programs are measured, both the real production shapes:
  * step  — the fused env-stepping scan (physics + task logic + autoreset +
            on-device action sampling), env state sharded on 'data'
  * ppo   — one full PPO epoch (rollout + GAE + minibatch SGD); XLA inserts
            the gradient all-reduce at the minibatch boundary

On TPU pods this script runs as-is per host (jax.distributed initialization
is handled by pobrax_tpu.parallel when launched multi-process) and the
collectives ride ICI. Without TPU hardware it self-provisions an 8-device
virtual CPU mesh — the trend (and any serialization bug) is visible there
even though absolute CPU numbers are meaningless.

Prints one JSON line per (program, n_devices) plus a summary line with
efficiency at the largest mesh.
"""

from __future__ import annotations

import json
import os
import time

# must precede jax import; harmless if devices already exist
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax
import jax.numpy as jnp

# BENCH_PLATFORM=cpu forces the virtual CPU mesh even when a TPU is visible
# (the container's sitecustomize ignores JAX_PLATFORMS; jax.config works)
if os.environ.get("BENCH_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")


def _devices():
    tpu = [d for d in jax.devices() if d.platform != "cpu"]
    if tpu:
        return tpu, "tpu"
    if jax.default_backend() != "cpu":
        return jax.devices(), jax.default_backend()
    os.environ.setdefault("POBRAX_FUSED", "0")  # CPU: generic path compiles fast
    return jax.devices("cpu"), "cpu"


def bench_step(env_name: str, devices, per_device_envs: int, steps: int,
               repeats: int = 3) -> float:
    """Fused env-stepping scan, env state sharded over `devices`."""
    from pobrax_tpu.envs import create
    from pobrax_tpu.parallel import make_mesh, shard_batch

    n = len(devices)
    batch = per_device_envs * n
    mesh = make_mesh(devices=devices)
    env = create(env_name, episode_length=1000, batch_size=batch,
                 auto_reset=True, randomized_autoreset=True)
    action_size = env.action_size

    def rollout(state, key):
        def body(carry, _):
            state, key = carry
            key, k_act = jax.random.split(key)
            action = jax.random.uniform(
                k_act, (batch, action_size), minval=-1.0, maxval=1.0)
            state = env.step(state, action)
            return (state, key), None
        (state, key), _ = jax.lax.scan(body, (state, key), None, length=steps)
        return state, key

    key = jax.random.PRNGKey(0)
    state = jax.jit(env.reset)(jax.random.split(key, batch))
    state = shard_batch(state, mesh)
    rollout_jit = jax.jit(rollout, donate_argnums=(0,))
    state, key = rollout_jit(state, key)  # compile + warmup
    jax.block_until_ready(state.obs)
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, key = rollout_jit(state, key)
        jax.block_until_ready(state.obs)
        best = max(best, batch * steps / (time.perf_counter() - t0))
    return best


def bench_ppo(env_name: str, devices, per_device_envs: int,
              repeats: int = 3) -> float:
    """One PPO epoch (rollout+GAE+SGD) on a 'data'-sharded mesh."""
    from pobrax_tpu.envs import create
    from pobrax_tpu.parallel import make_mesh, replicate, shard_batch
    from pobrax_tpu.training import ppo

    n = len(devices)
    num_envs = per_device_envs * n
    mesh = make_mesh(devices=devices)
    cfg = ppo.PPOConfig(num_envs=num_envs, episode_length=1000,
                        unroll_length=16, num_minibatches=8,
                        num_update_epochs=4)
    env = create(env_name, episode_length=cfg.episode_length,
                 batch_size=num_envs, auto_reset=True,
                 randomized_autoreset=True)
    learner = ppo.PPOLearner(env, cfg, mesh=mesh)
    key = jax.random.PRNGKey(0)
    ts = replicate(learner.init(key), mesh)
    env_state = shard_batch(
        jax.jit(env.reset)(jax.random.split(key, num_envs)), mesh)
    epoch_fn = learner.jit_epoch()
    ts, env_state, m = epoch_fn(ts, env_state, key)  # compile + warmup
    jax.block_until_ready(m)
    steps_per_epoch = cfg.unroll_length * num_envs
    best = 0.0
    for i in range(repeats):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        ts, env_state, m = epoch_fn(ts, env_state, k)
        jax.block_until_ready(m)
        best = max(best, steps_per_epoch / (time.perf_counter() - t0))
    return best


def bench_rnn(env_name: str, devices, per_device_envs: int,
              repeats: int = 3) -> float:
    """One recurrent-PPO (GRU) epoch on a 'data'-sharded mesh: env batch AND
    hidden state sharded, strided env-interleave minibatches (shard-local by
    construction), gradient psum the only collective."""
    from pobrax_tpu.envs import create
    from pobrax_tpu.parallel import make_mesh, replicate, shard_batch
    from pobrax_tpu.training import ppo_rnn

    n = len(devices)
    num_envs = per_device_envs * n
    mesh = make_mesh(devices=devices)
    cfg = ppo_rnn.RNNPPOConfig(num_envs=num_envs, episode_length=1000,
                               unroll_length=32, num_minibatches=8,
                               num_update_epochs=4)
    env = create(env_name, episode_length=cfg.episode_length,
                 batch_size=num_envs, auto_reset=True,
                 randomized_autoreset=True)
    learner = ppo_rnn.RNNPPOLearner(env, cfg, mesh=mesh)
    key = jax.random.PRNGKey(0)
    ts = replicate(learner.init(key), mesh)
    env_state = shard_batch(
        jax.jit(env.reset)(jax.random.split(key, num_envs)), mesh)
    h = shard_batch(learner.h0(num_envs), mesh)
    epoch_fn = learner.jit_epoch()
    ts, env_state, h, m = epoch_fn(ts, env_state, h, key)  # compile + warmup
    jax.block_until_ready(m)
    steps_per_epoch = cfg.unroll_length * num_envs
    best = 0.0
    for i in range(repeats):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        ts, env_state, h, m = epoch_fn(ts, env_state, h, k)
        jax.block_until_ready(m)
        best = max(best, steps_per_epoch / (time.perf_counter() - t0))
    return best


def bench_sac_rnn(env_name: str, devices, per_device_envs: int,
                  repeats: int = 3) -> float:
    """One recurrent-SAC epoch as a shard_map over 'data': env batch, GRU
    hiddens, and replay columns sharded (replay never crosses the mesh);
    gradient pmean the only per-grad-step collective (training/sac_rnn.py)."""
    from pobrax_tpu.envs import create
    from pobrax_tpu.parallel import make_mesh, shard_batch
    from pobrax_tpu.training import sac_rnn

    n = len(devices)
    num_envs = per_device_envs * n
    mesh = make_mesh(devices=devices)
    cfg = sac_rnn.RSACConfig(num_envs=num_envs, episode_length=1000,
                             seq_len=32, burn_in=8, replay_capacity=64,
                             batch_size=num_envs, seqs_per_epoch=4,
                             grad_steps_per_seq=1, min_replay=1,
                             encoder_sizes=(256,), hidden_size=128,
                             head_sizes=(256,))
    env = create(env_name, episode_length=cfg.episode_length,
                 batch_size=num_envs, auto_reset=True,
                 randomized_autoreset=True)
    learner = sac_rnn.RSACLearner(env, cfg, mesh=mesh)
    key = jax.random.PRNGKey(0)
    env_state = shard_batch(
        jax.jit(env.reset)(jax.random.split(key, num_envs)), mesh)
    ts = jax.device_put(learner.init(key, env_state),
                        learner.state_sharding())
    h = shard_batch(learner.h0(num_envs), mesh)
    epoch_fn = jax.jit(learner.build_epoch_fn())
    ts, env_state, h, m = epoch_fn(ts, env_state, h, key)  # compile + warmup
    jax.block_until_ready(m)
    steps_per_epoch = cfg.seqs_per_epoch * cfg.seq_len * num_envs
    best = 0.0
    for i in range(repeats):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        ts, env_state, h, m = epoch_fn(ts, env_state, h, k)
        jax.block_until_ready(m)
        best = max(best, steps_per_epoch / (time.perf_counter() - t0))
    return best


_PROGRAMS = {"step": bench_step, "ppo": bench_ppo, "rnn": bench_rnn,
             "sac_rnn": bench_sac_rnn}


def main() -> None:
    env_name = os.environ.get("BENCH_ENV", "ant_tag")
    steps = int(os.environ.get("BENCH_STEPS", "100"))
    programs = os.environ.get("BENCH_PROGRAMS", "step,ppo,rnn").split(",")
    devices, platform = _devices()
    sizes = [int(s) for s in os.environ["BENCH_SIZES"].split(",")] \
        if os.environ.get("BENCH_SIZES") else \
        [s for s in (1, 2, 4, 8, 16, 32) if s <= len(devices)]
    if sizes[0] != 1:
        sizes = [1] + sizes  # efficiency needs the 1-device anchor

    # Mode: on real accelerators, WEAK scaling (fixed per-device batch;
    # ideal = linear throughput; efficiency = rate_N / (N * rate_1)). On
    # virtual CPU devices — which SHARE the same host cores — weak scaling
    # is physically meaningless, so default to STRONG (fixed total batch;
    # ideal = flat time; efficiency = rate_N / rate_1, isolating the
    # partitioning + collective overhead XLA adds for the sharded program).
    mode = os.environ.get("BENCH_SCALING_MODE",
                          "weak" if platform != "cpu" else "strong")
    total = int(os.environ.get("BENCH_TOTAL_ENVS", "512"))
    per_dev_weak = int(os.environ.get("BENCH_PER_DEVICE_ENVS", "256"))

    results = {}
    for prog in programs:
        fn = _PROGRAMS[prog]
        rates = {}
        for n in sizes:
            per_dev = per_dev_weak if mode == "weak" else total // n
            if prog == "step":
                rate = fn(env_name, devices[:n], per_dev, steps)
            else:
                rate = fn(env_name, devices[:n], per_dev)
            rates[n] = rate
            ideal = n * rates[1] if mode == "weak" else rates[1]
            print(json.dumps({
                "program": prog, "devices": n, "platform": platform,
                "mode": mode, "env": env_name,
                "envs_total": per_dev * n,
                "env_steps_per_s": round(rate, 1),
                "efficiency": round(rate / ideal, 4) if rates.get(1) else None,
            }), flush=True)
        results[prog] = rates

    n_max = sizes[-1]
    scale = n_max if mode == "weak" else 1
    summary = {
        "metric": f"{mode}-scaling efficiency @ {n_max} devices ({platform})",
        "value": round(results[programs[0]][n_max]
                       / (scale * results[programs[0]][1]), 4),
        "unit": "fraction",
    }
    for prog in programs[1:]:
        summary[f"{prog}_efficiency"] = round(
            results[prog][n_max] / (scale * results[prog][1]), 4)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
