"""Throughput benchmark: env-steps/s/chip at 4096 batched envs.

Measures the fully fused program the framework is designed around: one jitted
`lax.scan` carrying (env_state, rng) through T steps of the wrapped env —
physics substeps x task logic x randomized autoreset x on-device random
actions, all in a single XLA program with no host round-trips
(BASELINE.json "metric"; the reference's equivalent harness is
/root/reference/po_brax/envs/ant_heavenhell.py:194-205, which leaves the
action sampling on the host and never recorded a number).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "env_steps/s/chip", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp


def bench(env_name: str = "ant_tag", batch: int = 4096, steps: int = 200,
          repeats: int = 3) -> float:
    from pobrax_tpu.envs import create, MaskedObservationWrapper

    # "masked_<name>" runs the PO-masked variant of a stock env
    # (BASELINE.json config 4: obs-mask fusion at 4096 envs)
    hidden = None
    if env_name.startswith("masked_"):
        env_name = env_name[len("masked_"):]
        hidden = ("VELOCITY",)
    # Autoreset mode (BENCH_AUTORESET): 'cached' (default) = the
    # reference's RandomizedAutoResetWrapperCached semantics (fresh cached
    # states, 200-step refresh — reference wrappers.py:83-123) implemented
    # fully on device so it survives jit; 'naive' = resample EVERY step
    # (reference wrappers.py:30-52), which costs ~31% of the fused step.
    # Both numbers are recorded in docs/PERFORMANCE.md.
    # BENCH_SUBSTEPS=8 benches the opt-in integrator fast preset
    # (Env.retune_substeps — +16-23% across the suite, stability-probed;
    # docs/PERFORMANCE.md round 5). Default: production substeps=10.
    extra = {}
    if int(os.environ.get("BENCH_SUBSTEPS", "0")):  # 0/unset = default 10
        extra["substeps"] = int(os.environ["BENCH_SUBSTEPS"])
    env = create(env_name, episode_length=1000, batch_size=batch,
                 auto_reset=True, randomized_autoreset=True,
                 autoreset_mode=os.environ.get("BENCH_AUTORESET", "cached"),
                 **extra)
    if hidden is not None:
        env = MaskedObservationWrapper(env, env_name=env_name, hidden=hidden)
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
    # BENCH_RNG=rbg: draw the harness's ACTION stream from the TPU hardware
    # RNG instead of threefry (keys carry their impl; the env's own
    # threefry info-rng — and every fixture — is untouched: only the scan
    # carry key changes type). The delta measures what the counter-based
    # threefry action sampling costs the fused step.
    if os.environ.get("BENCH_RNG") == "rbg":
        key = jax.random.key(0, impl="rbg")
    rollout_jit = jax.jit(rollout, donate_argnums=(0,))

    # warmup / compile
    state, key = rollout_jit(state, key)
    jax.block_until_ready(state.obs)

    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, key = rollout_jit(state, key)
        jax.block_until_ready(state.obs)
        dt = time.perf_counter() - t0
        best = max(best, batch * steps / dt)

    # BENCH_TRACE=<dir>: capture a jax.profiler trace of one timed rollout
    # (open in Perfetto/TensorBoard; basis of docs/PERFORMANCE.md's roofline)
    trace_dir = os.environ.get("BENCH_TRACE")
    if trace_dir:
        from pobrax_tpu.utils.profiling import trace
        with trace(trace_dir):
            state, key = rollout_jit(state, key)
            jax.block_until_ready(state.obs)
        print(f"# trace written to {trace_dir}", flush=True)
    return best


def _baseline_for_mode(mode: str):
    """Earliest recorded BENCH round whose autoreset mode matches `mode`.

    Rounds are ordered by the NUMBER parsed from the filename (BENCH_r10
    must not sort before BENCH_r2); records without an 'autoreset' field
    predate the mode split and are naive-mode (the r01 baseline). A record
    that exists but cannot be parsed is warned about, never silently
    treated as "no baseline"."""
    import glob
    import re
    import sys

    rounds = []
    for path in glob.glob("BENCH_r*.json"):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            rounds.append((int(m.group(1)), path))
    for _, path in sorted(rounds):
        try:
            with open(path) as f:
                rec = json.load(f)
            parsed = rec.get("parsed") or rec  # driver wraps under "parsed"
            rec_mode = parsed.get("autoreset", "naive")
            value = parsed.get("value")
        except Exception as e:
            print(f"# warning: could not parse baseline record {path}: {e}",
                  file=sys.stderr)
            continue
        if rec_mode == mode and value:
            return value
    return None


def main() -> None:
    env_name = os.environ.get("BENCH_ENV", "ant_tag")
    batch = int(os.environ.get("BENCH_BATCH", "4096"))
    steps = int(os.environ.get("BENCH_STEPS", "200"))
    n_chips = max(1, len([d for d in jax.devices() if d.platform != "cpu"]) or 1)

    # Measure BOTH autoreset modes so vs_baseline is same-semantics by
    # construction: 'cached' is the production default (on-device cached
    # refresh), 'naive' is the reference-parity per-step resample that the
    # r01 baseline was recorded with. BENCH_AUTORESET pins the headline
    # mode; BENCH_SINGLE_MODE=1 skips the secondary measurement (e.g. when
    # wall-clock is tight).
    headline_mode = os.environ.get("BENCH_AUTORESET", "cached")
    modes = [headline_mode]
    if not int(os.environ.get("BENCH_SINGLE_MODE", "0")):
        modes += [m for m in ("cached", "naive") if m != headline_mode]

    results = {}
    for mode in modes:
        os.environ["BENCH_AUTORESET"] = mode
        value = bench(env_name, batch, steps) / n_chips
        baseline = _baseline_for_mode(mode)
        results[mode] = {
            "value": round(value, 1),
            "vs_baseline": round(value / baseline, 3) if baseline else 1.0,
        }

    head = results[headline_mode]
    record = {
        "metric": f"{env_name} env-steps/s/chip @ {batch} envs",
        "value": head["value"],
        "unit": "env_steps/s/chip",
        "vs_baseline": head["vs_baseline"],
        "autoreset": headline_mode,
        "modes": results,
    }

    # BENCH_BATCH_SWEEP=1: also record the batch-8192 secondary headline
    # (measured +7% over 4096 in round 3, docs/PERFORMANCE.md roofline
    # section; headline stays at 4096 for cross-round comparability).
    # Extra widths via BENCH_SWEEP_BATCHES="8192,16384".
    if int(os.environ.get("BENCH_BATCH_SWEEP", "0")):
        os.environ["BENCH_AUTORESET"] = headline_mode
        sweep = {}
        for b in [int(x) for x in os.environ.get(
                "BENCH_SWEEP_BATCHES", "8192").split(",")]:
            if b == batch:
                continue
            v = bench(env_name, b, steps) / n_chips
            sweep[str(b)] = {"value": round(v, 1),
                             "per_env_speedup_vs_headline":
                                 round(v / head["value"], 3)}
        record["batch_sweep"] = sweep

    # BENCH_TRAIN=1: additionally measure steady-state TRAINING throughput
    # (full PPO epoch at the docs/PERFORMANCE.md recorded config). Opt-in —
    # it adds a multi-minute epoch compile on TPU; the standing record
    # lives in TRAINBENCH_r*.json (tools/bench_train.py).
    if int(os.environ.get("BENCH_TRAIN", "0")):
        import sys
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tools.bench_train import bench_train
        t = bench_train(env_name, batch=batch, autoreset=headline_mode,
                        epochs_per_call=int(os.environ.get("TRAIN_EPC", "8")))
        record["train"] = {"value": t["value"], "unit": t["unit"],
                           "config": {k: t[k] for k in
                                      ("network_dtype", "unroll",
                                       "minibatches", "update_epochs",
                                       "epochs_per_call")}}
    print(json.dumps(record))


if __name__ == "__main__":
    main()
