"""Quantified roofline for the fused bench program (docs/PERFORMANCE.md).

Takes the EXACT production bench rollout (ant_tag @ 4096 envs, cached
autoreset, 200-step jitted scan), asks XLA's cost model for the compiled
program's total FLOPs and bytes accessed, measures wall time, and reports
achieved TFLOP/s / GB/s against the chip's peak --> the derived
compute-floor and bandwidth-floor per control step, and how far above the
rooflines the measured time sits (the latency/serial-dependency gap).

Complements tools/ablate_bench.py (phase attribution by ablation): this
file answers "how much is left on the table vs the hardware", that one
answers "which phase is paying for it".

Run on the TPU chip:  python tools/roofline.py
Env overrides: ROOF_ENV, ROOF_BATCH, ROOF_STEPS, ROOF_AUTORESET.
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# peak per chip: (dense f32-ish MXU TFLOP/s at the rate XLA actually issues
# f32 matmuls, bf16 TFLOP/s, HBM GB/s). Sources: public TPU spec sheets.
_PEAKS = {
    "TPU v2": (11.5, 23, 700),
    "TPU v3": (61.4, 123, 900),
    "TPU v4": (137.5, 275, 1200),
    "TPU v5 lite": (98.3, 197, 819),
    "TPU v5e": (98.3, 197, 819),
    "TPU v5p": (229.5, 459, 2765),
    "TPU v6 lite": (458.0, 918, 1640),
    "TPU v6e": (458.0, 918, 1640),
}


def _peaks_for(kind: str):
    for k, v in _PEAKS.items():
        if kind.lower().startswith(k.lower()):
            return v
    return None


def main() -> None:
    from pobrax_tpu.envs import create

    env_name = os.environ.get("ROOF_ENV", "ant_tag")
    batch = int(os.environ.get("ROOF_BATCH", "4096"))
    steps = int(os.environ.get("ROOF_STEPS", "200"))
    mode = os.environ.get("ROOF_AUTORESET", "cached")

    env = create(env_name, episode_length=1000, batch_size=batch,
                 auto_reset=True, randomized_autoreset=True,
                 autoreset_mode=mode)
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

    lowered = jax.jit(rollout, donate_argnums=(0,)).lower(state, key)
    compiled = lowered.compile()
    ca = compiled.cost_analysis() or {}
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0] if ca else {}
    flops = float(ca.get("flops", 0.0))
    bytes_accessed = float(ca.get("bytes accessed", 0.0))
    transcendentals = float(ca.get("transcendentals", 0.0))

    # warmup + measure (same protocol as bench.py)
    state, key = compiled(state, key)
    jax.block_until_ready(state.obs)
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, key = compiled(state, key)
        jax.block_until_ready(state.obs)
        best_dt = min(best_dt, time.perf_counter() - t0)

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", str(dev.platform))
    peaks = _peaks_for(kind)

    per_step_dt = best_dt / steps  # one control step (substeps x task logic)
    out = {
        "env": env_name, "batch": batch, "steps": steps, "autoreset": mode,
        "device_kind": kind,
        "env_steps_per_s": round(batch * steps / best_dt, 1),
        "control_step_us": round(per_step_dt * 1e6, 2),
        "flops_per_env_step": round(flops / (batch * steps), 1),
        "bytes_per_env_step": round(bytes_accessed / (batch * steps), 1),
        "transcendentals_per_env_step":
            round(transcendentals / (batch * steps), 2),
        "achieved_tflops": round(flops / best_dt / 1e12, 4),
        "achieved_gbps": round(bytes_accessed / best_dt / 1e9, 2),
    }
    if peaks:
        peak_f32, peak_bf16, peak_bw = peaks
        # floors: the time the program CANNOT beat on this chip
        flop_floor = flops / (peak_f32 * 1e12)
        bw_floor = bytes_accessed / (peak_bw * 1e9)
        roof = max(flop_floor, bw_floor)
        out.update({
            "peak_tflops_f32": peak_f32, "peak_hbm_gbps": peak_bw,
            "mxu_utilization_pct": round(100 * flops / best_dt
                                         / (peak_f32 * 1e12), 3),
            "hbm_utilization_pct": round(100 * bytes_accessed / best_dt
                                         / (peak_bw * 1e9), 2),
            "compute_floor_us_per_step": round(flop_floor / steps * 1e6, 3),
            "bandwidth_floor_us_per_step": round(bw_floor / steps * 1e6, 3),
            "x_above_roofline": round(best_dt / roof, 1),
            "bound": ("bandwidth" if bw_floor > flop_floor else "compute")
                     if best_dt < 3 * roof else "latency/serial-dependency",
        })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
