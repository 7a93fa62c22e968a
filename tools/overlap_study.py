"""Can one TPU core overlap a latency-bound chain with matmul work?

docs/ROADMAP.md round 3 named "overlap rollout and SGD (pipelined
epochs)" as the remaining >10% training lever. That lever only exists if
XLA:TPU co-schedules two INDEPENDENT computations inside one program —
the rollout is a serial (B,)-elementwise dependency chain that leaves the
MXU idle, the SGD phase is matmuls; if the scheduler can interleave them,
a one-epoch-stale pipelined PPO would hide the cheaper phase entirely.

This measures exactly that, with no RL code in the way:

  chain(x):  T serial steps of cheap (B,)-elementwise ops (the rollout
             shape: each step data-depends on the last).
  mm(w):     T serial matmul steps (the SGD shape, MXU work).
  both:      one jitted program returning (chain(x), mm(w)) on
             independent inputs — XLA is free to interleave.

If t_both ~= max(t_chain, t_mm): overlap is real, build pipelined PPO.
If t_both ~= t_chain + t_mm: a TPU core runs one fused region at a time
and the lever is dead — document the null result and stop chasing it.

Run on the real chip (one job at a time): python tools/overlap_study.py
"""

import time

import jax
import jax.numpy as jnp

B = 4096          # rollout-like batch width
T_CHAIN = 10_000  # control steps in the chain scan
CHAIN_OPS = 100   # dependent op-groups per step (~600 ops, a substep-like body)
MM = 1024         # matmul size
T_MM = 3_000      # MXU steps

# Calibration note (measured on the v5e first): a scan whose body is a
# HANDFUL of elementwise ops is ~free (25ns/step — the VPU runs 4096 lanes
# in 4 cycles/op), so the per-substep cost in the physics program comes
# from its ~10k-op body, not scan overhead. The chain below carries a
# 600-op dependent body to be physics-like, and both workloads are sized
# ~10x the ~27ms dispatch cost. The jitted fns return SCALARS and timing
# fetches them: on the axon relay block_until_ready alone does not force
# execution.


def chain(x):
    def step(x, _):
        y = x
        for _ in range(CHAIN_OPS):
            y = y * 1.000001 + 0.5
            y = jnp.where(y > 1.0, y - 1.0, y)
            y = y * y - 0.25 * y
        return y, ()
    out, _ = jax.lax.scan(step, x, None, length=T_CHAIN)
    return out.sum()


def mm(w):
    def step(w, _):
        w = jnp.tanh(w @ w * 0.01)
        return w, ()
    out, _ = jax.lax.scan(step, w, None, length=T_MM)
    return out.sum()


def both(x, w):
    return chain(x), mm(w)


def fetch(out):
    return jax.tree.map(float, out)  # forces execution + result transfer


def timed(fn, *args, reps=4):
    # steady-state mean with the result VALUE fetched inside the window
    # (see calibration note); first post-warmup rep dropped
    fetch(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn(*args))
        times.append(time.perf_counter() - t0)
    return sum(times[1:]) / (reps - 1)


def main():
    x = jnp.linspace(0.0, 1.0, B)
    w = jnp.eye(MM) * 0.5 + 0.01
    j_chain = jax.jit(chain)
    j_mm = jax.jit(mm)
    j_both = jax.jit(both)
    t_chain = timed(j_chain, x)
    t_mm = timed(j_mm, w)
    t_both = timed(j_both, x, w)
    overlap = (t_chain + t_mm - t_both) / min(t_chain, t_mm)
    print(f"chain alone : {t_chain * 1e3:8.1f} ms")
    print(f"mm alone    : {t_mm * 1e3:8.1f} ms")
    print(f"both fused  : {t_both * 1e3:8.1f} ms "
          f"(sum {1e3 * (t_chain + t_mm):.1f}, "
          f"max {1e3 * max(t_chain, t_mm):.1f})")
    print(f"overlap fraction of the cheaper phase hidden: {overlap:+.2f} "
          f"(1.0 = full overlap, 0.0 = pure serial)")


if __name__ == "__main__":
    main()
