"""TPU A/B of the substeps retune (ROADMAP #2 / VERDICT-r4 next-step #2).

The CPU stability probe (tools/substeps_probe.py) rejected substeps=5 at
every stiffness retune (plain halving locks into instant termination;
h*omega-preserving rescales inject energy) and located the stability edge
of the semi-implicit spring integrator at h_sub = 0.00625 s: substeps=8
is the ONLY candidate whose random-rollout stats match production
(z/done/speed within a few %; 7 and 6 blow up). This tool measures what
the retune actually buys on the TPU fused path by running bench.bench —
the EXACT headline harness (jitted scan, cached autoreset, best-of-3) —
once per substeps candidate via the BENCH_SUBSTEPS knob, same chip,
back-to-back. Results: docs/PERFORMANCE.md round-5 table.

Usage: python tools/bench_substeps.py [env_name] [batch] [steps]
Env: SUBSTEPS_LIST="10,8" (candidates, first = reference).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    env_name = sys.argv[1] if len(sys.argv) > 1 else "ant_tag"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    cands = [int(x) for x in
             os.environ.get("SUBSTEPS_LIST", "10,8").split(",")]
    out = {}
    for ss in cands:
        os.environ["BENCH_SUBSTEPS"] = "0" if ss == 10 else str(ss)
        v = bench.bench(env_name, batch, steps)
        out[str(ss)] = round(v, 1)
        print(json.dumps({"env": env_name, "substeps": ss,
                          "env_steps_per_s": round(v, 1)}), flush=True)
    ref = out[str(cands[0])]
    for ss in cands[1:]:
        print(json.dumps({"env": env_name,
                          "speedup_vs_substeps10": round(out[str(ss)] / ref, 4),
                          "substeps": ss}), flush=True)


if __name__ == "__main__":
    main()
