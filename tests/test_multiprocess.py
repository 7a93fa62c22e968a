"""True multi-process distributed test (SURVEY.md §4 implication (d)).

Launches 2 OS processes that join a jax.distributed cluster over Gloo
(CPU), each contributing 2 virtual devices to a global 4-device
('data','model') mesh, and runs ONE data-sharded PPO epoch on ant — the
same program that runs on a pod slice, minus the chips. Complements the
in-process 8-device mesh tests, which don't exercise cross-process
collectives.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, os.environ["REPO"])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=os.environ["COORD"],
        num_processes=2,
        process_id=int(sys.argv[1]))
    assert jax.device_count() == 4, jax.device_count()

    from pobrax_tpu.envs.ant import Ant
    from pobrax_tpu.envs import wrappers
    from pobrax_tpu.parallel import make_mesh, replicate, shard_batch
    from pobrax_tpu.training import ppo

    cfg = ppo.PPOConfig(num_envs=8, episode_length=8, unroll_length=2,
                        num_minibatches=2, num_update_epochs=1)
    env = wrappers.EpisodeWrapper(Ant(), cfg.episode_length, 1)
    env = wrappers.VmapWrapper(env, batch_size=cfg.num_envs)
    env = wrappers.RandomizedAutoResetWrapperNaive(env)
    mesh = make_mesh()  # 4 global devices, data axis = 4

    learner = ppo.PPOLearner(env, cfg, mesh=mesh)
    key = jax.random.PRNGKey(0)
    k_init, k_reset, k_epoch = jax.random.split(key, 3)
    ts = learner.init(k_init)
    state = jax.jit(env.reset)(jax.random.split(k_reset, cfg.num_envs))
    state = shard_batch(state, mesh)
    ts = replicate(ts, mesh)
    epoch = learner.jit_epoch()
    ts, state, metrics = epoch(ts, state, k_epoch)
    jax.block_until_ready(metrics["total_loss"])
    print(f"proc {jax.process_index()} epoch ok "
          f"loss={float(metrics['total_loss']):.4f}", flush=True)
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_data_parallel_ppo(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = {**os.environ,
           "REPO": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
           "COORD": f"localhost:{_free_port()}"}
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen([sys.executable, str(worker), str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert "epoch ok" in out
    # replicated loss must agree across processes
    losses = [l.split("loss=")[1].split()[0]
              for out in outs for l in out.splitlines() if "epoch ok" in l]
    assert len(set(losses)) == 1, losses
