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

    # the scanned multi-epoch program (dispatch amortization,
    # cfg.epochs_per_call) — the shape bench/training actually run
    epochs = learner.jit_epochs(2)
    ts, state, _, metrics = epochs(ts, state, k_epoch)
    jax.block_until_ready(metrics["total_loss"])
    print(f"proc {jax.process_index()} epochs2 ok "
          f"loss={float(metrics['total_loss']):.4f}", flush=True)
""")

_SAC_RNN_WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, os.environ["REPO"])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=os.environ["COORD"],
        num_processes=2,
        process_id=int(sys.argv[1]))
    assert jax.device_count() == 4, jax.device_count()

    from pobrax_tpu.envs.pendulum import InvertedPendulum
    from pobrax_tpu.envs import wrappers
    from pobrax_tpu.parallel import make_mesh
    from pobrax_tpu.training import sac_rnn

    NUM_ENVS = 16
    cfg = sac_rnn.RSACConfig(
        num_envs=NUM_ENVS, episode_length=32, seq_len=8, burn_in=2,
        replay_capacity=16, batch_size=8, seqs_per_epoch=2,
        min_replay=1, encoder_sizes=(16,), hidden_size=8,
        head_sizes=(16,), per_alpha=0.6)
    env = wrappers.EpisodeWrapper(InvertedPendulum(), cfg.episode_length, 1)
    env = wrappers.VmapWrapper(env, batch_size=NUM_ENVS)
    env = wrappers.RandomizedAutoResetWrapperNaive(env)
    mesh = make_mesh()  # 4 global devices, data axis = 4

    learner = sac_rnn.RSACLearner(env, cfg, mesh=mesh)
    key = jax.random.PRNGKey(0)
    state = jax.jit(env.reset)(jax.random.split(key, NUM_ENVS))
    ts = learner.init(key, state)
    ts = jax.device_put(ts, learner.state_sharding())
    dsh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    state = jax.device_put(state, dsh)
    h = jax.device_put(learner.h0(NUM_ENVS), dsh)

    # device-local replay: each of this process's 2 devices must hold a
    # (capacity, L, B/4, obs) slice of the buffer's env-column axis — a
    # replica (full B) here would mean replay data crossing the mesh
    obs_buf = ts.buffer.data["obs"]
    shard_shapes = {s.data.shape for s in obs_buf.addressable_shards}
    assert shard_shapes == {(cfg.replay_capacity, cfg.seq_len,
                             NUM_ENVS // 4, obs_buf.shape[-1])}, shard_shapes
    # the PER table is sharded the same way
    pri_shapes = {s.data.shape for s in ts.priorities.addressable_shards}
    assert pri_shapes == {(cfg.replay_capacity, NUM_ENVS // 4)}, pri_shapes

    epoch = jax.jit(learner.build_epoch_fn())
    for i in range(2):
        ts, state, h, metrics = epoch(ts, state, h, jax.random.PRNGKey(1 + i))
    jax.block_until_ready(metrics["q_loss"])
    # params must stay replicated (bit-identical) across this process's
    # devices after cross-process pmean'd gradient steps
    import numpy as np
    leaf = jax.tree.leaves(ts.params.q)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
    print(f"proc {jax.process_index()} sacrnn ok "
          f"qloss={float(metrics['q_loss']):.6f} "
          f"reward={float(metrics['mean_reward']):.6f}", flush=True)
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
        assert "epochs2 ok" in out
    # replicated losses must agree across processes (single + scanned)
    for marker in ("epoch ok", "epochs2 ok"):
        losses = [l.split("loss=")[1].split()[0]
                  for out in outs for l in out.splitlines() if marker in l]
        assert len(set(losses)) == 1, (marker, losses)


@pytest.mark.slow
def test_two_process_sharded_sac_rnn_epoch(tmp_path):
    """The shard_map GRU-SAC epoch (device-local replay columns + PER
    table, pmean-only collectives — training/sac_rnn.py:596-617) across a
    REAL OS-process boundary: 2 Gloo processes x 2 devices = 4-device
    'data' mesh. Asserts per-process replay shards are device-local
    slices, params stay bit-identical after cross-process gradient pmean,
    and the replicated metrics agree across processes."""
    worker = tmp_path / "worker_sacrnn.py"
    worker.write_text(_SAC_RNN_WORKER)
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
        assert "sacrnn ok" in out
    for field in ("qloss=", "reward="):
        vals = [l.split(field)[1].split()[0]
                for out in outs for l in out.splitlines() if "sacrnn ok" in l]
        assert len(set(vals)) == 1, (field, vals)
