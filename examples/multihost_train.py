"""Multi-host PPO training launcher.

On a TPU pod slice, run this same script on every host (e.g. with
`gcloud compute tpus tpu-vm ssh --worker=all --command="python ..."`), or
simulate N processes on one machine:

  for i in 0 1; do
    JAX_COORDINATOR=localhost:12345 JAX_NUM_PROCESSES=2 JAX_PROCESS_ID=$i \
      python examples/multihost_train.py &
  done

Per the framework's distribution design (pobrax_tpu/parallel):
  * `jax.distributed.initialize()` brings up the multi-host runtime
  * one global ('data','model') Mesh spans every chip on every host
  * env batch shards on 'data'; params replicate; XLA all-reduces gradients
    over ICI within a slice and DCN across slices
  * per-env RNG keys travel with the sharded env state, so a sharded rollout
    equals the single-host rollout env-for-env
"""

import os
import sys

import jax

sys.path.insert(0, ".")


def main():
    coord = os.environ.get("JAX_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    else:
        # on TPU pods, initialize() autodetects everything
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process run

    from pobrax_tpu.envs import _envs
    from pobrax_tpu.parallel import make_mesh
    from pobrax_tpu.training import ppo

    print(f"process {jax.process_index()}/{jax.process_count()}, "
          f"{jax.local_device_count()} local / {jax.device_count()} global devices")
    mesh = make_mesh()  # spans all global devices

    def progress(steps, metrics):
        if jax.process_index() == 0:
            print(f"steps {steps:>10,}  reward {metrics['mean_reward']:+.3f}  "
                  f"sps {metrics['steps_per_second']:,.0f}")

    ppo.train(
        _envs["ant_tag"](),
        num_timesteps=int(os.environ.get("NUM_TIMESTEPS", 2_000_000)),
        num_envs=int(os.environ.get("NUM_ENVS", 4096)),
        mesh=mesh, progress_fn=progress)


if __name__ == "__main__":
    main()
