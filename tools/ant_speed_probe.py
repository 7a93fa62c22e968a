"""Measure a trained ant's locomotion budget per episode.

Loads the committed AntTag GRU-SAC checkpoint (a strong pursuit policy)
and measures mean torso displacement per control step over live steps —
the empirical "how far can a trained ant travel in an episode" number
that tools/gather_ceiling.py's tour distances are compared against.

Measured (CPU, 8 episodes x 300 steps, stochastic): 0.121 m/control-step
=> ~121 m per 1000-step episode, ~3.7x the 32.5 m mean greedy tour over
all 8 AntGather apples — AntGather's catch plateau is a perception
(sensor-range) limit, not a motion-budget limit (docs/LEARNING.md).
"""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pobrax_tpu.envs import HAI_ACTION_REPEAT, _envs, wrappers  # noqa: E402
from pobrax_tpu.training import checkpoint as ckpt  # noqa: E402
from pobrax_tpu.training import sac_rnn  # noqa: E402

CKPT = "checkpoints/ant_tag_sac_rnn_phase0_750M"


def main(episodes=8, steps=300):
    cfg = sac_rnn.RSACConfig(
        num_envs=episodes, episode_length=steps,
        action_repeat=HAI_ACTION_REPEAT, seq_len=32, burn_in=8,
        hidden_size=128, encoder_sizes=(256,), head_sizes=(256,))
    core = _envs["ant_tag"](visible_radius=20.0)
    env = wrappers.VmapWrapper(wrappers.EpisodeWrapper(
        wrappers.ActionRepeatWrapper(core, HAI_ACTION_REPEAT), steps, 1),
        batch_size=episodes)
    learner = sac_rnn.RSACLearner(env, cfg)
    key = jax.random.PRNGKey(0)
    state = jax.jit(env.reset)(jax.random.split(key, episodes))
    ts = learner.init(key, state)
    piece = ckpt.restore(CKPT, template=sac_rnn._ckpt_slice(ts))
    inf = learner.make_inference_fn()
    params = (piece["normalizer"], piece["params"].policy)
    ti = core.torso_idx

    def run(key):
        state = env.reset(jax.random.split(key, episodes))
        h = jnp.zeros((episodes, 128))

        def body(carry, _):
            state, h, key = carry
            key, k = jax.random.split(key)
            h, act = inf(params, h, state.obs, k, deterministic=False)
            n = env.step(state, act)
            disp = jnp.linalg.norm(
                n.qp.pos[:, ti, :2] - state.qp.pos[:, ti, :2], axis=-1)
            return (n, h, key), (disp, 1.0 - n.done)

        (_, _, _), (disp, alive) = jax.lax.scan(
            body, (state, h, key), None, length=steps)
        return disp, alive

    disp, alive = jax.jit(run)(jax.random.PRNGKey(1))
    disp, alive = np.asarray(disp), np.asarray(alive)
    m = (disp * alive).sum() / alive.sum()
    print(f"mean displacement/control-step (stoch): {m:.4f} m "
          f"=> {1000 * m:.1f} m per 1000-step episode")
    return float(m)


if __name__ == "__main__":
    main()
