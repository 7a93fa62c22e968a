"""Task-logic tests for the PO envs (reference semantics, SURVEY.md §3.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pobrax_tpu import envs
from pobrax_tpu.envs.ant_gather import AntGatherEnv
from pobrax_tpu.envs.ant_heavenhell import AntHeavenHellEnv
from pobrax_tpu.envs.ant_tag import AntTagEnv


@pytest.fixture(scope="module")
def tag_env():
    return AntTagEnv()


@pytest.fixture(scope="module")
def hh_env():
    return AntHeavenHellEnv()


@pytest.fixture(scope="module")
def gather_env():
    return AntGatherEnv()


class TestAntTag:
    def test_reset_spawn_distance(self, tag_env):
        """Target spawns at least min_spawn_distance from the ant (ant_tag.py:90-105)."""
        for seed in range(5):
            s = jax.jit(tag_env.reset)(jax.random.PRNGKey(seed))
            ant_xy = np.asarray(s.qp.pos[tag_env.torso_idx, :2])
            tgt_xy = np.asarray(s.qp.pos[tag_env.target_idx, :2])
            assert np.linalg.norm(ant_xy - tgt_xy) > tag_env.min_spawn_distance

    def test_reset_target_z(self, tag_env):
        s = jax.jit(tag_env.reset)(jax.random.PRNGKey(0))
        assert float(s.qp.pos[tag_env.target_idx, 2]) == 0.5  # spawn z (ant_tag.py:103)

    def test_target_invisible_when_far(self, tag_env):
        """Obs tail is the target xy, zeroed beyond visible_radius (ant_tag.py:153)."""
        s = jax.jit(tag_env.reset)(jax.random.PRNGKey(1))
        # spawn distance >= 5 > visible_radius 3 => hidden
        np.testing.assert_array_equal(np.asarray(s.obs[-2:]), [0.0, 0.0])

    def test_target_visible_when_near(self, tag_env):
        s = jax.jit(tag_env.reset)(jax.random.PRNGKey(1))
        qp = s.qp
        near = qp.pos[tag_env.torso_idx, :2] + jnp.array([1.0, 0.5])
        qp = qp.replace(pos=qp.pos.at[tag_env.target_idx, :2].set(near))
        obs = tag_env._get_obs(qp, tag_env.sys.info(qp))
        np.testing.assert_allclose(np.asarray(obs[-2:]), np.asarray(near), atol=1e-6)

    def test_step_target_stays_in_cage(self, tag_env):
        """Adversary moves revert if any coord would leave the cage (:145)."""
        rng = jax.random.PRNGKey(0)
        tgt = jnp.array([4.4, 4.4])
        ant = jnp.array([0.0, 0.0])
        f = jax.jit(tag_env._step_target)
        for i in range(20):
            rng, pos = f(rng, ant, tgt)
            assert (jnp.abs(pos[:2]) <= tag_env.cage_xy + 1e-6).all() or (pos[:2] == tgt).all()

    def test_step_target_z_is_one(self, tag_env):
        rng, pos = jax.jit(tag_env._step_target)(
            jax.random.PRNGKey(0), jnp.zeros(2), jnp.array([2.0, 2.0]))
        assert float(pos[2]) == 1.0  # step z quirk (ant_tag.py:146)

    def test_tag_gives_reward_and_done(self, tag_env):
        s = jax.jit(tag_env.reset)(jax.random.PRNGKey(2))
        # move target on top of ant, then step: distance stays < tag radius
        qp = s.qp
        qp = qp.replace(pos=qp.pos.at[tag_env.target_idx, :2].set(
            qp.pos[tag_env.torso_idx, :2]))
        s = s.replace(qp=qp)
        s2 = jax.jit(tag_env.step)(s, jnp.zeros(8))
        assert float(s2.done) == 1.0
        assert float(s2.reward) == 1.0
        assert float(s2.metrics["hits"]) == 1.0


class TestAntHeavenHell:
    def test_heaven_side_varies_by_seed(self, hh_env):
        xs = []
        reset = jax.jit(hh_env.reset)
        for seed in range(12):
            s = reset(jax.random.PRNGKey(seed))
            xs.append(float(s.qp.pos[hh_env.target_idx, 0]))
        assert {-5.25, 5.25} == set(np.round(xs, 2).tolist()) | {-5.25, 5.25}
        assert len(set(np.round(xs, 2).tolist())) == 2  # both sides occur

    def test_heaven_hell_disjoint(self, hh_env):
        reset = jax.jit(hh_env.reset)
        for seed in range(6):
            s = reset(jax.random.PRNGKey(seed))
            hx = float(s.qp.pos[hh_env.target_idx, 0])
            lx = float(s.qp.pos[hh_env.hell_idx, 0])
            assert hx == -lx  # one left, one right (choice without replacement)

    def test_priest_gates_direction_bit(self, hh_env):
        s = jax.jit(hh_env.reset)(jax.random.PRNGKey(0))
        assert float(s.obs[-1]) == 0.0  # priest out of range at spawn
        # teleport ant under the priest: direction bit = sign(heaven x)
        qp = s.qp
        delta = hh_env.priest_pos - qp.pos[hh_env.torso_idx, :2]
        qp = qp.replace(pos=qp.pos.at[hh_env.ant_slice, :2].add(delta))
        s2 = jax.jit(hh_env.step)(s.replace(qp=qp), jnp.zeros(8))
        expect = np.sign(float(s.qp.pos[hh_env.target_idx, 0]))
        assert float(s2.obs[-1]) == expect

    def test_heaven_gives_plus_one_done(self, hh_env):
        s = jax.jit(hh_env.reset)(jax.random.PRNGKey(0))
        qp = s.qp
        delta = qp.pos[hh_env.target_idx, :2] - qp.pos[hh_env.torso_idx, :2]
        qp = qp.replace(pos=qp.pos.at[hh_env.ant_slice, :2].add(delta))
        s2 = jax.jit(hh_env.step)(s.replace(qp=qp), jnp.zeros(8))
        assert float(s2.reward) == 1.0 and float(s2.done) == 1.0

    def test_hell_gives_minus_one_done(self, hh_env):
        s = jax.jit(hh_env.reset)(jax.random.PRNGKey(0))
        qp = s.qp
        delta = qp.pos[hh_env.hell_idx, :2] - qp.pos[hh_env.torso_idx, :2]
        qp = qp.replace(pos=qp.pos.at[hh_env.ant_slice, :2].add(delta))
        s2 = jax.jit(hh_env.step)(s.replace(qp=qp), jnp.zeros(8))
        assert float(s2.reward) == -1.0 and float(s2.done) == 1.0

    def test_spawn_box(self, hh_env):
        reset = jax.jit(hh_env.sample_init_qp)
        for seed in range(5):
            _, qp = reset(jax.random.PRNGKey(seed))
            x, y = np.asarray(qp.pos[hh_env.torso_idx, :2])
            assert -0.5 <= x <= 0.5 and 0.5 <= y <= 1.5


class TestAntGather:
    def test_objects_on_integer_grid(self, gather_env):
        s = jax.jit(gather_env.reset)(jax.random.PRNGKey(0))
        obj = np.asarray(s.qp.pos[gather_env.object_indices])
        np.testing.assert_allclose(obj[:, :2], np.round(obj[:, :2]), atol=1e-6)
        assert (np.linalg.norm(obj[:, :2], axis=1) > 2.0).all()  # robot_object_spacing
        np.testing.assert_allclose(obj[:8, 2], 1.0)  # apples raised
        np.testing.assert_allclose(obj[8:, 2], 0.0)  # bombs on the ground

    def test_objects_unique_positions(self, gather_env):
        s = jax.jit(gather_env.reset)(jax.random.PRNGKey(3))
        obj = np.asarray(s.qp.pos[gather_env.object_indices])[:, :2]
        assert len({tuple(p) for p in obj}) == 16  # choice without replacement

    def test_catch_apple_rewards_and_teleports(self, gather_env):
        s = jax.jit(gather_env.reset)(jax.random.PRNGKey(0))
        qp = s.qp
        # put apple 0 on the ant
        apple_idx = int(gather_env.object_indices[0])
        qp = qp.replace(pos=qp.pos.at[apple_idx, :2].set(qp.pos[gather_env.torso_idx, :2]))
        s2 = jax.jit(gather_env.step)(s.replace(qp=qp), jnp.zeros(8))
        assert float(s2.reward) == 1.0
        assert float(s2.metrics["apples"]) == 1.0
        np.testing.assert_allclose(
            np.asarray(s2.qp.pos[apple_idx]), np.asarray(gather_env.waiting_area), atol=1e-6)

    def test_catch_bomb_beats_apple(self, gather_env):
        """Bomb branch wins when both caught in one step (ant_gather.py:143-144)."""
        s = jax.jit(gather_env.reset)(jax.random.PRNGKey(0))
        qp = s.qp
        ant_xy = qp.pos[gather_env.torso_idx, :2]
        qp = qp.replace(pos=qp.pos.at[int(gather_env.object_indices[0]), :2].set(ant_xy))
        qp = qp.replace(pos=qp.pos.at[int(gather_env.object_indices[8]), :2].set(ant_xy))
        s2 = jax.jit(gather_env.step)(s.replace(qp=qp), jnp.zeros(8))
        assert float(s2.reward) == -1.0
        assert float(s2.metrics["apples"]) == 1.0 and float(s2.metrics["bombs"]) == 1.0

    def test_waiting_area_quirk(self, gather_env):
        """waiting_area adds 2*sensor_range to all three coords (:91)."""
        np.testing.assert_allclose(np.asarray(gather_env.waiting_area), [18.0, 18.0, 12.0])

    def test_readings_shape_and_range(self, gather_env):
        s = jax.jit(gather_env.reset)(jax.random.PRNGKey(1))
        readings = np.asarray(s.obs[-20:])
        assert readings.shape == (20,)
        assert (readings >= 0).all() and (readings <= 1).all()


class TestRegistry:
    def test_create_names(self):
        assert set(envs._envs) >= {"ant", "ant_tag", "ant_heavenhell", "ant_gather"}

    def test_action_and_obs_sizes(self):
        env = envs.create("ant_tag", episode_length=100)
        assert env.action_size == 8
        assert env.observation_size == 103

    def test_obs_sizes_all(self):
        expect = {"ant": 87, "ant_tag": 103, "ant_heavenhell": 114, "ant_gather": 211}
        for name, size in expect.items():
            assert envs.create(name).observation_size == size


def test_shaped_ant_gather_catch_mask_and_live_potential():
    """ShapedAntGather (examples/train_ant_gather_rnn.py): phi tracks the
    nearest LIVE apple (caught objects in the sky waiting area are
    excluded by the z<5 test), the bomb term is a capped repulsion, and
    the potential delta is masked to exactly zero on catch steps (the
    catch-tax fix measured in docs/learning_gather_rnn_mask.json)."""
    import jax
    import jax.numpy as jnp

    from examples.train_ant_gather_rnn import ShapedAntGather
    from pobrax_tpu.envs.ant_gather import AntGatherEnv

    env = ShapedAntGather(AntGatherEnv(), coef=1.0, bomb_coef=0.5,
                          bomb_cap=3.0)
    u = env.unwrapped
    s = jax.jit(env.reset)(jax.random.PRNGKey(0))

    # moving the nearest apple into the sky switches phi to the next one
    qp = s.qp
    d = jnp.linalg.norm(qp.pos[u.torso_idx] - qp.pos[u.object_indices],
                        axis=1)
    nearest = int(jnp.argmin(jnp.where(jnp.arange(u.n_objects) < u.n_apples,
                                       d, 1e9)))
    p_before = float(env._phi(qp))
    sky = qp.pos[u.object_indices[nearest]] + jnp.array([0.0, 0.0, 12.0])
    qp_sky = qp.replace(pos=qp.pos.at[u.object_indices[nearest]].set(sky))
    p_after = float(env._phi(qp_sky))
    assert p_after < p_before  # next-nearest live apple is farther

    # catch step: shaped reward equals the TRUE reward exactly (delta
    # masked), even though the potential jumped
    a = jnp.zeros((env.action_size,))
    ns_true = jax.jit(u.step)(s.replace(qp=qp_sky), a)
    ns_shaped = jax.jit(env.step)(s.replace(qp=qp_sky), a)
    if float(ns_shaped.metrics["apples"] + ns_shaped.metrics["bombs"]) > 0:
        assert float(ns_shaped.reward) == float(ns_true.reward)

    # force a catch: teleport the WHOLE ant (all 9 bodies — moving only
    # the torso stretches the joints and the ant explodes away before the
    # post-step distance check) onto a live apple, step, and check the
    # shaped reward IS the true +1 (no shaping spike)
    from pobrax_tpu.physics.ant import ANT_BODY_NAMES

    tgt = qp.pos[u.object_indices[(nearest + 1) % u.n_apples]]
    delta = tgt[:2] - qp.pos[u.torso_idx, :2]
    n_ant = len(ANT_BODY_NAMES)
    qp_on = qp.replace(pos=qp.pos.at[:n_ant, :2].add(delta))
    s_on = s.replace(qp=qp_on)
    ns = jax.jit(env.step)(s_on, a)
    assert float(ns.metrics["apples"]) >= 1
    ns_u = jax.jit(u.step)(s_on, a)
    assert float(ns.reward) == float(ns_u.reward) == 1.0

    # bomb repulsion is capped: with every bomb farther than bomb_cap the
    # bomb term must be EXACTLY bomb_coef*cap regardless of distance —
    # isolate it by subtracting the apple term computed independently
    def apple_term(qp_):
        obj = qp_.pos[u.object_indices]
        dd = jnp.linalg.norm(qp_.pos[u.torso_idx] - obj, axis=1)
        live = obj[:, 2] < 5.0
        return -jnp.min(jnp.where(live[: u.n_apples], dd[: u.n_apples], 1e6))

    for shift in (100.0, 200.0):
        qp_far = qp.replace(pos=qp.pos.at[u.object_indices, 0].add(shift))
        bomb_term = float(env._phi(qp_far)) - float(apple_term(qp_far))
        assert abs(bomb_term - 0.5 * 3.0) < 1e-3, bomb_term


def test_gather_dealiased_sensor():
    """bomb_bin_offset=n_bins (the diagnostic sensor): bombs land in slots
    n_bins..2*n_bins-1 — disjoint from apple slots 0..n_bins-1 — and the
    out-of-range -1 wrap is routed to a dropped trash slot instead of
    erasing the last bomb bin. Default env unchanged (reference quirk:
    bombs offset by n_apples, /root/reference/po_brax/envs/ant_gather.py:175)."""
    import jax
    import jax.numpy as jnp

    from pobrax_tpu.envs.ant_gather import AntGatherEnv

    ref = AntGatherEnv()
    de = AntGatherEnv(bomb_bin_offset=10)
    assert ref.bomb_bin_offset == 8 and de.bomb_bin_offset == 10
    assert ref.observation_size == de.observation_size  # slot count fixed

    s_ref = jax.jit(ref.reset)(jax.random.PRNGKey(3))
    s_de = jax.jit(de.reset)(jax.random.PRNGKey(3))
    # same scene (reset ignores the sensor offset): qp identical
    assert jnp.allclose(s_ref.qp.pos, s_de.qp.pos)

    # sweep a lone BOMB around the ant (all other objects out of range):
    # whenever the reference sensor registers it (slot = bin + n_apples,
    # overlapping apple slots 8-9 for bins 0-1), the de-aliased sensor
    # must put the SAME intensity at slot = bin + n_bins, never below 10
    import numpy as np

    base = s_de.qp
    far = jnp.array([100.0, 100.0, 0.0])
    pos0 = base.pos
    for i in range(de.n_objects):
        pos0 = pos0.at[de.object_indices[i]].set(far)

    get_de = jax.jit(de._get_readings)
    get_ref = jax.jit(ref._get_readings)
    seen = aliased = 0
    for theta in np.linspace(0.0, 2 * np.pi, 12, endpoint=False):
        bomb = pos0[de.torso_idx] + jnp.array(
            [np.sin(theta), np.cos(theta), 0.0])
        pos = pos0.at[de.object_indices[de.n_apples]].set(bomb)
        qp = base.replace(pos=pos)
        dist = jnp.linalg.norm(
            qp.pos[de.torso_idx][:2] - qp.pos[de.object_indices][..., :2],
            axis=1)
        r_de = np.asarray(get_de(qp, dist))
        r_ref = np.asarray(get_ref(qp, dist))
        (nz_ref,) = np.nonzero(r_ref)
        (nz_de,) = np.nonzero(r_de)
        if len(nz_ref) == 0:
            assert len(nz_de) == 0  # out of span for both
            continue
        seen += 1
        assert len(nz_ref) == len(nz_de) == 1
        s_ref_slot, s_de_slot = int(nz_ref[0]), int(nz_de[0])
        assert s_de_slot >= de.n_bins  # never aliases an apple slot
        # the reference's boundary bin n_bins (angle exactly +half_span) is
        # merged into the last bin by the de-aliased sensor
        ref_bin = s_ref_slot - de.n_apples
        assert s_de_slot - de.n_bins == min(ref_bin, de.n_bins - 1)
        assert np.isclose(r_de[s_de_slot], r_ref[s_ref_slot])
        aliased += s_ref_slot < ref.n_bins  # landed in the overlap region
    assert seen >= 3  # the sweep exercised in-span bearings
    assert aliased >= 1  # ...including at least one aliased reference slot
