"""Physics engine tests: FK, joint readout, stability, contacts, frozen bodies."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pobrax_tpu.physics import QP, System, ant, config as pcfg, scene


@pytest.fixture(scope="module")
def ant_sys():
    return System(ant.ant_config())


class TestBuild:
    def test_body_index(self, ant_sys):
        assert ant_sys.body.index["$ Torso"] == 0
        assert ant_sys.body.index["Ground"] == 9
        assert ant_sys.num_bodies == 10
        assert ant_sys.num_joint_dof == 8

    def test_validate_rejects_dangling(self):
        cfg = pcfg.Config(bodies=(pcfg.Body(name="a"),),
                          joints=(pcfg.Joint(name="j", parent="a", child="nope"),))
        with pytest.raises(ValueError):
            System(cfg)


class TestFK:
    def test_default_angle_is_limit_midpoint(self, ant_sys):
        deg = np.degrees(np.asarray(ant_sys.default_angle()))
        np.testing.assert_allclose(deg, [0, 50, 0, -50, 0, -50, 0, 50], atol=1e-4)

    def test_angle_readback_matches_fk_input(self, ant_sys):
        rng = np.random.default_rng(0)
        target = jnp.asarray(
            np.radians(rng.uniform(-25, 25, 8) + np.array([0, 50, 0, -50, 0, -50, 0, 50])),
            jnp.float32,
        )
        qp = ant_sys.default_qp(joint_angle=target)
        (angles,), _ = ant_sys.joints[0].angle_vel(qp)
        np.testing.assert_allclose(np.asarray(angles), np.asarray(target), atol=1e-5)

    def test_velocity_readback(self, ant_sys):
        vels = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, 8), jnp.float32)
        qp = ant_sys.default_qp(joint_velocity=vels)
        _, (got,) = ant_sys.joints[0].angle_vel(qp)
        np.testing.assert_allclose(np.asarray(got), np.asarray(vels), atol=1e-5)

    def test_legs_below_torso(self, ant_sys):
        qp = ant_sys.default_qp()
        pos = np.asarray(qp.pos)
        torso_z = pos[0, 2]
        for leg in (2, 4, 6, 8):  # lower-leg body rows
            assert pos[leg, 2] < torso_z


class TestDynamics:
    def test_settles_without_action(self, ant_sys):
        step = jax.jit(ant_sys.step)

        def roll(q, n):
            def body(q, _):
                q, _ = ant_sys.step(q, jnp.zeros(8))
                return q, q.pos[0, 2]

            return jax.lax.scan(body, q, None, length=n)

        q, zs = jax.jit(roll, static_argnums=1)(ant_sys.default_qp(), 200)
        zs = np.asarray(zs)
        assert np.isfinite(zs).all()
        assert 0.2 < zs[-1] < 1.0  # alive band (ant_tag.py:111-112)
        # settled: last 50 steps nearly constant
        assert np.abs(np.diff(zs[-50:])).max() < 1e-3

    def test_random_actions_stable_1000_steps(self, ant_sys):
        def roll(key):
            keys = jax.random.split(key, 1000)

            def body(q, k):
                act = jax.random.uniform(k, (8,), minval=-1.0, maxval=1.0)
                q, _ = ant_sys.step(q, act)
                return q, (jnp.abs(q.vel).max(), q.pos[0, 2])

            _, out = jax.lax.scan(body, ant_sys.default_qp(), keys)
            return out

        mv, z = jax.jit(roll)(jax.random.PRNGKey(0))
        assert np.isfinite(np.asarray(mv)).all()
        assert np.asarray(mv).max() < 50.0
        assert np.asarray(z).min() > 0.0

    def test_determinism(self, ant_sys):
        step = jax.jit(ant_sys.step)
        act = jnp.full((8,), 0.3)
        q1, _ = step(ant_sys.default_qp(), act)
        q2, _ = step(ant_sys.default_qp(), act)
        np.testing.assert_array_equal(np.asarray(q1.pos), np.asarray(q2.pos))

    def test_vmap_matches_single(self, ant_sys):
        """Batch env b of a vmapped step equals the same single-env step."""
        act = jnp.asarray(np.random.default_rng(2).uniform(-1, 1, (4, 8)), jnp.float32)
        qp0 = ant_sys.default_qp()
        batched = jax.tree.map(lambda x: jnp.broadcast_to(x, (4,) + x.shape), qp0)
        bq, binfo = jax.jit(jax.vmap(ant_sys.step))(batched, act)
        sq, sinfo = jax.jit(ant_sys.step)(qp0, act[2])
        np.testing.assert_allclose(np.asarray(bq.pos[2]), np.asarray(sq.pos), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(binfo.contact.vel[2]), np.asarray(sinfo.contact.vel), atol=1e-6
        )

    def test_contact_info_nonzero_on_ground(self, ant_sys):
        # after settling, feet contacts support the ant against gravity
        def roll(q):
            def body(q, _):
                q, info = ant_sys.step(q, jnp.zeros(8))
                return q, info

            return jax.lax.scan(body, q, None, length=100)

        _, infos = jax.jit(roll)(ant_sys.default_qp())
        last_contact = np.asarray(infos.contact.vel)[-1]
        assert np.abs(last_contact).sum() > 0.0

    def test_actuation_moves_ant(self, ant_sys):
        def roll(q):
            def body(q, t):
                act = jnp.sin(t * 0.3) * jnp.ones(8)
                q, _ = ant_sys.step(q, act)
                return q, None

            q, _ = jax.lax.scan(body, q, jnp.arange(100.0))
            return q

        q = jax.jit(roll)(ant_sys.default_qp())
        assert float(jnp.linalg.norm(q.pos[0, :2])) > 0.05


class TestFrozenAndWalls:
    def test_frozen_body_never_moves(self):
        cfg = ant.ant_config()
        cfg = cfg.add_body(
            pcfg.Body(name="Target", colliders=(pcfg.Collider(geom=pcfg.Sphere(0.5)),), frozen=True)
        )
        cfg = cfg.add_default_qp(pcfg.DefaultQP(name="Target", pos=(3.0, 2.0, 1.0)))
        sys_ = System(cfg)
        tgt = sys_.body.index["Target"]

        def roll(q):
            def body(q, _):
                q, _ = sys_.step(q, jnp.ones(8) * 0.5)
                return q, None

            q, _ = jax.lax.scan(body, q, None, length=50)
            return q

        q0 = sys_.default_qp()
        np.testing.assert_allclose(np.asarray(q0.pos[tgt]), [3.0, 2.0, 1.0], atol=1e-6)
        q = jax.jit(roll)(q0)
        np.testing.assert_array_equal(np.asarray(q.pos[tgt]), np.asarray(q0.pos[tgt]))

    def test_arena_wall_blocks_ant(self):
        """An ant shoved toward a box wall must not pass through it."""
        cfg = ant.ant_config()
        cfg = scene.draw_arena(cfg, 2.0, 2.0, 0.5)
        for name in ant.ANT_BODY_NAMES:
            cfg = cfg.add_collide_pair(name, "Arena")
        sys_ = System(cfg)

        q0 = sys_.default_qp()
        q0 = q0.replace(vel=q0.vel.at[:9, 0].set(4.0))  # shove ant bodies toward +x wall

        def roll(q):
            def body(q, _):
                q, _ = sys_.step(q, jnp.zeros(8))
                return q, q.pos[0, 0]

            return jax.lax.scan(body, q, None, length=100)

        q, xs = jax.jit(roll)(q0)
        xs = np.asarray(xs)
        assert np.isfinite(xs).all()
        # wall inner face is at x = 2.0; torso (radius .25) must stay inside-ish
        assert xs.max() < 2.3

    def test_capsule_wall_blocks_ant(self):
        cfg = ant.ant_config()
        cfg = scene.draw_arena(cfg, 2.0, 2.0, 0.5, use_boxes=False)
        for name in ant.ANT_BODY_NAMES:
            cfg = cfg.add_collide_pair(name, "Arena")
        sys_ = System(cfg)
        q0 = sys_.default_qp()
        q0 = q0.replace(vel=q0.vel.at[:9, 1].set(4.0))

        def roll(q):
            def body(q, _):
                q, _ = sys_.step(q, jnp.zeros(8))
                return q, q.pos[0, 1]

            return jax.lax.scan(body, q, None, length=100)

        _, ys = jax.jit(roll)(q0)
        ys = np.asarray(ys)
        assert np.isfinite(ys).all()
        assert ys.max() < 2.6
