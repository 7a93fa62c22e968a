"""Fused (scalar-unrolled) physics path vs the generic vectorized path.

The fused path is the TPU fast path (physics/fused.py); on CPU it is gated
off by default for compile time, so these tests force it on via
POBRAX_FUSED on a system small enough to compile quickly and cross-validate
numerics against step_generic.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pobrax_tpu.physics import config as c
from pobrax_tpu.physics import system as psys
from pobrax_tpu.physics.state import QP


def _mini_system():
    cfg = c.Config(
        bodies=(
            c.Body(name="a", colliders=(c.Collider(geom=c.Sphere(0.2)),), mass=1.0),
            c.Body(name="b",
                   colliders=(c.Collider(geom=c.Capsule(radius=0.1, length=0.4)),),
                   mass=1.5),
            c.Body(name="wall",
                   colliders=(c.Collider(geom=c.Box(halfsize=(0.2, 1.0, 0.5)),
                                         position=(1.0, 0.0, 0.5)),),
                   frozen=True),
            c.Body(name="G", colliders=(c.Collider(geom=c.Plane()),), frozen=True),
        ),
        joints=(c.Joint(name="j", parent="a", child="b", stiffness=5000.0,
                        parent_offset=(0.1, 0.0, 0.0), child_offset=(0.0, 0.0, 0.2),
                        angle_limits=(c.AngleLimit(-45.0, 45.0),),
                        angular_damping=20.0),),
        actuators=(c.Actuator(name="j", joint="j", strength=50.0),),
        thrusters=(c.Thruster(name="t", body="a", strength=10.0,
                              direction=(1.0, 0.0, 0.0)),),
        collide_include=(("a", "G"), ("b", "G"), ("a", "b"),
                         ("a", "wall"), ("b", "wall")),
        default_qps=(c.DefaultQP(name="a", pos=(0.6, 0.0, 0.5)),),
        dt=0.05, substeps=10,
    )
    os.environ["POBRAX_FUSED"] = "1"
    try:
        sys_ = psys.System(cfg)
    finally:
        del os.environ["POBRAX_FUSED"]
    return sys_


def test_fused_builds_and_matches_generic():
    sys_ = _mini_system()
    assert sys_._fused_step is not None
    qp = sys_.default_qp()
    act = jnp.array([0.3, -0.5])
    q1, i1 = jax.jit(sys_.step_generic)(qp, act)
    q2, i2 = jax.jit(sys_._fused_step)(qp, act)
    # float32 reassociation across stiff contact impulses: ~1e-4 absolute on
    # O(10) velocities is round-off, not divergence
    np.testing.assert_allclose(np.asarray(q1.pos), np.asarray(q2.pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(q1.rot), np.asarray(q2.rot), atol=1e-5)
    np.testing.assert_allclose(np.asarray(q1.vel), np.asarray(q2.vel), atol=1e-3)
    np.testing.assert_allclose(np.asarray(q1.ang), np.asarray(q2.ang), atol=1e-3)
    np.testing.assert_allclose(np.asarray(i1.contact.vel),
                               np.asarray(i2.contact.vel), atol=1e-3)


def test_fused_matches_generic_over_rollout():
    sys_ = _mini_system()
    qp = sys_.default_qp()

    def roll(step_fn, qp):
        def body(q, t):
            q, _ = step_fn(q, jnp.stack([jnp.sin(0.1 * t), jnp.cos(0.1 * t)]))
            return q, q.pos
        return jax.lax.scan(body, qp, jnp.arange(20, dtype=jnp.float32))

    _, p1 = jax.jit(lambda q: roll(sys_.step_generic, q))(qp)
    _, p2 = jax.jit(lambda q: roll(sys_._fused_step, q))(qp)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=2e-3)


def test_fused_vmaps():
    sys_ = _mini_system()
    B = 4
    qp = sys_.default_qp()
    qps = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), qp)
    acts = jnp.zeros((B, 2))
    q, info = jax.jit(jax.vmap(sys_._fused_step))(qps, acts)
    assert q.pos.shape == (B, 4, 3)
    single, _ = jax.jit(sys_._fused_step)(qp, acts[0])
    np.testing.assert_allclose(np.asarray(q.pos[1]), np.asarray(single.pos), atol=1e-6)


def test_fused_multidof_and_servo_match_generic():
    """2-dof joint + angle actuator: fused matches the generic path."""
    cfg = c.Config(
        bodies=(
            c.Body(name="root", frozen=True),
            c.Body(name="a", colliders=(
                c.Collider(geom=c.Capsule(radius=0.05, length=0.4)),), mass=1.0),
            c.Body(name="b", colliders=(
                c.Collider(geom=c.Capsule(radius=0.05, length=0.4)),), mass=1.0),
        ),
        joints=(
            c.Joint(name="u", parent="root", child="a",
                    stiffness=4000.0, spring_damping=126.0, angular_damping=5.0,
                    parent_offset=(0.0, 0.0, 0.0), child_offset=(0.0, 0.0, 0.2),
                    angle_limits=(c.AngleLimit(-40, 40), c.AngleLimit(-30, 30))),
            c.Joint(name="h", parent="a", child="b",
                    stiffness=4000.0, spring_damping=126.0, angular_damping=5.0,
                    parent_offset=(0.0, 0.0, -0.2), child_offset=(0.0, 0.0, 0.2),
                    angle_limits=(c.AngleLimit(-60, 10),)),
        ),
        actuators=(c.Actuator(name="u", joint="u", strength=20.0, kind="angle"),
                   c.Actuator(name="h", joint="h", strength=20.0)),
        default_qps=(c.DefaultQP(name="root", pos=(0.0, 0.0, 1.5)),),
        dt=0.04, substeps=10,
    )
    os.environ["POBRAX_FUSED"] = "1"
    try:
        sys_ = psys.System(cfg)
    finally:
        del os.environ["POBRAX_FUSED"]
    assert sys_._fused_step is not None
    qp = sys_.default_qp()
    act = jnp.array([0.2, -0.1, 0.4])  # 2 servo dims + 1 torque dim
    q1, _ = jax.jit(sys_.step_generic)(qp, act)
    q2, _ = jax.jit(sys_._fused_step)(qp, act)
    np.testing.assert_allclose(np.asarray(q1.pos), np.asarray(q2.pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(q1.rot), np.asarray(q2.rot), atol=1e-5)
    np.testing.assert_allclose(np.asarray(q1.vel), np.asarray(q2.vel), atol=1e-3)
    np.testing.assert_allclose(np.asarray(q1.ang), np.asarray(q2.ang), atol=1e-3)


def _walled_system():
    """A sphere + capsule amid 6 frozen wall boxes: 12 capsule-box rows,
    enough to exercise the (K,)-vectorized contact phase with per-body
    row grouping."""
    walls = []
    for i, (x, y) in enumerate([(1.2, 0), (-1.2, 0), (0, 1.2), (0, -1.2),
                                (0.9, 0.9), (-0.9, -0.9)]):
        walls.append(c.Body(
            name=f"w{i}",
            colliders=(c.Collider(geom=c.Box(halfsize=(0.15, 0.8, 0.5)),
                                  position=(x, y, 0.5),
                                  rotation=(0.0, 0.0, 30.0 * i)),),
            frozen=True))
    pairs = tuple(("a", f"w{i}") for i in range(6)) \
        + tuple(("b", f"w{i}") for i in range(6)) \
        + (("a", "G"), ("b", "G"))
    cfg = c.Config(
        bodies=(
            c.Body(name="a", colliders=(c.Collider(geom=c.Sphere(0.2)),), mass=1.0),
            c.Body(name="b",
                   colliders=(c.Collider(geom=c.Capsule(radius=0.1, length=0.6)),),
                   mass=1.5),
            c.Body(name="G", colliders=(c.Collider(geom=c.Plane()),), frozen=True),
        ) + tuple(walls),
        joints=(c.Joint(name="j", parent="a", child="b", stiffness=5000.0,
                        parent_offset=(0.1, 0.0, 0.0), child_offset=(0.0, 0.0, 0.2),
                        angle_limits=(c.AngleLimit(-45.0, 45.0),),
                        angular_damping=20.0),),
        actuators=(c.Actuator(name="j", joint="j", strength=50.0),),
        collide_include=pairs,
        default_qps=(c.DefaultQP(name="a", pos=(0.8, 0.4, 0.5)),),
        dt=0.05, substeps=10,
    )
    os.environ["POBRAX_FUSED"] = "1"
    try:
        sys_ = psys.System(cfg)
    finally:
        del os.environ["POBRAX_FUSED"]
    return sys_


def test_fused_cb_vectorized_matches_scalar_and_generic(monkeypatch):
    """The vectorized capsule-box phase must agree with both the scalar
    fused branch and the generic path (same math, different summation)."""
    monkeypatch.setenv("POBRAX_CB_VEC_MIN", "1")
    monkeypatch.setenv("POBRAX_PP_VEC_MIN", "1")
    sys_vec = _walled_system()
    monkeypatch.setenv("POBRAX_CB_VEC_MIN", "999")
    monkeypatch.setenv("POBRAX_PP_VEC_MIN", "999")
    sys_scal = _walled_system()
    assert sys_vec._fused_step is not None

    qp = sys_vec.default_qp()

    def roll(step_fn, qp):
        def body(q, t):
            q, info = step_fn(q, jnp.stack([jnp.sin(0.3 * t)]))
            return q, (q.pos, info.contact.vel)
        return jax.lax.scan(body, qp, jnp.arange(20, dtype=jnp.float32))

    _, (pg, cg) = jax.jit(lambda q: roll(sys_vec.step_generic, q))(qp)
    _, (pv, cv) = jax.jit(lambda q: roll(sys_vec._fused_step, q))(qp)
    _, (ps, cs) = jax.jit(lambda q: roll(sys_scal._fused_step, q))(qp)
    # walls must actually be hit for this test to mean anything
    assert float(jnp.abs(cv).max()) > 0.0
    np.testing.assert_allclose(np.asarray(pv), np.asarray(ps), atol=2e-3)
    np.testing.assert_allclose(np.asarray(pv), np.asarray(pg), atol=2e-3)
    np.testing.assert_allclose(np.asarray(cv), np.asarray(cs), atol=2e-3)


def test_fused_under_sharding_matches_single_device():
    """POBRAX_FUSED=1 across a multi-device 'data' mesh must reproduce the
    single-device rollout — the production pod program shape
    (fused physics x vmap batch x sharded mesh) validated end-to-end."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys_ = _walled_system()
    devices = jax.devices()
    if len(devices) < 2:
        pytest.skip("needs >= 2 devices (conftest provisions 8 CPU devices)")
    B = 2 * len(devices)

    qp1 = sys_.default_qp()
    qps = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), qp1)
    # give each env a different push so lanes are not degenerate
    acts = jnp.linspace(-1.0, 1.0, B)[:, None]

    def roll(qps, acts):
        def body(q, t):
            q, _ = jax.vmap(sys_._fused_step)(q, acts * jnp.sin(0.3 * t))
            return q, q.pos
        return jax.lax.scan(body, qps, jnp.arange(10, dtype=jnp.float32))

    _, pos_single = jax.jit(roll)(qps, acts)

    mesh = Mesh(devices, ("data",))
    sharding = NamedSharding(mesh, P("data"))
    qps_sh = jax.device_put(qps, sharding)
    acts_sh = jax.device_put(acts, sharding)
    _, pos_sharded = jax.jit(roll)(qps_sh, acts_sh)

    np.testing.assert_allclose(
        np.asarray(pos_single), np.asarray(pos_sharded), atol=1e-6)


def test_info_contact_only_gate(monkeypatch):
    """POBRAX_INFO=contact skips the joint/actuator Info accumulators (no
    env consumes them — observations read only contact.vel/.ang, reference
    ant_tag.py:174-177): qp and contact info must be bit-identical to the
    full path, joint/actuator zeros."""
    monkeypatch.setenv("POBRAX_INFO", "contact")
    sys_c = _mini_system()
    monkeypatch.setenv("POBRAX_INFO", "full")
    sys_f = _mini_system()
    qp = sys_c.default_qp()
    act = jnp.array([0.3, -0.5])
    qc, ic = jax.jit(sys_c._fused_step)(qp, act)
    qf, if_ = jax.jit(sys_f._fused_step)(qp, act)
    for name in ("pos", "rot", "vel", "ang"):
        np.testing.assert_array_equal(
            np.asarray(getattr(qc, name)), np.asarray(getattr(qf, name)))
    np.testing.assert_array_equal(np.asarray(ic.contact.vel),
                                  np.asarray(if_.contact.vel))
    np.testing.assert_array_equal(np.asarray(ic.contact.ang),
                                  np.asarray(if_.contact.ang))
    assert float(jnp.abs(ic.joint.vel).max()) == 0.0
    assert float(jnp.abs(ic.actuator.ang).max()) == 0.0
    assert float(jnp.abs(if_.joint.vel).max()) > 0.0  # full path populates


def test_fused_cb_repeat_branch_matches_concat(monkeypatch):
    """The K-adaptive endpoint broadcast (POBRAX_REP_CONCAT_MAX) must be a
    pure strategy switch: forcing the array-repeat branch (threshold 0) and
    the concat branch (threshold high) on the same walled system gives
    bit-close trajectories (the K>64 maze path runs the repeat branch in
    production, which no small test system reaches by default)."""
    monkeypatch.setenv("POBRAX_CB_VEC_MIN", "1")
    monkeypatch.setenv("POBRAX_REP_CONCAT_MAX", "0")  # force array-repeat
    sys_rep = _walled_system()
    monkeypatch.setenv("POBRAX_REP_CONCAT_MAX", "9999")  # force concat
    sys_cat = _walled_system()

    qp = sys_rep.default_qp()

    def roll(step_fn, qp):
        def body(q, t):
            q, info = step_fn(q, jnp.stack([jnp.sin(0.3 * t)]))
            return q, (q.pos, info.contact.vel)
        return jax.lax.scan(body, qp, jnp.arange(20, dtype=jnp.float32))

    _, (pr, cr) = jax.jit(lambda q: roll(sys_rep._fused_step, q))(qp)
    _, (pc, cc) = jax.jit(lambda q: roll(sys_cat._fused_step, q))(qp)
    assert float(jnp.abs(cr).max()) > 0.0  # walls actually hit
    np.testing.assert_allclose(np.asarray(pr), np.asarray(pc), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cr), np.asarray(cc), atol=1e-6)
