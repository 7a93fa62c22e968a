"""Closed-form pins of every dynamic law (docs/DERIVATION.md §6.1).

Each test asserts one engine law against a hand-derived closed form, so any
change to a formula or constant — integration, damping, joint spring, limit
torque, alignment torque, actuators, Baumgarte contact impulse, Coulomb
friction clamp, FK — fails loudly. These are the executable half of the
legacy-brax term derivation in docs/DERIVATION.md.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pobrax_tpu.physics import config as c
from pobrax_tpu.physics import system as psys
from pobrax_tpu.physics.joints import ANGLE_SERVO_GAIN
from pobrax_tpu.physics.state import QP


def _free_body(gravity=(0.0, 0.0, -9.8), velocity_damping=0.0,
               angular_damping=0.0, dt=0.05, substeps=10):
    return psys.System(c.Config(
        bodies=(c.Body(name="b", mass=1.0),),
        gravity=gravity, velocity_damping=velocity_damping,
        angular_damping=angular_damping, dt=dt, substeps=substeps,
    ))


class TestIntegrator:
    def test_free_fall_closed_form(self):
        # vel_k = g h k ; pos_k = z0 + g h^2 k(k+1)/2  (semi-implicit Euler)
        g, dt, K = -9.8, 0.05, 10
        sys_ = _free_body(gravity=(0.0, 0.0, g), dt=dt, substeps=K)
        h = dt / K
        qp = QP.zero(1).replace(pos=jnp.array([[0.0, 0.0, 10.0]]))
        qp, _ = jax.jit(sys_.step)(qp, jnp.zeros((0,)))
        np.testing.assert_allclose(float(qp.vel[0, 2]), g * h * K, rtol=1e-6)
        np.testing.assert_allclose(
            float(qp.pos[0, 2]), 10.0 + g * h * h * K * (K + 1) / 2, rtol=1e-6)

    def test_damping_exponential_decay(self):
        # vel' = e^(c h) vel per substep => vel_K = v0 e^(c h K), exactly
        cdamp, dt, K = -2.0, 0.05, 10
        sys_ = _free_body(gravity=(0.0, 0.0, 0.0), velocity_damping=cdamp,
                          angular_damping=cdamp, dt=dt, substeps=K)
        h = dt / K
        v0, w0 = 3.0, 1.5
        qp = QP.zero(1).replace(vel=jnp.array([[v0, 0.0, 0.0]]),
                                ang=jnp.array([[0.0, 0.0, w0]]))
        qp, _ = jax.jit(sys_.step)(qp, jnp.zeros((0,)))
        decay = math.exp(cdamp * h * K)
        np.testing.assert_allclose(float(qp.vel[0, 0]), v0 * decay, rtol=1e-5)
        np.testing.assert_allclose(float(qp.ang[0, 2]), w0 * decay, rtol=1e-5)

    def test_quaternion_integration_closed_form(self):
        # each substep advances the rotation by exactly 2*atan(w h / 2)
        w, dt, K = 2.0, 0.05, 10
        sys_ = _free_body(gravity=(0.0, 0.0, 0.0), dt=dt, substeps=K)
        h = dt / K
        qp = QP.zero(1).replace(ang=jnp.array([[0.0, 0.0, w]]))
        qp, _ = jax.jit(sys_.step)(qp, jnp.zeros((0,)))
        theta = 2.0 * math.atan2(float(qp.rot[0, 3]), float(qp.rot[0, 0]))
        np.testing.assert_allclose(theta, K * 2.0 * math.atan(w * h / 2.0),
                                   rtol=1e-5)


def _joint_pair(stiffness=100.0, spring_damping=0.0, limit=(-180.0, 180.0),
                limit_strength=None, angular_damping=0.0, actuators=(),
                substeps=1, dt=0.01):
    """Parent + child at the origin, 1-dof hinge about world x, zero offsets:
    every joint term can be isolated by posing the child."""
    return psys.System(c.Config(
        bodies=(c.Body(name="p", mass=2.0), c.Body(name="ch", mass=1.0)),
        joints=(c.Joint(name="j", parent="p", child="ch",
                        stiffness=stiffness, spring_damping=spring_damping,
                        limit_strength=limit_strength,
                        angular_damping=angular_damping,
                        angle_limits=(c.AngleLimit(*limit),)),),
        actuators=actuators,
        gravity=(0.0, 0.0, 0.0), dt=dt, substeps=substeps,
    ))


def _rot_x(deg):
    half = math.radians(deg) / 2.0
    return jnp.array([math.cos(half), math.sin(half), 0.0, 0.0])


def _rot_y(deg):
    half = math.radians(deg) / 2.0
    return jnp.array([math.cos(half), 0.0, math.sin(half), 0.0])


class TestJointLaws:
    def test_joint_spring_force_law(self):
        # anchors displaced by d, zero velocity: dv_child = k d h / m_child
        k, d, h = 100.0, 0.3, 0.01
        sys_ = _joint_pair(stiffness=k, dt=h, substeps=1)
        qp = QP.zero(2).replace(
            pos=jnp.array([[0.0, 0.0, 0.0], [d, 0.0, 0.0]]))
        qp2, _ = jax.jit(sys_.step)(qp, jnp.zeros((0,)))
        np.testing.assert_allclose(float(qp2.vel[1, 0]), -k * d * h / 1.0,
                                   rtol=1e-6)
        np.testing.assert_allclose(float(qp2.vel[0, 0]), k * d * h / 2.0,
                                   rtol=1e-6)

    def test_spring_damping_term(self):
        # coincident anchors, relative anchor velocity dv:
        # force_on_child = kd * (v_p - v_c)
        kd, h, vc = 7.0, 0.01, 0.4
        sys_ = _joint_pair(stiffness=0.0, spring_damping=kd, dt=h, substeps=1)
        qp = QP.zero(2).replace(vel=jnp.array([[0.0, 0.0, 0.0],
                                               [vc, 0.0, 0.0]]))
        qp2, _ = jax.jit(sys_.step)(qp, jnp.zeros((0,)))
        # child: vel + (kd*(0 - vc))*h/m_c ; inertia of anchors at body COM
        np.testing.assert_allclose(float(qp2.vel[1, 0]), vc - kd * vc * h,
                                   rtol=1e-6)

    def test_limit_torque_law(self):
        # child rotated 30 deg about the hinge, limits ±10 deg:
        # torque = klim * (10deg - 30deg) about x
        klim, h = 50.0, 0.01
        sys_ = _joint_pair(stiffness=0.0, limit=(-10.0, 10.0),
                           limit_strength=klim, dt=h, substeps=1)
        qp = QP.zero(2).replace(rot=jnp.stack([_rot_x(0.0), _rot_x(30.0)]))
        qp2, _ = jax.jit(sys_.step)(qp, jnp.zeros((0,)))
        expected = klim * (math.radians(10.0) - math.radians(30.0)) * h
        np.testing.assert_allclose(float(qp2.ang[1, 0]), expected, rtol=1e-5)
        np.testing.assert_allclose(float(qp2.ang[0, 0]), -expected, rtol=1e-5)

    def test_alignment_torque_restores_locked_axis(self):
        # child rotated phi about the LOCKED y axis:
        # torque_child = -k * 2 sin(phi/2) about y (small-angle rotation vec)
        k, phi_deg, h = 80.0, 12.0, 0.01
        sys_ = _joint_pair(stiffness=k, dt=h, substeps=1)
        qp = QP.zero(2).replace(rot=jnp.stack([_rot_x(0.0), _rot_y(phi_deg)]))
        qp2, _ = jax.jit(sys_.step)(qp, jnp.zeros((0,)))
        expected = -k * 2.0 * math.sin(math.radians(phi_deg) / 2.0) * h
        np.testing.assert_allclose(float(qp2.ang[1, 1]), expected, rtol=1e-5)

    def test_torque_actuator_law(self):
        # tau = strength * clip(act, -1, 1) about the world hinge axis
        s, a, h = 40.0, 0.5, 0.01
        sys_ = _joint_pair(
            stiffness=0.0, dt=h, substeps=1,
            actuators=(c.Actuator(name="j", joint="j", strength=s),))
        qp = QP.zero(2)
        qp2, _ = jax.jit(sys_.step)(qp, jnp.array([a]))
        np.testing.assert_allclose(float(qp2.ang[1, 0]), s * a * h, rtol=1e-6)
        np.testing.assert_allclose(float(qp2.ang[0, 0]), -s * a * h, rtol=1e-6)
        # clipping: act = 3 saturates to strength
        qp3, _ = jax.jit(sys_.step)(qp, jnp.array([3.0]))
        np.testing.assert_allclose(float(qp3.ang[1, 0]), s * h, rtol=1e-6)

    def test_angle_servo_law(self):
        # tau = clip(GAIN * (target - angle), ±strength); angle = 0 here
        s, target, h = 40.0, 0.2, 0.01
        sys_ = _joint_pair(
            stiffness=0.0, dt=h, substeps=1,
            actuators=(c.Actuator(name="j", joint="j", strength=s,
                                  kind="angle"),))
        qp = QP.zero(2)
        qp2, _ = jax.jit(sys_.step)(qp, jnp.array([target]))
        np.testing.assert_allclose(float(qp2.ang[1, 0]),
                                   ANGLE_SERVO_GAIN * target * h, rtol=1e-6)
        # saturation at ±strength
        qp3, _ = jax.jit(sys_.step)(qp, jnp.array([100.0]))
        np.testing.assert_allclose(float(qp3.ang[1, 0]), s * h, rtol=1e-6)


def _ball_on_plane(elasticity=0.0, friction=1.0, baumgarte_erp=0.1,
                   dt=0.01, mass=2.0, radius=0.5):
    return psys.System(c.Config(
        bodies=(
            c.Body(name="ball", mass=mass,
                   colliders=(c.Collider(geom=c.Sphere(radius)),)),
            c.Body(name="G", colliders=(c.Collider(geom=c.Plane()),),
                   frozen=True),
        ),
        collide_include=(("ball", "G"),),
        gravity=(0.0, 0.0, 0.0), elasticity=elasticity, friction=friction,
        baumgarte_erp=baumgarte_erp, dt=dt, substeps=1,
    ))


class TestContactLaws:
    def test_contact_impulse_closed_form(self):
        # head-on sphere-plane: dv = (1+e)|vn| + (erp/h) * pen  (ang term is
        # zero because r_a x n = 0), friction inactive (no tangential vel)
        e, erp, h, m, r = 0.0, 0.1, 0.01, 2.0, 0.5
        sys_ = _ball_on_plane(elasticity=e, baumgarte_erp=erp, dt=h, mass=m,
                              radius=r)
        z0, vz = 0.45, -1.0
        qp = QP.zero(2).replace(
            pos=jnp.array([[0.0, 0.0, z0], [0.0, 0.0, 0.0]]),
            vel=jnp.array([[0.0, 0.0, vz], [0.0, 0.0, 0.0]]))
        qp2, _ = jax.jit(sys_.step)(qp, jnp.zeros((0,)))
        # substep: kinetic first moves the ball, contact sees the new pen
        z1 = z0 + vz * h
        pen = r - z1
        imp = ((1 + e) * (-vz) + (erp / h) * pen) / (1.0 / m)
        expected_vz = vz + imp * (1.0 / m)
        np.testing.assert_allclose(float(qp2.vel[0, 2]), expected_vz,
                                   rtol=1e-5)

    def test_contact_inactive_without_penetration(self):
        sys_ = _ball_on_plane(dt=0.01)
        qp = QP.zero(2).replace(
            pos=jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, 0.0]]),
            vel=jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 0.0]]))
        qp2, _ = jax.jit(sys_.step)(qp, jnp.zeros((0,)))
        np.testing.assert_allclose(float(qp2.vel[0, 2]), -1.0, rtol=1e-6)

    @pytest.mark.parametrize("vx,clamped", [(0.05, False), (10.0, True)])
    def test_friction_coulomb_clamp(self, vx, clamped):
        # slow slide: tangential impulse removes ALL tangential velocity;
        # fast slide: clamped at mu * normal_impulse
        e, erp, h, m, r, mu = 0.0, 0.1, 0.01, 2.0, 0.5, 1.0
        sys_ = _ball_on_plane(elasticity=e, friction=mu, baumgarte_erp=erp,
                              dt=h, mass=m, radius=r)
        z0, vz = 0.45, -1.0
        qp = QP.zero(2).replace(
            pos=jnp.array([[0.0, 0.0, z0], [0.0, 0.0, 0.0]]),
            vel=jnp.array([[vx, 0.0, vz], [0.0, 0.0, 0.0]]))
        qp2, _ = jax.jit(sys_.step)(qp, jnp.zeros((0,)))
        z1 = z0 + vz * h
        pen = r - z1
        imp = ((1 + e) * (-vz) + (erp / h) * pen) / (1.0 / m)
        if clamped:
            expected_vx = vx - mu * imp * (1.0 / m)
        else:
            expected_vx = 0.0  # vt/denom * inv_mass = vt: full stop
        np.testing.assert_allclose(float(qp2.vel[0, 0]), expected_vx,
                                   atol=1e-5)


class TestFK:
    def test_fk_two_link_right_angle(self):
        # root frozen at (0,0,1); hinge about x, anchor 0.1 below root,
        # child offset 0.2: at 90deg the child hangs sideways along +y
        sys_ = psys.System(c.Config(
            bodies=(c.Body(name="root", frozen=True),
                    c.Body(name="a", mass=1.0)),
            joints=(c.Joint(name="j", parent="root", child="a",
                            stiffness=100.0,
                            parent_offset=(0.0, 0.0, -0.1),
                            child_offset=(0.0, 0.0, 0.2),
                            angle_limits=(c.AngleLimit(-180.0, 180.0),)),),
            default_qps=(c.DefaultQP(name="root", pos=(0.0, 0.0, 1.0)),),
            gravity=(0.0, 0.0, 0.0), dt=0.01, substeps=1,
        ))
        qp = sys_.default_qp(joint_angle=jnp.array([math.pi / 2.0]))
        # anchor = (0,0,0.9); rotate_x(90)(0,0,0.2) = (0,-0.2,0)
        np.testing.assert_allclose(
            np.asarray(qp.pos[1]), np.array([0.0, 0.2, 0.9]), atol=1e-6)
        # child quaternion is the 90deg x-rotation
        np.testing.assert_allclose(
            np.asarray(qp.rot[1]),
            np.array([math.cos(math.pi / 4), math.sin(math.pi / 4), 0.0, 0.0]),
            atol=1e-6)

    def test_fk_velocity_of_child(self):
        # joint velocity w about x: child COM at lever arm L below the anchor
        # picks up speed w*L along -y... (cross(w x, r))
        sys_ = psys.System(c.Config(
            bodies=(c.Body(name="root", frozen=True),
                    c.Body(name="a", mass=1.0)),
            joints=(c.Joint(name="j", parent="root", child="a",
                            stiffness=100.0,
                            parent_offset=(0.0, 0.0, -0.1),
                            child_offset=(0.0, 0.0, 0.2),
                            angle_limits=(c.AngleLimit(-180.0, 180.0),)),),
            default_qps=(c.DefaultQP(name="root", pos=(0.0, 0.0, 1.0)),),
            gravity=(0.0, 0.0, 0.0), dt=0.01, substeps=1,
        ))
        w = 1.5
        qp = sys_.default_qp(joint_angle=jnp.zeros(1),
                             joint_velocity=jnp.array([w]))
        np.testing.assert_allclose(np.asarray(qp.ang[1]),
                                   np.array([w, 0.0, 0.0]), atol=1e-6)
        # child pos = (0,0,0.7); r = pos - anchor = (0,0,-0.2);
        # v = w x_hat × r = (0, w*0.2, 0)
        np.testing.assert_allclose(
            np.asarray(qp.vel[1]), np.array([0.0, w * 0.2, 0.0]), atol=1e-6)
