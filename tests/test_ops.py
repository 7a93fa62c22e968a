"""Unit tests for the quaternion/vector numeric core."""

import jax.numpy as jnp
import numpy as np
import pytest

from pobrax_tpu import ops


def _rand_quat(rng, shape=()):
    q = rng.normal(size=shape + (4,)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestQuatAlgebra:
    def test_mul_identity(self):
        rng = np.random.default_rng(0)
        q = _rand_quat(rng, (5,))
        e = jnp.tile(jnp.array([1.0, 0, 0, 0]), (5, 1))
        np.testing.assert_allclose(ops.quat_mul(q, e), q, atol=1e-6)
        np.testing.assert_allclose(ops.quat_mul(e, q), q, atol=1e-6)

    def test_inv_is_inverse(self):
        rng = np.random.default_rng(1)
        q = _rand_quat(rng, (7,))
        prod = ops.quat_mul(q, ops.quat_inv(q))
        expect = np.tile([1.0, 0, 0, 0], (7, 1))
        np.testing.assert_allclose(prod, expect, atol=1e-6)

    def test_rotate_matches_matrix(self):
        rng = np.random.default_rng(2)
        q = _rand_quat(rng, (10,))
        v = rng.normal(size=(10, 3)).astype(np.float32)
        got = np.asarray(ops.rotate(v, q))
        # reference: rotation matrix from quaternion
        w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
        R = np.stack(
            [
                np.stack([1 - 2 * (y**2 + z**2), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
                np.stack([2 * (x * y + w * z), 1 - 2 * (x**2 + z**2), 2 * (y * z - w * x)], -1),
                np.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x**2 + y**2)], -1),
            ],
            axis=1,
        )
        expect = np.einsum("bij,bj->bi", R, v)
        np.testing.assert_allclose(got, expect, atol=1e-5)

    def test_rotate_preserves_norm(self):
        rng = np.random.default_rng(3)
        q = _rand_quat(rng, (6,))
        v = rng.normal(size=(6, 3)).astype(np.float32)
        np.testing.assert_allclose(
            np.linalg.norm(ops.rotate(v, q), axis=-1), np.linalg.norm(v, axis=-1), rtol=1e-5
        )

    def test_inv_rotate_roundtrip(self):
        rng = np.random.default_rng(4)
        q = _rand_quat(rng, (4,))
        v = rng.normal(size=(4, 3)).astype(np.float32)
        np.testing.assert_allclose(ops.inv_rotate(ops.rotate(v, q), q), v, atol=1e-5)

    def test_euler_to_quat_single_axis(self):
        # 90 deg about z maps x-hat to y-hat
        q = ops.euler_to_quat(jnp.array([0.0, 0.0, 90.0]))
        got = ops.rotate(jnp.array([1.0, 0.0, 0.0]), q)
        np.testing.assert_allclose(got, [0.0, 1.0, 0.0], atol=1e-6)
        # -90 about y maps x-hat to z-hat (hip hinge frame, ant model)
        q = ops.euler_to_quat(jnp.array([0.0, -90.0, 0.0]))
        got = ops.rotate(jnp.array([1.0, 0.0, 0.0]), q)
        np.testing.assert_allclose(got, [0.0, 0.0, 1.0], atol=1e-6)

    def test_euler_intrinsic_xyz_order(self):
        # intrinsic x-y'-z'': R = Rx @ Ry @ Rz
        q = ops.euler_to_quat(jnp.array([90.0, -45.0, 0.0]))
        got = ops.rotate(jnp.array([0.0, 0.0, 1.0]), q)
        s = 1 / np.sqrt(2)
        np.testing.assert_allclose(got, [-s, -s, 0.0], atol=1e-6)

    def test_axis_angle_roundtrip(self):
        axis = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
        angle = jnp.array([0.7, -1.2])
        q = ops.quat_rot_axis(axis, angle)
        got_axis, got_angle = ops.quat_to_axis_angle(q)
        # representation may flip (axis, angle) -> (-axis, -angle); the
        # rotation vector is invariant
        np.testing.assert_allclose(
            got_axis * np.asarray(got_angle)[:, None], axis * angle[:, None], atol=1e-6
        )


class TestVector:
    def test_safe_norm_zero(self):
        x = jnp.zeros((3,))
        assert float(ops.safe_norm(x)) == 0.0
        # gradient defined at zero
        import jax

        g = jax.grad(lambda v: ops.safe_norm(v))(x)
        assert np.isfinite(np.asarray(g)).all()

    def test_normalize(self):
        v = jnp.array([3.0, 4.0, 0.0])
        np.testing.assert_allclose(ops.normalize(v), [0.6, 0.8, 0.0], atol=1e-6)
        np.testing.assert_allclose(ops.normalize(jnp.zeros(3)), np.zeros(3))
