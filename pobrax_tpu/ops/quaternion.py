"""Quaternion algebra, batch-first.

Convention: quaternions are (w, x, y, z) on the last axis, matching the
contract consumed by the reference envs (e.g. `math.quat_mul` / `math.quat_inv`
at /root/reference/po_brax/envs/ant_gather.py:167 and torso orientation obs at
ant_tag.py:162). All functions broadcast over leading batch dimensions so a
`(B, nbody, 4)` rotation field needs no vmap.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_mul(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product u ∘ v; (..., 4) x (..., 4) -> (..., 4)."""
    uw, ux, uy, uz = u[..., 0], u[..., 1], u[..., 2], u[..., 3]
    vw, vx, vy, vz = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    return jnp.stack(
        [
            uw * vw - ux * vx - uy * vy - uz * vz,
            uw * vx + ux * vw + uy * vz - uz * vy,
            uw * vy - ux * vz + uy * vw + uz * vx,
            uw * vz + ux * vy - uy * vx + uz * vw,
        ],
        axis=-1,
    )


def quat_inv(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate of a unit quaternion: (w, -x, -y, -z)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def rotate(vec: jnp.ndarray, quat: jnp.ndarray) -> jnp.ndarray:
    """Rotate (..., 3) vectors by (..., 4) unit quaternions."""
    s = quat[..., 0:1]
    u = quat[..., 1:]
    # 2(u·v)u + (s² − u·u)v + 2s(u×v)
    dot_uv = jnp.sum(u * vec, axis=-1, keepdims=True)
    dot_uu = jnp.sum(u * u, axis=-1, keepdims=True)
    return 2.0 * dot_uv * u + (s * s - dot_uu) * vec + 2.0 * s * jnp.cross(u, vec)


def inv_rotate(vec: jnp.ndarray, quat: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors by the inverse of unit quaternions (world -> body frame)."""
    return rotate(vec, quat_inv(quat))


def ang_to_quat(ang: jnp.ndarray) -> jnp.ndarray:
    """Embed an angular-velocity 3-vector as a pure quaternion (0, wx, wy, wz)."""
    zero = jnp.zeros_like(ang[..., :1])
    return jnp.concatenate([zero, ang], axis=-1)


def euler_to_quat(v: jnp.ndarray) -> jnp.ndarray:
    """Euler angles in *degrees*, intrinsic Tait-Bryan x-y'-z'' -> quaternion.

    Matches the convention of the protobuf `rotation {x: .. y: .. z: ..}`
    fields the reference scene builders emit (e.g. collider rotations at
    /root/reference/po_brax/envs/utils.py:26,54-55).
    """
    v = jnp.asarray(v)
    half = v * (jnp.pi / 360.0)
    c1, c2, c3 = jnp.cos(half[..., 0]), jnp.cos(half[..., 1]), jnp.cos(half[..., 2])
    s1, s2, s3 = jnp.sin(half[..., 0]), jnp.sin(half[..., 1]), jnp.sin(half[..., 2])
    w = c1 * c2 * c3 - s1 * s2 * s3
    x = s1 * c2 * c3 + c1 * s2 * s3
    y = c1 * s2 * c3 - s1 * c2 * s3
    z = c1 * c2 * s3 + s1 * s2 * c3
    return jnp.stack([w, x, y, z], axis=-1)


def quat_rot_axis(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Quaternion for a rotation of `angle` radians about unit `axis` (..., 3)."""
    half = jnp.asarray(angle)[..., None] * 0.5
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def relative_quat(q_parent: jnp.ndarray, q_child: jnp.ndarray) -> jnp.ndarray:
    """Rotation taking the parent frame to the child frame: inv(q_p) ∘ q_c."""
    return quat_mul(quat_inv(q_parent), q_child)


def quat_to_axis_angle(q: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Decompose unit quaternions into (unit axis (...,3), angle (...,) in (-pi, pi])."""
    sin_half = jnp.linalg.norm(q[..., 1:], axis=-1)
    # keep sign of w so angle lands in (-pi, pi]
    angle = 2.0 * jnp.arctan2(sin_half, q[..., 0])
    angle = jnp.where(angle > jnp.pi, angle - 2.0 * jnp.pi, angle)
    safe = jnp.where(sin_half[..., None] < 1e-10, 1.0, sin_half[..., None])
    axis = jnp.where(
        sin_half[..., None] < 1e-10,
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], dtype=q.dtype), q[..., 1:].shape),
        q[..., 1:] / safe,
    )
    return axis, angle
