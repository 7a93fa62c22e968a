"""Contact generation and one-shot impulse resolution.

Compile-time: `collide_include` body-name pairs (an empty tuple means NO
contacts — explicit-pairs convention) are expanded into typed, fixed-size
candidate-contact arrays — the broadphase is fully static, so the jitted
narrow-phase is one vectorized computation per contact type with zero
dynamic shapes (TPU/XLA friendly).

Runtime: each candidate yields (position, normal, penetration); a shared
impulse resolver applies Baumgarte-stabilized inelastic impulses with a
friction-clamped tangential drag, accumulated per body. The per-body velocity
deltas are exactly the `Info.contact.vel/.ang` aggregates the reference
observations consume (/root/reference/po_brax/envs/ant_tag.py:174-177).

Contact types implemented:
  * point-plane   (spheres, capsule ends, box corners vs a plane)
  * sphere-sphere
  * capsule-capsule (segment-segment closest points)
  * capsule-box   (two end spheres + segment point nearest the box, vs box SDF)
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pobrax_tpu.ops import quaternion as quat
from pobrax_tpu.ops.vector import safe_norm
from pobrax_tpu.physics import config as pcfg
from pobrax_tpu.physics.bodies import Bodies
from pobrax_tpu.physics.joints import _euler_to_quat_np
from pobrax_tpu.physics.state import P, QP


def _rotate_np(v: np.ndarray, q: np.ndarray) -> np.ndarray:
    s, u = q[0], q[1:]
    return 2 * np.dot(u, v) * u + (s * s - np.dot(u, u)) * v + 2 * s * np.cross(u, v)


def _quat_mul_np(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    return np.array(
        [
            u[0] * v[0] - u[1] * v[1] - u[2] * v[2] - u[3] * v[3],
            u[0] * v[1] + u[1] * v[0] + u[2] * v[3] - u[3] * v[2],
            u[0] * v[2] - u[1] * v[3] + u[2] * v[0] + u[3] * v[1],
            u[0] * v[3] + u[1] * v[2] - u[2] * v[1] + u[3] * v[0],
        ],
        np.float32,
    )


def _capsule_ends(col: pcfg.Collider) -> Tuple[np.ndarray, np.ndarray]:
    """Local-frame segment endpoints of a capsule collider (on its body)."""
    g = col.geom
    hl = max(g.length / 2.0 - g.radius, 0.0)
    q = _euler_to_quat_np(col.rotation)
    axis = _rotate_np(np.array([0.0, 0.0, 1.0], np.float32), q)
    p = np.asarray(col.position, np.float32)
    return p - hl * axis, p + hl * axis


class Contacts:
    """All candidate contacts of a scene, compiled to typed numpy arrays."""

    def __init__(self, cfg: pcfg.Config, bodies: Bodies):
        self.friction = float(cfg.friction)
        self.elasticity = float(cfg.elasticity)
        self.baumgarte_erp = float(cfg.baumgarte_erp)
        self.h_sub = float(cfg.dt) / int(cfg.substeps)

        pairs = self._candidate_pairs(cfg, bodies)

        # typed accumulation lists
        pp: List[tuple] = []  # point-plane: (body_a, local_point, radius, body_plane, plane_pos_local, plane_quat_local)
        ss: List[tuple] = []  # sphere-sphere: (a, local_a, ra, b, local_b, rb)
        cc: List[tuple] = []  # capsule-capsule: (a, e0a, e1a, ra, b, e0b, e1b, rb)
        cb: List[tuple] = []  # capsule-box: (a, e0a, e1a, ra, b, box_pos, box_quat, halfsize)

        for ia, ib in pairs:
            for col_a in cfg.bodies[ia].colliders:
                for col_b in cfg.bodies[ib].colliders:
                    self._classify(ia, col_a, ib, col_b, pp, ss, cc, cb)

        def pack(rows, spec):
            return {k: np.array([r[i] for r in rows], dt) for i, (k, dt) in enumerate(spec)}

        self.point_plane = pack(
            pp,
            [("a", np.int32), ("point", np.float32), ("radius", np.float32),
             ("b", np.int32), ("plane_pos", np.float32), ("plane_quat", np.float32)],
        ) if pp else None
        self.sphere_sphere = pack(
            ss,
            [("a", np.int32), ("pa", np.float32), ("ra", np.float32),
             ("b", np.int32), ("pb", np.float32), ("rb", np.float32)],
        ) if ss else None
        self.capsule_capsule = pack(
            cc,
            [("a", np.int32), ("e0a", np.float32), ("e1a", np.float32), ("ra", np.float32),
             ("b", np.int32), ("e0b", np.float32), ("e1b", np.float32), ("rb", np.float32)],
        ) if cc else None
        self.capsule_box = pack(
            cb,
            [("a", np.int32), ("e0", np.float32), ("e1", np.float32), ("radius", np.float32),
             ("b", np.int32), ("box_pos", np.float32), ("box_quat", np.float32), ("halfsize", np.float32)],
        ) if cb else None

    # ---- compile-time --------------------------------------------------------

    @staticmethod
    def _candidate_pairs(cfg: pcfg.Config, bodies: Bodies) -> List[Tuple[int, int]]:
        """Contact pairs come ONLY from collide_include; an empty tuple means
        no contacts (explicit-pairs convention — collider count is the
        contact-phase cost driver at large batch, so silence is the safe
        default; every in-repo model declares its pairs)."""
        return [(bodies.index[f], bodies.index[s]) for f, s in cfg.collide_include]

    def _classify(self, ia, col_a, ib, col_b, pp, ss, cc, cb):
        ga, gb = col_a.geom, col_b.geom
        # canonicalize: plane always second; box after sphere/capsule
        if isinstance(ga, pcfg.Plane) and not isinstance(gb, pcfg.Plane):
            return self._classify(ib, col_b, ia, col_a, pp, ss, cc, cb)
        if isinstance(ga, pcfg.Plane) and isinstance(gb, pcfg.Plane):
            raise NotImplementedError("contact pair Plane vs Plane not supported")
        if isinstance(ga, pcfg.Box) and isinstance(gb, (pcfg.Sphere, pcfg.Capsule)):
            return self._classify(ib, col_b, ia, col_a, pp, ss, cc, cb)

        if isinstance(gb, pcfg.Plane):
            ppos = np.asarray(col_b.position, np.float32)
            pquat = _euler_to_quat_np(col_b.rotation)
            if isinstance(ga, pcfg.Sphere):
                pp.append((ia, np.asarray(col_a.position, np.float32), ga.radius, ib, ppos, pquat))
            elif isinstance(ga, pcfg.Capsule):
                e0, e1 = _capsule_ends(col_a)
                pp.append((ia, e0, ga.radius, ib, ppos, pquat))
                # degenerate capsules (length <= 2r, e.g. the ant torso) have
                # coincident end spheres; emitting both would double-count
                # the contact impulse
                if not np.allclose(e0, e1):
                    pp.append((ia, e1, ga.radius, ib, ppos, pquat))
            elif isinstance(ga, pcfg.Box):
                h = np.asarray(ga.halfsize, np.float32)
                q = _euler_to_quat_np(col_a.rotation)
                for sx in (-1, 1):
                    for sy in (-1, 1):
                        for sz in (-1, 1):
                            corner = np.asarray(col_a.position, np.float32) + _rotate_np(
                                h * np.array([sx, sy, sz], np.float32), q)
                            pp.append((ia, corner, 0.0, ib, ppos, pquat))
            return
        if isinstance(ga, pcfg.Sphere) and isinstance(gb, pcfg.Sphere):
            ss.append((ia, np.asarray(col_a.position, np.float32), ga.radius,
                       ib, np.asarray(col_b.position, np.float32), gb.radius))
            return
        if isinstance(ga, pcfg.Capsule) and isinstance(gb, pcfg.Capsule):
            e0a, e1a = _capsule_ends(col_a)
            e0b, e1b = _capsule_ends(col_b)
            cc.append((ia, e0a, e1a, ga.radius, ib, e0b, e1b, gb.radius))
            return
        if isinstance(ga, pcfg.Capsule) and isinstance(gb, pcfg.Sphere):
            return self._classify(ib, col_b, ia, col_a, pp, ss, cc, cb)
        if isinstance(ga, pcfg.Sphere) and isinstance(gb, pcfg.Capsule):
            # sphere as zero-length capsule
            c = np.asarray(col_a.position, np.float32)
            e0b, e1b = _capsule_ends(col_b)
            cc.append((ia, c, c, ga.radius, ib, e0b, e1b, gb.radius))
            return
        if isinstance(ga, (pcfg.Sphere, pcfg.Capsule)) and isinstance(gb, pcfg.Box):
            if isinstance(ga, pcfg.Sphere):
                e0 = e1 = np.asarray(col_a.position, np.float32)
                r = ga.radius
            else:
                e0, e1 = _capsule_ends(col_a)
                r = ga.radius
            cb.append((ia, e0, e1, r, ib,
                       np.asarray(col_b.position, np.float32),
                       _euler_to_quat_np(col_b.rotation),
                       np.asarray(gb.halfsize, np.float32)))
            return
        raise NotImplementedError(
            f"contact pair {type(ga).__name__} vs {type(gb).__name__} not supported yet")

    # ---- runtime -------------------------------------------------------------

    def apply(self, qp: QP, bodies: Bodies) -> P:
        """Narrow-phase + impulse resolution; returns per-body velocity deltas."""
        nbody = bodies.count
        dp = P.zero(nbody, qp.pos.dtype)
        for compute in (self._point_plane, self._sphere_sphere, self._capsule_capsule, self._capsule_box):
            out = compute(qp)
            if out is None:
                continue
            a, b, pos, normal, pen = out
            dp = dp + self._resolve(qp, bodies, a, b, pos, normal, pen)
        return dp

    def _world_point(self, qp: QP, body: jnp.ndarray, local: jnp.ndarray) -> jnp.ndarray:
        return qp.pos[body] + quat.rotate(local, qp.rot[body])

    def _point_plane(self, qp: QP):
        c = self.point_plane
        if c is None:
            return None
        a, b = c["a"], c["b"]
        p_world = self._world_point(qp, a, c["point"])  # (K, 3)
        plane_rot = quat.quat_mul(qp.rot[b], c["plane_quat"])
        normal = quat.rotate(jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], qp.pos.dtype), p_world.shape), plane_rot)
        plane_pt = self._world_point(qp, b, c["plane_pos"])
        pen = c["radius"] - jnp.sum((p_world - plane_pt) * normal, axis=-1)
        pos = p_world - normal * c["radius"][:, None]
        return a, b, pos, normal, pen

    def _sphere_sphere(self, qp: QP):
        c = self.sphere_sphere
        if c is None:
            return None
        a, b = c["a"], c["b"]
        ca = self._world_point(qp, a, c["pa"])
        cb_ = self._world_point(qp, b, c["pb"])
        d = ca - cb_
        dist = safe_norm(d)
        normal = d / jnp.maximum(dist, 1e-8)[:, None]
        pen = c["ra"] + c["rb"] - dist
        pos = cb_ + normal * (c["rb"] - 0.5 * jnp.maximum(pen, 0.0))[:, None]
        return a, b, pos, normal, pen

    def _capsule_capsule(self, qp: QP):
        c = self.capsule_capsule
        if c is None:
            return None
        a, b = c["a"], c["b"]
        p1 = self._world_point(qp, a, c["e0a"])
        q1 = self._world_point(qp, a, c["e1a"])
        p2 = self._world_point(qp, b, c["e0b"])
        q2 = self._world_point(qp, b, c["e1b"])
        pa, pb = _segment_closest_points(p1, q1, p2, q2)
        d = pa - pb
        dist = safe_norm(d)
        normal = d / jnp.maximum(dist, 1e-8)[:, None]
        pen = c["ra"] + c["rb"] - dist
        pos = pb + normal * (c["rb"] - 0.5 * jnp.maximum(pen, 0.0))[:, None]
        return a, b, pos, normal, pen

    def _capsule_box(self, qp: QP):
        c = self.capsule_box
        if c is None:
            return None
        a, b = c["a"], c["b"]
        # box world frame
        box_rot = quat.quat_mul(qp.rot[b], c["box_quat"])  # (K, 4)
        box_pos = self._world_point(qp, b, c["box_pos"])
        e0 = self._world_point(qp, a, c["e0"])
        e1 = self._world_point(qp, a, c["e1"])
        # segment endpoints in box frame
        inv = quat.quat_inv(box_rot)
        s0 = quat.rotate(e0 - box_pos, inv)
        s1 = quat.rotate(e1 - box_pos, inv)
        # sample: both ends + the segment point closest to box center
        d = s1 - s0
        denom = jnp.maximum(jnp.sum(d * d, axis=-1), 1e-8)
        t = jnp.clip(-jnp.sum(s0 * d, axis=-1) / denom, 0.0, 1.0)
        smid = s0 + t[:, None] * d
        h = c["halfsize"]
        outs = []
        for s in (s0, s1, smid):
            n_local, pen, p_local = _point_box_sdf(s, h, c["radius"])
            normal = quat.rotate(n_local, box_rot)
            pos = box_pos + quat.rotate(p_local, box_rot)
            outs.append((a, b, pos, normal, pen))
        A = jnp.concatenate([o[0] for o in outs])
        B = jnp.concatenate([o[1] for o in outs])
        POS = jnp.concatenate([o[2] for o in outs])
        N = jnp.concatenate([o[3] for o in outs])
        PEN = jnp.concatenate([o[4] for o in outs])
        return A, B, POS, N, PEN

    def _resolve(self, qp: QP, bodies: Bodies, a, b, pos, normal, pen) -> P:
        """Baumgarte-stabilized one-shot impulses with friction drag, scattered per body."""
        inv_mass = jnp.asarray(bodies.inv_mass)
        inv_inertia = jnp.asarray(bodies.inv_inertia)
        r_a = pos - qp.pos[a]
        r_b = pos - qp.pos[b]
        v_a = qp.vel[a] + jnp.cross(qp.ang[a], r_a)
        v_b = qp.vel[b] + jnp.cross(qp.ang[b], r_b)
        v_rel = v_a - v_b
        vn = jnp.sum(v_rel * normal, axis=-1)

        ang_a = jnp.sum(normal * jnp.cross(inv_inertia[a] * jnp.cross(r_a, normal), r_a), axis=-1)
        ang_b = jnp.sum(normal * jnp.cross(inv_inertia[b] * jnp.cross(r_b, normal), r_b), axis=-1)
        denom = inv_mass[a] + inv_mass[b] + ang_a + ang_b

        baumgarte = (self.baumgarte_erp / self.h_sub) * jnp.maximum(pen, 0.0)
        imp = (-(1.0 + self.elasticity) * vn + baumgarte) / jnp.maximum(denom, 1e-8)
        live = (pen > 0.0) & (imp > 0.0)
        imp = jnp.where(live, imp, 0.0)

        # friction: clamp tangential drag impulse by mu * normal impulse
        v_t = v_rel - vn[:, None] * normal
        vt_norm = safe_norm(v_t)
        imp_d = jnp.minimum(vt_norm / jnp.maximum(denom, 1e-8), self.friction * imp)
        dir_t = v_t / jnp.maximum(vt_norm, 1e-8)[:, None]
        imp_d = jnp.where(live & (vt_norm > 1e-8), imp_d, 0.0)

        j_total = imp[:, None] * normal - imp_d[:, None] * dir_t  # applied to a; -j to b

        nbody = bodies.count
        dvel = (
            jnp.zeros((nbody, 3), pos.dtype)
            .at[a].add(j_total * inv_mass[a, None])
            .at[b].add(-j_total * inv_mass[b, None])
        )
        dang = (
            jnp.zeros((nbody, 3), pos.dtype)
            .at[a].add(inv_inertia[a] * jnp.cross(r_a, j_total))
            .at[b].add(inv_inertia[b] * jnp.cross(r_b, -j_total))
        )
        return P(vel=dvel, ang=dang)


def _segment_closest_points(p1, q1, p2, q2):
    """Closest points between segments [p1,q1] and [p2,q2]; batched (K, 3)."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = jnp.sum(d1 * d1, axis=-1)
    e = jnp.sum(d2 * d2, axis=-1)
    f = jnp.sum(d2 * r, axis=-1)
    c = jnp.sum(d1 * r, axis=-1)
    b = jnp.sum(d1 * d2, axis=-1)
    denom = a * e - b * b
    s = jnp.where(denom > 1e-8, jnp.clip((b * f - c * e) / jnp.maximum(denom, 1e-8), 0.0, 1.0), 0.0)
    t = jnp.where(e > 1e-8, jnp.clip((b * s + f) / jnp.maximum(e, 1e-8), 0.0, 1.0), 0.0)
    s = jnp.where(a > 1e-8, jnp.clip((b * t - c) / jnp.maximum(a, 1e-8), 0.0, 1.0), 0.0)
    pa = p1 + d1 * s[:, None]
    pb = p2 + d2 * t[:, None]
    return pa, pb


def _point_box_sdf(p, h, radius):
    """Sphere (center p, radius) vs origin-centered box halfsize h, box frame.

    Returns (normal pointing out of the box toward the sphere, penetration,
    contact point on/in the box surface); all batched (K, ...).

    TPU note: the inside-the-box branch selects the nearest face with one-hot
    arithmetic (compare-against-argmin) instead of take_along_axis /
    scatter-set — gather/scatter on a length-3 axis serializes terribly on
    the VPU, one-hot multiply-add fuses.
    """
    q = jnp.clip(p, -h, h)
    delta = p - q
    dist = safe_norm(delta)
    outside = dist > 1e-8
    n_out = delta / jnp.maximum(dist, 1e-8)[:, None]
    pen_out = radius - dist

    # center inside the box: push out through the nearest face
    face_dist = h - jnp.abs(p)  # (K, 3) distance to each face
    k = jnp.argmin(face_dist, axis=-1)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, p.shape, 1) == k[:, None]) \
        .astype(p.dtype)  # (K, 3)
    sign = jnp.sign(jnp.sum(p * onehot, axis=-1))
    sign = jnp.where(sign == 0.0, 1.0, sign)
    n_in = sign[:, None] * onehot
    pen_in = radius + jnp.min(face_dist, axis=-1)
    h_k = jnp.sum(jnp.broadcast_to(h, p.shape) * onehot, axis=-1)
    q_in = p * (1.0 - onehot) + (sign * h_k)[:, None] * onehot

    normal = jnp.where(outside[:, None], n_out, n_in)
    pen = jnp.where(outside, pen_out, pen_in)
    pos = jnp.where(outside[:, None], q, q_in)
    return normal, pen, pos
