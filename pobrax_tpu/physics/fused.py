"""Scalar-unrolled physics step: the TPU fast path.

The generic step (system.py) computes on (nbody, 3)/(K, 3) arrays; under
vmap that puts tiny axes (3, 4, K) in the tiled lane dimensions and forces
gathers/scatters/axis-reductions — single-digit-percent VPU utilization.

This module compiles a System into a *scalar-unrolled* single-env step:
every body coordinate, joint constant, and contact row is a Python-indexed
0-d value, every formula is written out componentwise, and all structural
indexing (which body, which joint, which contact pair) happens at TRACE
time. Under `vmap` every op becomes one (B,)-elementwise op — XLA fuses the
whole substep into a few dense VPU kernels with 100% lane utilization, no
gather/scatter at all.

Covers the full engine feature set: 1/2/3-dof spring joints, torque and
angle (position-servo) actuators, thrusters, per-axis frozen masks, and
point-plane / sphere-sphere / capsule-capsule / capsule-box contacts —
every env in the registry runs fused. Frozen-body rotations and velocities
fold to trace-time constants (teleports only ever move positions).

Numerics match the generic path to float32 round-off (summation order
differs); the test suite cross-validates the two.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pobrax_tpu.physics.joints import ANGLE_SERVO_GAIN
from pobrax_tpu.physics.state import Info, P, QP

# ---- scalar quaternion/vector helpers (tuples of 0-d values) -------------------


def _qmul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    )


def _qinv(q):
    w, x, y, z = q
    return (w, -x, -y, -z)


def _qrot(v, q):
    """rotate vector v by quaternion q (both tuples)."""
    w, x, y, z = q
    vx, vy, vz = v
    # t = 2 * cross(q.xyz, v)
    tx = 2.0 * (y * vz - z * vy)
    ty = 2.0 * (z * vx - x * vz)
    tz = 2.0 * (x * vy - y * vx)
    # v + w*t + cross(q.xyz, t)
    return (
        vx + w * tx + (y * tz - z * ty),
        vy + w * ty + (z * tx - x * tz),
        vz + w * tz + (x * ty - y * tx),
    )


def _cross(a, b):
    ax, ay, az = a
    bx, by, bz = b
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _norm(a):
    return jnp.sqrt(jnp.maximum(_dot(a, a), 1e-24))


# ---- host-side float helpers (build-time constants) -------------------------


def _qmul_f(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    )


def _qrot_f(v, q):
    w, x, y, z = q
    vx, vy, vz = v
    tx = 2.0 * (y * vz - z * vy)
    ty = 2.0 * (z * vx - x * vz)
    tz = 2.0 * (x * vy - y * vx)
    return (
        vx + w * tx + (y * tz - z * ty),
        vy + w * ty + (z * tx - x * tz),
        vz + w * tz + (x * ty - y * tx),
    )


def _quat_mat_f(q):
    """3x3 rotation matrix (local -> world) of a quaternion tuple."""
    w, x, y, z = q
    return [
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ]


# ---- the compiler ---------------------------------------------------------------


def _compile_cb_vec(rows, default_rot, inv_mass, inv_inertia):
    """Build-time constants for the (K,)-vectorized capsule-box phase.

    Only rows whose box body is fully frozen qualify (the caller filters):
    the box world frame then folds to per-row constants. Everything dynamic
    is expressed as ELEMENTWISE ops only — rotations by the constant frame
    are 9 scalar multiply-adds with (K,) constant columns (a dot_general
    would break XLA fusion and materialize (B,K,3) intermediates to HBM, the
    measured limiter of the wall phase), capsule endpoint broadcast is a
    static-`repeats` jnp.repeat (compiles to concat-of-broadcasts, no
    gather), and per-body impulse accumulation is a static contiguous-slice
    sum (rows pre-sorted by capsule body — no scatter)."""
    # sort so rows of one capsule (and therefore one body) are contiguous
    def cap_key(r):
        return (r["a"], tuple(r["e0"]), tuple(r["e1"]), r["radius"])

    rows = sorted(rows, key=lambda r: (r["a"], cap_key(r)))
    K = len(rows)

    # unique capsules in row order: world endpoints are computed once per
    # capsule and broadcast to its contiguous row range by static repeat
    caps, cap_repeats = [], []
    for r in rows:
        key = (r["a"], tuple(r["e0"]), tuple(r["e1"]))
        if caps and caps[-1] == key:
            cap_repeats[-1] += 1
        else:
            caps.append(key)
            cap_repeats.append(1)

    # unique box bodies (dynamic positions; frozen rotations are constants);
    # per-body 0/1 column masks -> box_pos as Ub fused multiply-adds
    uniq_b = sorted({r["b"] for r in rows})
    b_mask = np.zeros((len(uniq_b), K, 1), np.float32)

    rot_w = np.zeros((K, 3, 3), np.float32)   # box local -> world
    box_off_w = np.zeros((K, 3), np.float32)  # rotate(box_pos_local, rot_b)
    halfsize = np.zeros((K, 3), np.float32)
    radius = np.zeros((K,), np.float32)
    invm_a = np.zeros((K,), np.float32)
    inertia_a = np.zeros((K, 3), np.float32)
    for k, r in enumerate(rows):
        b = r["b"]
        b_mask[uniq_b.index(b), k, 0] = 1.0
        q_b = default_rot[b]
        box_q = _qmul_f(q_b, tuple(r["box_quat"]))
        rot_w[k] = np.array(_quat_mat_f(box_q), np.float64)
        box_off_w[k] = _qrot_f(tuple(r["box_pos"]), q_b)
        halfsize[k] = r["halfsize"]
        radius[k] = r["radius"]
        invm_a[k] = inv_mass[r["a"]]
        inertia_a[k] = inv_inertia[r["a"]]

    # contiguous row ranges per capsule body (rows sorted by a above)
    body_slices = []
    lo = 0
    for k in range(1, K + 1):
        if k == K or rows[k]["a"] != rows[lo]["a"]:
            body_slices.append((rows[lo]["a"], lo, k))
            lo = k

    return dict(
        caps=[(a, e0, e1) for (a, e0, e1) in caps],
        cap_repeats=np.asarray(cap_repeats, np.int32),
        uniq_b=uniq_b, b_mask=b_mask,
        # rotation matrix as 9 (K,) constant columns for elementwise use
        rot_cols=[[rot_w[:, i, j].copy() for j in range(3)] for i in range(3)],
        box_off_w=box_off_w,
        halfsize=halfsize, radius=radius, invm_a=invm_a, inertia_a=inertia_a,
        body_slices=body_slices,
    )


def _atan2(y, x):
    """Mosaic-safe atan2 from mul/div/sqrt/select only (Pallas TPU has no
    atan/atan2 lowering rule). Cephes-style: fold |y/x| into [0,1] by
    octant swap, one tan(pi/8) argument reduction, then the classic
    degree-7 odd minimax polynomial (~2e-7 rel error — far below the
    1e-5 fused-vs-generic cross-validation tolerance). One trace serves
    both the XLA fused path and the Pallas whole-step kernel."""
    pio2 = 1.5707963267948966
    pio4 = 0.7853981633974483
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    swap = ay > ax
    num = jnp.minimum(ax, ay)
    den = jnp.maximum(jnp.maximum(ax, ay), jnp.float32(1e-30))
    t = num / den  # in [0, 1]
    mid = t > 0.4142135623730950  # tan(pi/8)
    arg = jnp.where(mid, (t - 1.0) / (t + 1.0), t)
    base = jnp.where(mid, jnp.float32(pio4), jnp.float32(0.0))
    z = arg * arg
    poly = ((8.05374449538e-2 * z - 1.38776856032e-1) * z
            + 1.99777106478e-1) * z - 3.33329491539e-1
    r = base + arg + arg * z * poly
    r = jnp.where(swap, pio2 - r, r)
    r = jnp.where(x < 0.0, jnp.pi - r, r)
    return jnp.where(y < 0.0, -r, r)


def _asin(x):
    """Mosaic-safe asin (Cephes asinf): |x|>0.5 uses the half-angle
    sqrt((1-|x|)/2) reduction, so accuracy holds near the +-1 poles."""
    a = jnp.abs(x)
    big = a > 0.5
    zb = 0.5 * (1.0 - a)
    xb = jnp.sqrt(zb)
    z = jnp.where(big, zb, a * a)
    t = jnp.where(big, xb, a)
    core = t + t * z * ((((4.2163199048e-2 * z + 2.4181311049e-2) * z
                          + 4.5470025998e-2) * z + 7.4953002686e-2) * z
                        + 1.6666752422e-1)
    r = jnp.where(big, 1.5707963267948966 - 2.0 * core, core)
    return jnp.where(x < 0.0, -r, r)


def _euler_xyz(q):
    """Scalar intrinsic x-y'-z'' Euler decomposition of a quaternion tuple
    (matches joints.py::euler_xyz_from_quat)."""
    w, x, y, z = q
    m02 = 2.0 * (x * z + w * y)
    m12 = 2.0 * (y * z - w * x)
    m22 = 1.0 - 2.0 * (x * x + y * y)
    m01 = 2.0 * (x * y - w * z)
    m00 = 1.0 - 2.0 * (y * y + z * z)
    a = _atan2(-m12, m22)
    b = _asin(jnp.clip(m02, -1.0, 1.0))
    c = _atan2(-m01, m00)
    return (a, b, c)


_JOINT_AXES = ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0))


# ---- (K,)-column vector helpers (lists of 3 arrays, pure elementwise) ----------


def _v_add(x, y):
    return [x[i] + y[i] for i in range(3)]


def _v_sub(x, y):
    return [x[i] - y[i] for i in range(3)]


def _v_dot(x, y):
    return x[0] * y[0] + x[1] * y[1] + x[2] * y[2]


def _v_scale(x, s):
    return [x[i] * s for i in range(3)]


def _v_cross(x, y):
    return [x[1] * y[2] - x[2] * y[1],
            x[2] * y[0] - x[0] * y[2],
            x[0] * y[1] - x[1] * y[0]]


def _compile_pp_vec(rows, default_rot, inv_mass, inv_inertia):
    """Build-time constants for the (K,)-vectorized point-plane phase.

    Rows against fully frozen planes (every Ground in the repo): the plane
    normal and in-plane offset fold to constants; the per-row world point
    still needs the point body's dynamic rot/pos (computed scalar, packed
    into (K,) columns by stack — a fusable concatenate). Rows pre-sorted by
    point body for static-slice accumulation."""
    rows = sorted(rows, key=lambda r: r["a"])
    K = len(rows)

    uniq_b = sorted({r["b"] for r in rows})
    b_mask = np.zeros((len(uniq_b), K), np.float32)
    normal = np.zeros((K, 3), np.float32)
    off_w = np.zeros((K, 3), np.float32)   # rotate(plane_pos_local, rot_b)
    radius = np.zeros((K,), np.float32)
    invm_a = np.zeros((K,), np.float32)
    inertia_a = np.zeros((K, 3), np.float32)
    points = []
    for k, r in enumerate(rows):
        b = r["b"]
        b_mask[uniq_b.index(b), k] = 1.0
        q_b = default_rot[b]
        prot = _qmul_f(q_b, tuple(r["plane_quat"]))
        normal[k] = _qrot_f((0.0, 0.0, 1.0), prot)
        off_w[k] = _qrot_f(tuple(r["plane_pos"]), q_b)
        radius[k] = r["radius"]
        invm_a[k] = inv_mass[r["a"]]
        inertia_a[k] = inv_inertia[r["a"]]
        points.append((r["a"], tuple(r["point"])))

    body_slices = []
    lo = 0
    for k in range(1, K + 1):
        if k == K or rows[k]["a"] != rows[lo]["a"]:
            body_slices.append((rows[lo]["a"], lo, k))
            lo = k

    return dict(
        points=points, uniq_b=uniq_b, b_mask=b_mask,
        normal_cols=[normal[:, c].copy() for c in range(3)],
        off_w=off_w, radius=radius, invm_a=invm_a, inertia_a=inertia_a,
        body_slices=body_slices,
    )


def make_fused_step(sys) -> callable:
    """Build a scalar-unrolled `step(qp, act) -> (qp, Info)` for `sys`."""
    # read once at BUILD time (not trace time) so a System's behavior is
    # fixed when it is constructed
    info_contact_only = os.environ.get("POBRAX_INFO", "full") == "contact"
    n = sys.num_bodies
    body = sys.body
    groups = sys.joints
    ct = sys.contacts
    h = sys.integrator.h
    substeps = sys.integrator.substeps
    gravity = tuple(float(g) for g in sys.integrator.gravity)
    vel_damp = sys.integrator.vel_damp
    ang_damp = sys.integrator.ang_damp
    inv_mass = [float(m) for m in body.inv_mass]
    inv_inertia = [tuple(float(v) for v in row) for row in body.inv_inertia]
    active_pos = [tuple(float(v) for v in row) for row in body.active_pos]
    active_rot = [tuple(float(v) for v in row) for row in body.active_rot]
    baumgarte = ct.baumgarte_erp / ct.h_sub
    elasticity = ct.elasticity
    friction = ct.friction

    # flat joint table (host-side constants)
    joints = []
    for g in groups:
        for j in range(g.count):
            joints.append(dict(
                dof=g.dof,
                parent=int(g.parent[j]), child=int(g.child[j]),
                off_p=tuple(float(v) for v in g.off_p[j]),
                off_c=tuple(float(v) for v in g.off_c[j]),
                q_j=tuple(float(v) for v in g.q_j[j]),
                lim=[(float(g.limit[j, d, 0]), float(g.limit[j, d, 1]))
                     for d in range(g.dof)],
                k=float(g.stiffness[j]), kd=float(g.spring_damping[j]),
                klim=float(g.limit_strength[j]),
                kang=float(g.angular_damping[j]),
                act_idx=int(g.act_idx[j]), act_k=float(g.act_strength[j]),
                act_kind=int(g.act_kind[j]),
            ))

    # contact tables
    def rows(packed, fields):
        if packed is None:
            return []
        K = packed["a"].shape[0]
        out = []
        for k in range(K):
            out.append({f: (packed[f][k].tolist() if packed[f][k].ndim else
                            packed[f][k].item()) for f in fields})
        return out

    pp_rows = rows(ct.point_plane, ("a", "point", "radius", "b", "plane_pos", "plane_quat"))
    ss_rows = rows(ct.sphere_sphere, ("a", "pa", "ra", "b", "pb", "rb"))
    cc_rows = rows(ct.capsule_capsule, ("a", "e0a", "e1a", "ra", "b", "e0b", "e1b", "rb"))
    cb_rows = rows(ct.capsule_box, ("a", "e0", "e1", "radius", "b", "box_pos", "box_quat", "halfsize"))

    thr_body = [int(i) for i in sys._thruster_body]
    thr_dir = [tuple(float(v) for v in d) for d in sys._thruster_dir]
    thr_k = [float(v) for v in sys._thruster_strength]
    thr0 = sys._thruster_act0

    # fully frozen bodies: rotation is STATIC (the integrator never touches
    # it and teleports only move positions) and velocities are identically
    # zero. Folding them to Python-float constants lets the whole quaternion
    # chain for wall/plane frames constant-fold at trace time — the dominant
    # per-row cost for wall-heavy scenes.
    frozen = [bool(f) for f in body.frozen]
    default_rot = [tuple(float(v) for v in sys._default_pose[1][i]) for i in range(n)]
    _ZERO3F = (0.0, 0.0, 0.0)

    # (K,)-vectorized capsule-box phase: with many wall rows (T-maze: 72,
    # maze: 108) scalar unrolling costs K x ~600 ops per substep and minutes
    # of XLA compile; batching the rows into dense (K,3) arrays is faster to
    # run AND to compile. Only rows against fully frozen boxes qualify (their
    # box frame folds to constants — true for every wall in the repo); any
    # others stay on the scalar path. POBRAX_CB_VEC_MIN tunes the cutover.
    cb_vec_min = int(os.environ.get("POBRAX_CB_VEC_MIN", "12"))
    _cb_frozen = [r for r in cb_rows if frozen[r["b"]]]
    if len(_cb_frozen) >= cb_vec_min:
        cb_scalar_rows = [r for r in cb_rows if not frozen[r["b"]]]
        cb_vec = _compile_cb_vec(_cb_frozen, default_rot, inv_mass, inv_inertia)
    else:
        cb_scalar_rows = cb_rows
        cb_vec = None

    # same treatment for point-plane rows (ground contacts): the resolve
    # math vectorizes over (K,) columns; only the per-row world point stays
    # scalar (needs the point body's dynamic rotation)
    pp_vec_min = int(os.environ.get("POBRAX_PP_VEC_MIN", "8"))
    _pp_frozen = [r for r in pp_rows if frozen[r["b"]]]
    if len(_pp_frozen) >= pp_vec_min:
        pp_scalar_rows = [r for r in pp_rows if not frozen[r["b"]]]
        pp_vec = _compile_pp_vec(_pp_frozen, default_rot, inv_mass, inv_inertia)
    else:
        pp_scalar_rows = pp_rows
        pp_vec = None

    def step_core(pos0, rot0, vel0, ang0, act):
        """Shape-polymorphic step body. Two calling conventions share it:
        the production vmapped path (arrays (n,3)/(n,4), per-env 0-d
        scalars, batching via jax.vmap) and the Pallas whole-step kernel
        (physics/pallas_step.py: arrays (n,3,B)/(n,4,B) with a TRAILING
        batch axis, so every 'scalar' is a contiguous (B,) vector inside
        one kernel). All per-scalar math is identical; only the shapes the
        indexing yields differ."""
        # ---- scalar pack/unpack helpers ---------------------------------------
        def unpack(arr, k):
            return [tuple(arr[i, c] for c in range(k)) for i in range(n)]

        def pack(rows_):
            return jnp.stack([jnp.stack(r) for r in rows_])

        batch_tail = pos0.shape[2:]  # () vmapped / (B,) trailing-batch

        def zero3():
            z = jnp.zeros(batch_tail, pos0.dtype)
            return [(z, z, z) for _ in range(n)]

        def contact_impulses(pos, rot, vel, ang):
            """All contact rows -> per-body (dvel, dang) scalar accumulators."""
            dvel, dang = zero3(), zero3()

            def rot_of(i):
                return default_rot[i] if frozen[i] else rot[i]

            def vel_of(i):
                return _ZERO3F if frozen[i] else vel[i]

            def ang_of(i):
                return _ZERO3F if frozen[i] else ang[i]

            def resolve(a, b, cpos, normal, pen):
                nonlocal dvel, dang
                r_a = _sub(cpos, pos[a])
                r_b = _sub(cpos, pos[b])
                v_a = _add(vel_of(a), _cross(ang_of(a), r_a))
                v_b = _add(vel_of(b), _cross(ang_of(b), r_b))
                v_rel = _sub(v_a, v_b)
                vn = _dot(v_rel, normal)
                ia, ib = inv_inertia[a], inv_inertia[b]
                ang_a = ang_b = 0.0
                if any(v != 0.0 for v in ia):
                    cra = _cross(r_a, normal)
                    ang_a = _dot(normal, _cross(
                        (ia[0] * cra[0], ia[1] * cra[1], ia[2] * cra[2]), r_a))
                if any(v != 0.0 for v in ib):
                    crb = _cross(r_b, normal)
                    ang_b = _dot(normal, _cross(
                        (ib[0] * crb[0], ib[1] * crb[1], ib[2] * crb[2]), r_b))
                denom = inv_mass[a] + inv_mass[b] + ang_a + ang_b
                denom = jnp.maximum(denom, 1e-8)
                imp = (-(1.0 + elasticity) * vn + baumgarte * jnp.maximum(pen, 0.0)) / denom
                live = (pen > 0.0) & (imp > 0.0)
                imp = jnp.where(live, imp, 0.0)
                # friction drag
                v_t = _sub(v_rel, _scale(normal, vn))
                vt_n = _norm(v_t)
                imp_d = jnp.minimum(vt_n / denom, friction * imp)
                imp_d = jnp.where(live & (vt_n > 1e-8), imp_d, 0.0)
                scale_t = imp_d / jnp.maximum(vt_n, 1e-8)
                j = _sub(_scale(normal, imp), _scale(v_t, scale_t))
                # static guards: frozen bodies take no impulse, skip the ops
                if inv_mass[a] != 0.0:
                    dvel[a] = _add(dvel[a], _scale(j, inv_mass[a]))
                    ta = _cross(r_a, j)
                    dang[a] = _add(dang[a], (ia[0] * ta[0], ia[1] * ta[1], ia[2] * ta[2]))
                if inv_mass[b] != 0.0:
                    dvel[b] = _sub(dvel[b], _scale(j, inv_mass[b]))
                    tb = _cross(r_b, _scale(j, -1.0))
                    dang[b] = _add(dang[b], (ib[0] * tb[0], ib[1] * tb[1], ib[2] * tb[2]))

            for r in pp_scalar_rows:
                a, b = r["a"], r["b"]
                p_w = _add(pos[a], _qrot(tuple(r["point"]), rot_of(a)))
                # frozen plane body => normal/plane offset fold to constants
                prot = _qmul(rot_of(b), tuple(r["plane_quat"]))
                normal = _qrot((0.0, 0.0, 1.0), prot)
                plane_pt = _add(pos[b], _qrot(tuple(r["plane_pos"]), rot_of(b)))
                pen = r["radius"] - _dot(_sub(p_w, plane_pt), normal)
                cpos = _sub(p_w, _scale(normal, r["radius"]))
                resolve(a, b, cpos, normal, pen)

            if pp_vec is not None:
                pv = pp_vec
                dt_ = pos0.dtype
                zb = jnp.zeros(batch_tail, dt_)  # shape-normalizer for stacks

                # per-row world point, lever-arm source, and point-body
                # velocity (scalar per row; stacking K scalars into (K,)
                # columns is a fusable concatenate)
                PW, PA2, VA2, AA2 = [], [], [], []
                for (pa_i, plocal) in pv["points"]:
                    qa = rot_of(pa_i)
                    PW.append(_add(pos[pa_i], _qrot(plocal, qa)))
                    PA2.append(pos[pa_i])
                    VA2.append(vel_of(pa_i))
                    AA2.append(ang_of(pa_i))

                def cols(ts):
                    # +zb broadcasts python-float entries (frozen bodies) to
                    # the batch tail so the stack is shape-uniform in BOTH
                    # calling conventions
                    return [jnp.stack([jnp.asarray(t[c_], dt_) + zb
                                       for t in ts], -1) for c_ in range(3)]

                p_w = cols(PW)
                pa2 = cols(PA2)
                va2 = cols(VA2)
                aa2 = cols(AA2)

                off = jnp.asarray(pv["off_w"], dt_)
                plane_pt = [off[:, c_] for c_ in range(3)]
                for u, bb in enumerate(pv["uniq_b"]):
                    mask = jnp.asarray(pv["b_mask"][u], dt_)  # (K,)
                    pbb = pos[bb]
                    # pbb[c_] is a batch scalar; [..., None] aligns it with
                    # the trailing-K column convention in both modes
                    plane_pt = [plane_pt[c_] + mask * pbb[c_][..., None]
                                for c_ in range(3)]

                n_k = [jnp.asarray(pv["normal_cols"][c_], dt_)
                       for c_ in range(3)]
                rad_k = jnp.asarray(pv["radius"], dt_)
                invm_k = jnp.asarray(pv["invm_a"], dt_)
                ia_k = [jnp.asarray(pv["inertia_a"][:, c_], dt_)
                        for c_ in range(3)]

                pen = rad_k - _v_dot(_v_sub(p_w, plane_pt), n_k)
                cpos = _v_sub(p_w, _v_scale(n_k, rad_k))

                # one-shot impulse; plane body frozen => only `a` terms
                r_a = _v_sub(cpos, pa2)
                v_a = _v_add(va2, _v_cross(aa2, r_a))
                vn = _v_dot(v_a, n_k)
                cra = _v_cross(r_a, n_k)
                iacra = [ia_k[c_] * cra[c_] for c_ in range(3)]
                ang_term = _v_dot(n_k, _v_cross(iacra, r_a))
                denom = jnp.maximum(invm_k + ang_term, 1e-8)
                imp = (-(1.0 + elasticity) * vn
                       + baumgarte * jnp.maximum(pen, 0.0)) / denom
                live = (pen > 0.0) & (imp > 0.0)
                imp = jnp.where(live, imp, 0.0)
                v_t = _v_sub(v_a, _v_scale(n_k, vn))
                vt_n = jnp.sqrt(jnp.maximum(_v_dot(v_t, v_t), 1e-24))
                imp_d = jnp.minimum(vt_n / denom, friction * imp)
                imp_d = jnp.where(live & (vt_n > 1e-8), imp_d, 0.0)
                scale_t = imp_d / jnp.maximum(vt_n, 1e-8)
                j = _v_sub(_v_scale(n_k, imp), _v_scale(v_t, scale_t))
                tq = _v_cross(r_a, j)

                for (bi, lo, hi) in pv["body_slices"]:
                    jj = [jnp.sum(j[c_][..., lo:hi], -1) for c_ in range(3)]
                    tt = [jnp.sum(tq[c_][..., lo:hi], -1) for c_ in range(3)]
                    im = inv_mass[bi]
                    ii = inv_inertia[bi]
                    dvel[bi] = _add(dvel[bi], (im * jj[0], im * jj[1],
                                               im * jj[2]))
                    dang[bi] = _add(dang[bi], (ii[0] * tt[0], ii[1] * tt[1],
                                               ii[2] * tt[2]))

            for r in ss_rows:
                a, b = r["a"], r["b"]
                ca = _add(pos[a], _qrot(tuple(r["pa"]), rot_of(a)))
                cb = _add(pos[b], _qrot(tuple(r["pb"]), rot_of(b)))
                d = _sub(ca, cb)
                dist = _norm(d)
                normal = _scale(d, 1.0 / jnp.maximum(dist, 1e-8))
                pen = r["ra"] + r["rb"] - dist
                cpos = _add(cb, _scale(normal, r["rb"] - 0.5 * jnp.maximum(pen, 0.0)))
                resolve(a, b, cpos, normal, pen)

            for r in cc_rows:
                a, b = r["a"], r["b"]
                p1 = _add(pos[a], _qrot(tuple(r["e0a"]), rot_of(a)))
                q1 = _add(pos[a], _qrot(tuple(r["e1a"]), rot_of(a)))
                p2 = _add(pos[b], _qrot(tuple(r["e0b"]), rot_of(b)))
                q2 = _add(pos[b], _qrot(tuple(r["e1b"]), rot_of(b)))
                d1, d2, rr = _sub(q1, p1), _sub(q2, p2), _sub(p1, p2)
                a_ = _dot(d1, d1)
                e_ = _dot(d2, d2)
                f_ = _dot(d2, rr)
                c_ = _dot(d1, rr)
                b_ = _dot(d1, d2)
                den = a_ * e_ - b_ * b_
                s = jnp.where(den > 1e-8,
                              jnp.clip((b_ * f_ - c_ * e_) / jnp.maximum(den, 1e-8), 0.0, 1.0), 0.0)
                t = jnp.where(e_ > 1e-8,
                              jnp.clip((b_ * s + f_) / jnp.maximum(e_, 1e-8), 0.0, 1.0), 0.0)
                s = jnp.where(a_ > 1e-8,
                              jnp.clip((b_ * t - c_) / jnp.maximum(a_, 1e-8), 0.0, 1.0), 0.0)
                pa = _add(p1, _scale(d1, s))
                pb = _add(p2, _scale(d2, t))
                d = _sub(pa, pb)
                dist = _norm(d)
                normal = _scale(d, 1.0 / jnp.maximum(dist, 1e-8))
                pen = r["ra"] + r["rb"] - dist
                cpos = _add(pb, _scale(normal, r["rb"] - 0.5 * jnp.maximum(pen, 0.0)))
                resolve(a, b, cpos, normal, pen)

            for r in cb_scalar_rows:
                a, b = r["a"], r["b"]
                # frozen box body => box frame quaternions fold to constants
                box_rot = _qmul(rot_of(b), tuple(r["box_quat"]))
                box_pos = _add(pos[b], _qrot(tuple(r["box_pos"]), rot_of(b)))
                inv = _qinv(box_rot)
                e0 = _add(pos[a], _qrot(tuple(r["e0"]), rot_of(a)))
                e1 = _add(pos[a], _qrot(tuple(r["e1"]), rot_of(a)))
                s0 = _qrot(_sub(e0, box_pos), inv)
                s1 = _qrot(_sub(e1, box_pos), inv)
                d = _sub(s1, s0)
                den = jnp.maximum(_dot(d, d), 1e-8)
                t = jnp.clip(-_dot(s0, d) / den, 0.0, 1.0)
                smid = _add(s0, _scale(d, t))
                hx, hy, hz = r["halfsize"]
                for p in (s0, s1, smid):
                    qx = jnp.clip(p[0], -hx, hx)
                    qy = jnp.clip(p[1], -hy, hy)
                    qz = jnp.clip(p[2], -hz, hz)
                    dl = (p[0] - qx, p[1] - qy, p[2] - qz)
                    dist = _norm(dl)
                    outside = dist > 1e-8
                    inv_d = 1.0 / jnp.maximum(dist, 1e-8)
                    n_out = _scale(dl, inv_d)
                    pen_out = r["radius"] - dist
                    # inside: nearest face via scalar compares
                    fx, fy, fz = hx - jnp.abs(p[0]), hy - jnp.abs(p[1]), hz - jnp.abs(p[2])
                    min_f = jnp.minimum(fx, jnp.minimum(fy, fz))
                    kx = fx <= jnp.minimum(fy, fz)
                    ky = (~kx) & (fy <= fz)
                    kz = (~kx) & (~ky)
                    sgn = lambda v: jnp.where(v >= 0.0, 1.0, -1.0)
                    n_in = (jnp.where(kx, sgn(p[0]), 0.0),
                            jnp.where(ky, sgn(p[1]), 0.0),
                            jnp.where(kz, sgn(p[2]), 0.0))
                    pen_in = r["radius"] + min_f
                    q_in = (jnp.where(kx, sgn(p[0]) * hx, p[0]),
                            jnp.where(ky, sgn(p[1]) * hy, p[1]),
                            jnp.where(kz, sgn(p[2]) * hz, p[2]))
                    normal_l = tuple(jnp.where(outside, o, i) for o, i in zip(n_out, n_in))
                    pen = jnp.where(outside, pen_out, pen_in)
                    pos_l = tuple(jnp.where(outside, o, i) for o, i in zip((qx, qy, qz), q_in))
                    normal = _qrot(normal_l, box_rot)
                    cpos = _add(box_pos, _qrot(pos_l, box_rot))
                    resolve(a, b, cpos, normal, pen)

            if cb_vec is not None:
                cv = cb_vec
                dt_ = pos0.dtype
                zbc = jnp.zeros(batch_tail, dt_)
                reps = cv["cap_repeats"]
                K_rows = int(reps.sum())

                # Broadcast strategy, measured per-K on the v5e chip
                # (docs/PERFORMANCE.md): concat-of-broadcasts wins at small
                # K (ant_tag K=36: +2% headline) but LOSES at large K
                # (ant_maze K=108: -20%), where jnp.repeat's roll+scatter
                # lowering compiles to a better schedule. Mosaic has no
                # scatter rule, so POBRAX_PALLAS forces concat regardless.
                reps_py = [int(r) for r in np.asarray(reps)]
                use_concat = (
                    K_rows <= int(os.environ.get("POBRAX_REP_CONCAT_MAX",
                                                 "64"))
                    or os.environ.get("POBRAX_PALLAS") == "1")

                def rep(ts):
                    """C per-capsule scalar 3-tuples -> 3 (K,) columns via
                    static repeat (concat of broadcasts, or array-repeats
                    at large K — see strategy note above). +zbc keeps the
                    stack shape-uniform when some entries are python-float
                    constants (frozen bodies)."""
                    cols = []
                    for c_ in range(3):
                        col = jnp.stack([jnp.asarray(t[c_], dt_) + zbc
                                         for t in ts], -1)  # (..., C)
                        if use_concat:
                            pieces = [
                                jnp.broadcast_to(col[..., i:i + 1],
                                                 col.shape[:-1] + (r,))
                                for i, r in enumerate(reps_py) if r]
                            cols.append(jnp.concatenate(pieces, axis=-1)
                                        if len(pieces) > 1 else pieces[0])
                        else:
                            cols.append(jnp.repeat(
                                col, reps, axis=-1,
                                total_repeat_length=K_rows))
                    return cols

                # world endpoints once per unique capsule (scalar, ~C ops)
                E0, E1, PA, VA, AA = [], [], [], [], []
                for (ca, e0l, e1l) in cv["caps"]:
                    qa = rot_of(ca)
                    E0.append(_add(pos[ca], _qrot(e0l, qa)))
                    E1.append(_add(pos[ca], _qrot(e1l, qa)))
                    PA.append(pos[ca])
                    VA.append(vel_of(ca))
                    AA.append(ang_of(ca))
                e0w = rep(E0)  # 3 x (..., K)
                e1w = rep(E1)
                pa = rep(PA)
                va = rep(VA)
                aa = rep(AA)

                # box_pos per row: Ub fused multiply-adds over 0/1 masks
                off = jnp.asarray(cv["box_off_w"], dt_)
                box_pos_k = [off[:, c_] for c_ in range(3)]
                for u, bb in enumerate(cv["uniq_b"]):
                    mask = jnp.asarray(cv["b_mask"][u, :, 0], dt_)  # (K,)
                    pbb = pos[bb]
                    box_pos_k = [box_pos_k[c_] + mask * pbb[c_][..., None]
                                 for c_ in range(3)]

                # constant rotation as 9 (K,) columns; R @ v and R^T @ v are
                # pure elementwise multiply-adds (XLA fuses the whole phase)
                R = [[jnp.asarray(cv["rot_cols"][i][j], dt_) for j in range(3)]
                     for i in range(3)]

                def to_local(v):  # R^T @ v
                    return [R[0][i] * v[0] + R[1][i] * v[1] + R[2][i] * v[2]
                            for i in range(3)]

                def to_world(v):  # R @ v
                    return [R[i][0] * v[0] + R[i][1] * v[1] + R[i][2] * v[2]
                            for i in range(3)]

                s0 = to_local(_v_sub(e0w, box_pos_k))
                s1 = to_local(_v_sub(e1w, box_pos_k))
                dseg = _v_sub(s1, s0)
                den = jnp.maximum(_v_dot(dseg, dseg), 1e-8)
                tmid = jnp.clip(-_v_dot(s0, dseg) / den, 0.0, 1.0)
                smid = _v_add(s0, _v_scale(dseg, tmid))

                h_k = [jnp.asarray(cv["halfsize"][:, c_], dt_) for c_ in range(3)]
                rad_k = jnp.asarray(cv["radius"], dt_)
                invm_k = jnp.asarray(cv["invm_a"], dt_)
                ia_k = [jnp.asarray(cv["inertia_a"][:, c_], dt_) for c_ in range(3)]

                J = [0.0, 0.0, 0.0]
                TQ = [0.0, 0.0, 0.0]
                for p in (s0, s1, smid):
                    # point-box SDF, same math as the scalar branch above
                    qc = [jnp.clip(p[c_], -h_k[c_], h_k[c_]) for c_ in range(3)]
                    dl = _v_sub(p, qc)
                    dist = jnp.sqrt(jnp.maximum(_v_dot(dl, dl), 1e-24))
                    outside = dist > 1e-8
                    inv_d = 1.0 / jnp.maximum(dist, 1e-8)
                    n_out = _v_scale(dl, inv_d)
                    pen_out = rad_k - dist
                    face = [h_k[c_] - jnp.abs(p[c_]) for c_ in range(3)]
                    kx = face[0] <= jnp.minimum(face[1], face[2])
                    ky = (~kx) & (face[1] <= face[2])
                    kz = (~kx) & (~ky)
                    ks = [kx.astype(dt_), ky.astype(dt_), kz.astype(dt_)]
                    sel = _v_dot(p, ks)
                    sgn = jnp.where(sel >= 0.0, 1.0, -1.0)
                    n_in = [sgn * ks[c_] for c_ in range(3)]
                    pen_in = rad_k + jnp.minimum(face[0],
                                                 jnp.minimum(face[1], face[2]))
                    q_in = [p[c_] * (1.0 - ks[c_])
                            + sgn * h_k[c_] * ks[c_] for c_ in range(3)]
                    normal_l = [jnp.where(outside, n_out[c_], n_in[c_])
                                for c_ in range(3)]
                    pen = jnp.where(outside, pen_out, pen_in)
                    pos_l = [jnp.where(outside, qc[c_], q_in[c_])
                             for c_ in range(3)]
                    normal = to_world(normal_l)
                    cpos = _v_add(box_pos_k, to_world(pos_l))

                    # one-shot impulse; box body frozen => only `a` terms
                    r_a = _v_sub(cpos, pa)
                    v_a = _v_add(va, _v_cross(aa, r_a))
                    vn = _v_dot(v_a, normal)
                    cra = _v_cross(r_a, normal)
                    iacra = [ia_k[c_] * cra[c_] for c_ in range(3)]
                    ang_term = _v_dot(normal, _v_cross(iacra, r_a))
                    denom = jnp.maximum(invm_k + ang_term, 1e-8)
                    imp = (-(1.0 + elasticity) * vn
                           + baumgarte * jnp.maximum(pen, 0.0)) / denom
                    live = (pen > 0.0) & (imp > 0.0)
                    imp = jnp.where(live, imp, 0.0)
                    v_t = _v_sub(v_a, _v_scale(normal, vn))
                    vt_n = jnp.sqrt(jnp.maximum(_v_dot(v_t, v_t), 1e-24))
                    imp_d = jnp.minimum(vt_n / denom, friction * imp)
                    imp_d = jnp.where(live & (vt_n > 1e-8), imp_d, 0.0)
                    scale_t = imp_d / jnp.maximum(vt_n, 1e-8)
                    j = _v_sub(_v_scale(normal, imp), _v_scale(v_t, scale_t))
                    J = _v_add(J, j)
                    TQ = _v_add(TQ, _v_cross(r_a, j))

                # per-body accumulation: rows are pre-sorted by body, so each
                # body's rows are one static contiguous slice (no scatter)
                for (bi, lo, hi) in cv["body_slices"]:
                    jj = [jnp.sum(J[c_][..., lo:hi], -1) for c_ in range(3)]
                    tt = [jnp.sum(TQ[c_][..., lo:hi], -1) for c_ in range(3)]
                    im = inv_mass[bi]
                    ii = inv_inertia[bi]
                    dvel[bi] = _add(dvel[bi], (im * jj[0], im * jj[1],
                                               im * jj[2]))
                    dang[bi] = _add(dang[bi], (ii[0] * tt[0], ii[1] * tt[1],
                                               ii[2] * tt[2]))

            return dvel, dang

        # ---- one substep as a scan body (traced once; ~10k scalar ops) --------
        def substep(carry, _):
            qp_pos, qp_rot, qp_vel, qp_ang, info_acc = carry
            pos = unpack(qp_pos, 3)
            rot = unpack(qp_rot, 4)
            vel = unpack(qp_vel, 3)
            ang = unpack(qp_ang, 3)
            fvel, fang = zero3(), zero3()  # joint+limit spring accels
            avel, aang = zero3(), zero3()  # actuator accels

            def frozen_rot(i):
                return default_rot[i] if frozen[i] else rot[i]

            for jt in joints:
                p_i, c_i = jt["parent"], jt["child"]
                dof = jt["dof"]
                q_p, q_c = frozen_rot(p_i), frozen_rot(c_i)
                q_pj = _qmul(q_p, jt["q_j"])
                q_cj = _qmul(q_c, jt["q_j"])
                q_d = _qmul(_qinv(q_pj), q_cj)
                axes = [_qrot(_JOINT_AXES[d], q_pj) for d in range(dof)]

                r_p = _qrot(jt["off_p"], q_p)
                r_c = _qrot(jt["off_c"], q_c)
                anchor_p = _add(pos[p_i], r_p)
                anchor_c = _add(pos[c_i], r_c)
                vel_ap = _add(vel[p_i], _cross(ang[p_i], r_p))
                vel_ac = _add(vel[c_i], _cross(ang[c_i], r_c))

                d = _sub(anchor_p, anchor_c)
                dv = _sub(vel_ap, vel_ac)
                force_c = tuple(jt["k"] * d[c] + jt["kd"] * dv[c] for c in range(3))

                # alignment torque: rotation vector of q_d, free axes zeroed
                sgn_w = jnp.where(q_d[0] >= 0.0, 1.0, -1.0)
                rv = (2.0 * sgn_w * q_d[1], 2.0 * sgn_w * q_d[2], 2.0 * sgn_w * q_d[3])
                err = tuple(0.0 if c < dof else rv[c] for c in range(3))
                t_align = _scale(_qrot(err, q_pj), -jt["k"]) if dof < 3 \
                    else (0.0, 0.0, 0.0)

                # per-dof angles (hinge fast path for dof 1)
                if dof == 1:
                    angles = (2.0 * _atan2(q_d[1], q_d[0]),)
                else:
                    angles = _euler_xyz(q_d)[:dof]
                t_limit = (0.0, 0.0, 0.0)
                for dd in range(dof):
                    lo, hi = jt["lim"][dd]
                    clipped = jnp.clip(angles[dd], lo, hi)
                    t_limit = _add(t_limit, _scale(
                        axes[dd], jt["klim"] * (clipped - angles[dd])))

                rel_ang = _sub(ang[c_i], ang[p_i])
                t_damp = _scale(rel_ang, -jt["kang"])

                torque_c = _add(_add(t_align, t_limit), t_damp)

                fvel[c_i] = _add(fvel[c_i], _scale(force_c, inv_mass[c_i]))
                fvel[p_i] = _sub(fvel[p_i], _scale(force_c, inv_mass[p_i]))
                tq_c = _add(_cross(r_c, force_c), torque_c)
                tq_p = _sub(_cross(r_p, _scale(force_c, -1.0)), torque_c)
                ic, ip = inv_inertia[c_i], inv_inertia[p_i]
                fang[c_i] = _add(fang[c_i], (ic[0] * tq_c[0], ic[1] * tq_c[1], ic[2] * tq_c[2]))
                fang[p_i] = _add(fang[p_i], (ip[0] * tq_p[0], ip[1] * tq_p[1], ip[2] * tq_p[2]))

                if jt["act_idx"] >= 0:
                    t_act = (0.0, 0.0, 0.0)
                    for dd in range(dof):
                        a_in = act[jt["act_idx"] + dd]
                        if jt["act_kind"] == 1:  # angle servo
                            tau = jnp.clip(ANGLE_SERVO_GAIN * (a_in - angles[dd]),
                                           -jt["act_k"], jt["act_k"])
                        else:  # torque
                            tau = jnp.clip(a_in, -1.0, 1.0) * jt["act_k"]
                        t_act = _add(t_act, _scale(axes[dd], tau))
                    aang[c_i] = _add(aang[c_i], (ic[0] * t_act[0], ic[1] * t_act[1], ic[2] * t_act[2]))
                    aang[p_i] = _sub(aang[p_i], (ip[0] * t_act[0], ip[1] * t_act[1], ip[2] * t_act[2]))

            for ti, b_i in enumerate(thr_body):
                a_val = jnp.clip(act[thr0 + ti], -1.0, 1.0) * thr_k[ti]
                avel[b_i] = _add(avel[b_i], _scale(thr_dir[ti], a_val * inv_mass[b_i]))

            # integrate: potential + kinetic (per-axis frozen masks are static)
            for i in range(n):
                ap, ar = active_pos[i], active_rot[i]
                total_v = _add(_add(fvel[i], avel[i]), gravity)
                total_a = _add(fang[i], aang[i])
                new_v = tuple(vel_damp * vel[i][c] + total_v[c] * h for c in range(3))
                new_a = tuple(ang_damp * ang[i][c] + total_a[c] * h for c in range(3))
                vel[i] = tuple(new_v[c] if ap[c] > 0 else vel[i][c] for c in range(3))
                ang[i] = tuple(new_a[c] if ar[c] > 0 else ang[i][c] for c in range(3))

                pos[i] = tuple(pos[i][c] + vel[i][c] * h if ap[c] > 0 else pos[i][c]
                               for c in range(3))
                if any(c > 0 for c in ar):
                    w, x, y, z = rot[i]
                    ax_, ay_, az_ = ang[i]
                    dq = _qmul((jnp.zeros_like(ax_), ax_, ay_, az_), rot[i])
                    nw = w + 0.5 * h * dq[0]
                    nx = x + 0.5 * h * dq[1]
                    ny = y + 0.5 * h * dq[2]
                    nz = z + 0.5 * h * dq[3]
                    inv_n = 1.0 / jnp.sqrt(nw * nw + nx * nx + ny * ny + nz * nz)
                    rot[i] = (nw * inv_n, nx * inv_n, ny * inv_n, nz * inv_n)

            # contacts on the updated positions
            dvel_c, dang_c = contact_impulses(pos, rot, vel, ang)
            for i in range(n):
                ap, ar = active_pos[i], active_rot[i]
                vel[i] = tuple(vel[i][c] + dvel_c[i][c] if ap[c] > 0 else vel[i][c]
                               for c in range(3))
                ang[i] = tuple(ang[i][c] + dang_c[i][c] if ar[c] > 0 else ang[i][c]
                               for c in range(3))

            # info accumulators (contact / joint / actuator), matching the
            # generic path: contact is the impulse delta-v, joint/actuator are
            # the per-substep accelerations. POBRAX_INFO=contact skips the
            # joint/actuator sums (zeros returned): no env consumes them
            # (observations read only contact.vel/.ang, matching the
            # reference ant_tag.py:174-177) — A/B'd in docs/PERFORMANCE.md
            if info_contact_only:
                dinfo = Info(
                    contact=P(vel=pack(dvel_c), ang=pack(dang_c)),
                    joint=info_acc.joint, actuator=info_acc.actuator)
                info_acc = Info(
                    contact=jax.tree.map(lambda a, b: a + b,
                                         info_acc.contact, dinfo.contact),
                    joint=info_acc.joint, actuator=info_acc.actuator)
            else:
                dinfo = Info(
                    contact=P(vel=pack(dvel_c), ang=pack(dang_c)),
                    joint=P(vel=pack(fvel), ang=pack(fang)),
                    actuator=P(vel=pack(avel), ang=pack(aang)),
                )
                info_acc = jax.tree.map(lambda a, b: a + b, info_acc, dinfo)
            carry = (pack(pos), pack(rot), pack(vel), pack(ang), info_acc)
            return carry, None

        z3 = jnp.zeros_like(pos0)
        info0 = Info(contact=P(vel=z3, ang=z3), joint=P(vel=z3, ang=z3),
                     actuator=P(vel=z3, ang=z3))
        carry0 = (pos0, rot0, vel0, ang0, info0)
        # fori_loop (not scan): with static bounds it lowers to the
        # index-carrying scan form, the one loop shape Mosaic can lower —
        # so the same step_core trace serves both the XLA fused path and
        # the Pallas whole-step kernel. Numerically identical to the scan.
        p_, r_, v_, a_, info = jax.lax.fori_loop(
            0, substeps, lambda _i, c: substep(c, None)[0], carry0)
        return (p_, r_, v_, a_), info

    def step(qp: QP, act: jnp.ndarray) -> Tuple[QP, Info]:
        (p_, r_, v_, a_), info = step_core(qp.pos, qp.rot, qp.vel, qp.ang, act)
        return QP(pos=p_, rot=r_, vel=v_, ang=a_), info

    step.core = step_core  # trailing-batch entry for the Pallas kernel

    return step
