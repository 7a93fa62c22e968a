"""Convert a parsed legacy-brax Config proto into a pobrax_tpu Config.

This is the bridge that lets the reference's LITERAL scene-construction code
(text_format.Parse + programmatic mutation, /root/reference/po_brax/envs/
ant_tag.py:13-25, utils.py:6-119) drive our engine: the shim `brax.System`
calls `proto_to_config` on whatever proto the reference built and compiles a
`pobrax_tpu.physics.system.System` from it.
"""

from __future__ import annotations

from pobrax_tpu.physics import config as pcfg


def _vec3(v, default=(0.0, 0.0, 0.0)):
    return (float(v.x), float(v.y), float(v.z)) if v is not None else default


def _geom(c):
    kind = c.WhichOneof("type")
    if kind == "sphere":
        return pcfg.Sphere(radius=float(c.sphere.radius))
    if kind == "capsule":
        return pcfg.Capsule(radius=float(c.capsule.radius),
                            length=float(c.capsule.length),
                            end=int(c.capsule.end))
    if kind == "box":
        return pcfg.Box(halfsize=_vec3(c.box.halfsize))
    if kind == "plane":
        return pcfg.Plane()
    raise ValueError(f"collider without a geometry: {c}")


def proto_to_config(p) -> pcfg.Config:
    bodies = []
    for b in p.bodies:
        colliders = tuple(
            pcfg.Collider(geom=_geom(c), position=_vec3(c.position),
                          rotation=_vec3(c.rotation))
            for c in b.colliders)
        bodies.append(pcfg.Body(
            name=b.name,
            colliders=colliders,
            mass=float(b.mass) if b.HasField("mass") else 1.0,
            inertia=_vec3(b.inertia) if b.HasField("inertia") else (1.0, 1.0, 1.0),
            frozen=bool(b.frozen.all),
            frozen_position=_vec3(b.frozen.position),
            frozen_rotation=_vec3(b.frozen.rotation),
        ))
    joints = tuple(
        pcfg.Joint(
            name=j.name,
            parent=j.parent,
            child=j.child,
            stiffness=float(j.stiffness),
            parent_offset=_vec3(j.parent_offset),
            child_offset=_vec3(j.child_offset),
            rotation=_vec3(j.rotation),
            angle_limits=tuple(pcfg.AngleLimit(float(r.min), float(r.max))
                               for r in j.angle_limit) or (pcfg.AngleLimit(),),
            angular_damping=float(j.angular_damping),
            spring_damping=(float(j.spring_damping)
                            if j.HasField("spring_damping") else None),
            limit_strength=(float(j.limit_strength)
                            if j.HasField("limit_strength") else None),
            reference_rotation=_vec3(j.reference_rotation),
        )
        for j in p.joints)
    actuators = tuple(
        pcfg.Actuator(name=a.name, joint=a.joint, strength=float(a.strength),
                      kind=a.WhichOneof("type") or "torque")
        for a in p.actuators)
    default_qps, default_angles = [], []
    for d in p.defaults:
        for q in d.qps:
            default_qps.append(pcfg.DefaultQP(name=q.name, pos=_vec3(q.pos),
                                              rot=_vec3(q.rot)))
        for a in d.angles:
            default_angles.append(pcfg.DefaultAngle(name=a.name,
                                                    angle=_vec3(a.angle)))
    return pcfg.Config(
        bodies=tuple(bodies),
        joints=joints,
        actuators=actuators,
        collide_include=tuple((ci.first, ci.second) for ci in p.collide_include),
        default_qps=tuple(default_qps),
        default_angles=tuple(default_angles),
        friction=float(p.friction),
        elasticity=float(p.elasticity),
        gravity=_vec3(p.gravity) if p.HasField("gravity") else (0.0, 0.0, -9.8),
        angular_damping=float(p.angular_damping),
        velocity_damping=float(p.velocity_damping),
        baumgarte_erp=float(p.baumgarte_erp) if p.HasField("baumgarte_erp") else 0.1,
        dt=float(p.dt) if p.HasField("dt") else 0.05,
        substeps=int(p.substeps) if p.HasField("substeps") else 10,
    )
