"""Serialize a pobrax_tpu Config dataclass to legacy-brax text-proto.

Used to synthesize `brax.envs.ant._SYSTEM_CONFIG` (the text the reference
parses at /root/reference/po_brax/envs/ant_tag.py:13-14) FROM our own
`pobrax_tpu.physics.ant.ant_config()` — so the text is consistent with the
engine by construction rather than by transcription. Floats are emitted with
repr() full precision; proto float fields are 32-bit, and float32(float64(x))
round-trips exactly, so the System compiled from the parsed proto is
numerically identical to the one compiled from the dataclass.
"""

from __future__ import annotations

from pobrax_tpu.physics import config as pcfg


def _vec3(name: str, v, indent: str) -> str:
    x, y, z = (float(c) for c in v)
    if x == 0.0 and y == 0.0 and z == 0.0:
        return ""
    parts = []
    if x != 0.0:
        parts.append(f"x: {x!r}")
    if y != 0.0:
        parts.append(f"y: {y!r}")
    if z != 0.0:
        parts.append(f"z: {z!r}")
    return f"{indent}{name} {{ {' '.join(parts)} }}\n"


def _collider(col: pcfg.Collider) -> str:
    out = "  colliders {\n"
    out += _vec3("position", col.position, "    ")
    out += _vec3("rotation", col.rotation, "    ")
    g = col.geom
    if isinstance(g, pcfg.Sphere):
        out += f"    sphere {{ radius: {float(g.radius)!r} }}\n"
    elif isinstance(g, pcfg.Capsule):
        end = f" end: {int(g.end)}" if g.end else ""
        out += (f"    capsule {{ radius: {float(g.radius)!r} "
                f"length: {float(g.length)!r}{end} }}\n")
    elif isinstance(g, pcfg.Box):
        hx, hy, hz = (float(c) for c in g.halfsize)
        out += f"    box {{ halfsize {{ x: {hx!r} y: {hy!r} z: {hz!r} }} }}\n"
    elif isinstance(g, pcfg.Plane):
        out += "    plane {}\n"
    else:
        raise TypeError(f"unsupported geom {type(g)}")
    return out + "  }\n"


def config_to_textproto(cfg: pcfg.Config) -> str:
    """Emit the Config as brax-v0-schema text (tools/brax_shim/config.proto)."""
    if cfg.thrusters:
        raise NotImplementedError("thrusters have no legacy text-proto schema")
    out = []
    for b in cfg.bodies:
        s = f'bodies {{\n  name: "{b.name}"\n'
        for col in b.colliders:
            s += _collider(col)
        ix, iy, iz = (float(c) for c in b.inertia)
        s += f"  inertia {{ x: {ix!r} y: {iy!r} z: {iz!r} }}\n"
        s += f"  mass: {float(b.mass)!r}\n"
        if b.frozen:
            s += "  frozen { all: true }\n"
        elif b.frozen_position != pcfg.ZERO3 or b.frozen_rotation != pcfg.ZERO3:
            s += "  frozen {\n"
            s += _vec3("position", b.frozen_position, "    ")
            s += _vec3("rotation", b.frozen_rotation, "    ")
            s += "  }\n"
        out.append(s + "}\n")
    for j in cfg.joints:
        s = f'joints {{\n  name: "{j.name}"\n'
        s += f"  stiffness: {float(j.stiffness)!r}\n"
        s += f'  parent: "{j.parent}"\n  child: "{j.child}"\n'
        s += _vec3("parent_offset", j.parent_offset, "  ")
        s += _vec3("child_offset", j.child_offset, "  ")
        s += _vec3("rotation", j.rotation, "  ")
        s += _vec3("reference_rotation", j.reference_rotation, "  ")
        if j.angular_damping:
            s += f"  angular_damping: {float(j.angular_damping)!r}\n"
        if j.spring_damping is not None:
            s += f"  spring_damping: {float(j.spring_damping)!r}\n"
        if j.limit_strength is not None:
            s += f"  limit_strength: {float(j.limit_strength)!r}\n"
        for lim in j.angle_limits:
            s += f"  angle_limit {{ min: {float(lim.min)!r} max: {float(lim.max)!r} }}\n"
        out.append(s + "}\n")
    for a in cfg.actuators:
        kind = {"torque": "torque {}", "angle": "angle {}"}[a.kind]
        out.append(
            f'actuators {{\n  name: "{a.name}"\n  joint: "{a.joint}"\n'
            f"  strength: {float(a.strength)!r}\n  {kind}\n}}\n")
    for first, second in cfg.collide_include:
        out.append(f'collide_include {{ first: "{first}" second: "{second}" }}\n')
    if cfg.default_qps or cfg.default_angles:
        s = "defaults {\n"
        for d in cfg.default_qps:
            s += f'  qps {{\n    name: "{d.name}"\n'
            s += _vec3("pos", d.pos, "    ")
            s += _vec3("rot", d.rot, "    ")
            s += "  }\n"
        for d in cfg.default_angles:
            s += f'  angles {{\n    name: "{d.name}"\n'
            s += _vec3("angle", d.angle, "    ")
            s += "  }\n"
        out.append(s + "}\n")
    out.append(f"friction: {float(cfg.friction)!r}\n")
    out.append(f"elasticity: {float(cfg.elasticity)!r}\n")
    gx, gy, gz = (float(c) for c in cfg.gravity)
    out.append(f"gravity {{ x: {gx!r} y: {gy!r} z: {gz!r} }}\n")
    out.append(f"angular_damping: {float(cfg.angular_damping)!r}\n")
    out.append(f"velocity_damping: {float(cfg.velocity_damping)!r}\n")
    out.append(f"baumgarte_erp: {float(cfg.baumgarte_erp)!r}\n")
    out.append(f"dt: {float(cfg.dt)!r}\n")
    out.append(f"substeps: {int(cfg.substeps)}\n")
    return "".join(out)
