"""Standalone HTML trajectory renderer.

Equivalent of the `brax.io.html.render(sys, [qp, ...])` surface the
reference's notebooks use for eyeball verification (SURVEY.md §4: ant_gather
nb cell 4, ant_tag nb cell 3). Produces a single self-contained HTML page:
scene geometry + per-frame body poses are embedded as JSON and animated with
three.js (loaded from a CDN by the viewer's browser; nothing is fetched at
render time here).

Usage:
    from pobrax_tpu.io import html
    page = html.render(env.sys, [state.qp for state in rollout])
    html.save("traj.html", env.sys, qps)
"""

from __future__ import annotations

import json
from typing import List, Sequence

import numpy as np

from pobrax_tpu.physics import config as pcfg
from pobrax_tpu.physics.system import System


def _geom_json(col: pcfg.Collider) -> dict:
    g = col.geom
    base = {"pos": list(map(float, col.position)),
            "rot": list(map(float, col.rotation))}
    if isinstance(g, pcfg.Sphere):
        return {**base, "type": "sphere", "radius": g.radius}
    if isinstance(g, pcfg.Capsule):
        return {**base, "type": "capsule", "radius": g.radius, "length": g.length}
    if isinstance(g, pcfg.Box):
        return {**base, "type": "box", "halfsize": list(map(float, g.halfsize))}
    if isinstance(g, pcfg.Plane):
        return {**base, "type": "plane"}
    return {**base, "type": "unknown"}


def _scene_json(sys: System) -> dict:
    bodies = []
    for b in sys.config.bodies:
        bodies.append({
            "name": b.name,
            "frozen": bool(b.frozen),
            "colliders": [_geom_json(c) for c in b.colliders],
        })
    return {"bodies": bodies, "dt": sys.config.dt}


def _frames_json(qps: Sequence) -> List[dict]:
    frames = []
    for qp in qps:
        pos = np.asarray(qp.pos, np.float32)
        rot = np.asarray(qp.rot, np.float32)
        frames.append({
            "pos": np.round(pos, 4).tolist(),
            "rot": np.round(rot, 4).tolist(),
        })
    return frames


_PAGE = """<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8"/>
<style>
  html, body {{ margin: 0; height: 100%; overflow: hidden; background: #1a1a2e; }}
  #info {{ position: absolute; top: 8px; left: 12px; color: #eee;
          font-family: monospace; font-size: 13px; z-index: 2; }}
  #bar {{ position: absolute; bottom: 12px; left: 5%; width: 90%; z-index: 2; }}
</style>
<!-- r147: the last release shipping UMD build/three.min.js and
     examples/js/controls (both were removed by r148-r160) -->
<script src="https://cdn.jsdelivr.net/npm/three@0.147.0/build/three.min.js"></script>
<script src="https://cdn.jsdelivr.net/npm/three@0.147.0/examples/js/controls/OrbitControls.js"></script>
</head>
<body>
<div id="info"></div>
<input id="bar" type="range" min="0" value="0" step="1"/>
<script>
const SCENE = {scene_json};
const FRAMES = {frames_json};

const renderer = new THREE.WebGLRenderer({{antialias: true}});
renderer.setSize(window.innerWidth, window.innerHeight);
renderer.shadowMap.enabled = true;
document.body.appendChild(renderer.domElement);
const scene = new THREE.Scene();
scene.fog = new THREE.Fog(0x1a1a2e, 30, 120);
const camera = new THREE.PerspectiveCamera(
    50, window.innerWidth / window.innerHeight, 0.05, 500);
camera.position.set(6, -8, 5); camera.up.set(0, 0, 1);
const controls = new THREE.OrbitControls(camera, renderer.domElement);
scene.add(new THREE.AmbientLight(0xffffff, 0.55));
const sun = new THREE.DirectionalLight(0xffffff, 1.1);
sun.position.set(10, -10, 25); sun.castShadow = true; scene.add(sun);

function eulerQuat(deg) {{
  const e = new THREE.Euler(deg[0]*Math.PI/180, deg[1]*Math.PI/180,
                            deg[2]*Math.PI/180, 'XYZ');
  return new THREE.Quaternion().setFromEuler(e);
}}
const palette = [0x6ec6ff, 0xffd54f, 0xff8a65, 0xa5d6a7, 0xce93d8,
                 0x90caf9, 0xffab91, 0xc5e1a5, 0xf48fb1, 0x80cbc4];
const groups = [];
SCENE.bodies.forEach((body, bi) => {{
  const group = new THREE.Group();
  const mat = new THREE.MeshStandardMaterial({{
    color: body.frozen ? 0x555b6e : palette[bi % palette.length],
    roughness: 0.6 }});
  body.colliders.forEach(col => {{
    let mesh = null;
    if (col.type === 'sphere') {{
      mesh = new THREE.Mesh(new THREE.SphereGeometry(col.radius, 24, 16), mat);
    }} else if (col.type === 'capsule') {{
      // three capsules extend along local y; our capsules along local z
      const geo = new THREE.CapsuleGeometry(
          col.radius, Math.max(col.length - 2 * col.radius, 0.001), 8, 16);
      mesh = new THREE.Mesh(geo, mat);
      mesh.rotation.x = Math.PI / 2;
      const holder = new THREE.Group(); holder.add(mesh); mesh = holder;
    }} else if (col.type === 'box') {{
      mesh = new THREE.Mesh(new THREE.BoxGeometry(
          2*col.halfsize[0], 2*col.halfsize[1], 2*col.halfsize[2]), mat);
    }} else if (col.type === 'plane') {{
      mesh = new THREE.Mesh(new THREE.PlaneGeometry(200, 200),
        new THREE.MeshStandardMaterial({{color: 0x2e2e44, roughness: 1.0}}));
      mesh.receiveShadow = true;
    }}
    if (mesh) {{
      mesh.position.set(col.pos[0], col.pos[1], col.pos[2]);
      mesh.quaternion.premultiply(eulerQuat(col.rot));
      mesh.castShadow = col.type !== 'plane';
      group.add(mesh);
    }}
  }});
  scene.add(group); groups.push(group);
}});

const bar = document.getElementById('bar');
bar.max = FRAMES.length - 1;
const info = document.getElementById('info');
let frame = 0, playing = true;
function setFrame(f) {{
  frame = f;
  const fr = FRAMES[f];
  groups.forEach((g, i) => {{
    g.position.set(fr.pos[i][0], fr.pos[i][1], fr.pos[i][2]);
    // stored quat is (w, x, y, z); three wants (x, y, z, w)
    g.quaternion.set(fr.rot[i][1], fr.rot[i][2], fr.rot[i][3], fr.rot[i][0]);
  }});
  info.textContent = 'frame ' + f + ' / ' + (FRAMES.length - 1) +
      '  t=' + (f * SCENE.dt).toFixed(2) + 's  (space: play/pause)';
  bar.value = f;
}}
bar.addEventListener('input', () => {{ playing = false; setFrame(+bar.value); }});
window.addEventListener('keydown', e => {{
  if (e.code === 'Space') {{ playing = !playing; e.preventDefault(); }}
}});
let last = 0;
function animate(t) {{
  requestAnimationFrame(animate);
  if (playing && t - last > 1000 * SCENE.dt) {{
    last = t; setFrame((frame + 1) % FRAMES.length);
  }}
  controls.update();
  renderer.render(scene, camera);
}}
setFrame(0); animate(0);
window.addEventListener('resize', () => {{
  camera.aspect = window.innerWidth / window.innerHeight;
  camera.updateProjectionMatrix();
  renderer.setSize(window.innerWidth, window.innerHeight);
}});
</script>
</body>
</html>
"""


def render(sys: System, qps: Sequence) -> str:
    """Render a trajectory (list of QP pytrees, or one batched-over-time QP)
    to a standalone HTML string."""
    if hasattr(qps, "pos") and np.asarray(qps.pos).ndim == 3:
        pos, rot = np.asarray(qps.pos), np.asarray(qps.rot)
        qps = [type("F", (), {"pos": pos[t], "rot": rot[t]})()
               for t in range(pos.shape[0])]
    return _PAGE.format(
        scene_json=json.dumps(_scene_json(sys)),
        frames_json=json.dumps(_frames_json(qps)),
    )


def save(path: str, sys: System, qps: Sequence) -> None:
    with open(path, "w") as f:
        f.write(render(sys, qps))
