"""Lightweight web viewer for trained Gaussian maps.

Replaces the reference's SIBR/OpenGL interactive viewer + socket GUI
(~83k LoC C++, SURVEY.md §2.8 — "no algorithmic capability") with a
~150-line HTTP server: renders the map server-side through the TPU
rasterizer and serves JPEG/PNG frames with simple orbit controls.

    from gs_localization_tpu.utils.viewer import serve
    serve(gaussians, height=480, width=640, port=8800)
"""

from __future__ import annotations

import io
import json
import math
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!doctype html><html><head><title>gsloc viewer</title><style>
body{margin:0;background:#111;color:#eee;font-family:monospace}
#c{display:block;margin:12px auto;border:1px solid #444}
#hud{position:fixed;top:8px;left:8px}</style></head><body>
<div id=hud>drag: orbit | wheel: dolly | shift-drag: pan</div>
<img id=c width=%WIDTH% height=%HEIGHT%>
<script>
let az=0, el=0, r=4, cx=0, cy=0, cz=3.5, busy=false, dirty=true;
const img=document.getElementById('c');
function refresh(){ if(busy) {dirty=true; return;} busy=true; dirty=false;
 img.src=`/render?az=${az}&el=${el}&r=${r}&cx=${cx}&cy=${cy}&cz=${cz}&t=${Date.now()}`;
 img.onload=()=>{busy=false; if(dirty) refresh();}; img.onerror=img.onload; }
let drag=null;
img.onmousedown=e=>{drag=[e.clientX,e.clientY,e.shiftKey];e.preventDefault()};
window.onmouseup=()=>drag=null;
window.onmousemove=e=>{ if(!drag) return;
 const dx=e.clientX-drag[0], dy=e.clientY-drag[1];
 if(drag[2]){ cx-=dx*0.003*r; cy-=dy*0.003*r; } else { az+=dx*0.01; el+=dy*0.01; }
 drag=[e.clientX,e.clientY,drag[2]]; refresh(); };
img.onwheel=e=>{ r*=Math.exp(e.deltaY*0.001); refresh(); e.preventDefault(); };
refresh();
</script></body></html>"""


def serve(gaussians, width: int = 640, height: int = 480, port: int = 8800,
          fov: float = 1.1, raster_cfg=None, block: bool = True):
    import jax.numpy as jnp

    from ..core.camera import Camera
    from ..raster import RasterizerConfig, rasterize
    from ..core import se3

    if raster_cfg is None:
        raster_cfg = RasterizerConfig()
    fx = width / (2.0 * math.tan(fov / 2.0))
    lock = threading.Lock()

    def render_frame(az, el, r, cx, cy, cz):
        # orbit camera around (cx, cy, cz)
        import jax

        ce, se_ = math.cos(el), math.sin(el)
        ca, sa = math.cos(az), math.sin(az)
        # camera center on a sphere
        offset = np.array([r * ce * sa, r * se_, -r * ce * ca])
        center = np.array([cx, cy, cz])
        campos = center + offset
        fwd = center - campos
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        R = np.stack([right, up2, fwd])       # w2c rotation rows
        t = -R @ campos
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = R
        w2c[:3, 3] = t
        cam = Camera(
            w2c=jnp.asarray(w2c), fx=jnp.float32(fx), fy=jnp.float32(fx),
            cx=jnp.float32(width / 2), cy=jnp.float32(height / 2),
            width=width, height=height,
        )
        with lock:
            out = rasterize(gaussians, cam, raster_cfg)
            img = np.asarray(out.color)
        return (np.clip(img, 0, 1) * 255).astype(np.uint8)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            u = urlparse(self.path)
            if u.path == "/":
                body = (_PAGE.replace("%WIDTH%", str(width))
                        .replace("%HEIGHT%", str(height))).encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(body)
                return
            if u.path == "/render":
                q = parse_qs(u.query)
                g = lambda k, d: float(q.get(k, [d])[0])
                try:
                    img = render_frame(g("az", 0), g("el", 0), g("r", 4),
                                       g("cx", 0), g("cy", 0), g("cz", 3.5))
                    from PIL import Image

                    buf = io.BytesIO()
                    Image.fromarray(img).save(buf, "JPEG", quality=85)
                    self.send_response(200)
                    self.send_header("Content-Type", "image/jpeg")
                    self.end_headers()
                    self.wfile.write(buf.getvalue())
                except BrokenPipeError:
                    pass
                return
            self.send_response(404)
            self.end_headers()

    httpd = ThreadingHTTPServer(("0.0.0.0", port), Handler)
    print(f"viewer on http://localhost:{port}/")
    if block:
        httpd.serve_forever()
    else:
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd
