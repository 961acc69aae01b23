"""Web viewer: serves the page and renders frames over HTTP."""

import urllib.request

import numpy as np
import pytest

from gs_localization_tpu.raster import RasterizerConfig
from gs_localization_tpu.utils.viewer import serve

from helpers import random_scene


def test_viewer_serves_frames(rng):
    g = random_scene(rng, n=80, sh_degree=1)
    cfg = RasterizerConfig(max_pairs=1 << 13, max_per_tile=64, chunk=32,
                           backend="jnp")
    httpd = serve(g, width=64, height=48, port=0, raster_cfg=cfg, block=False)
    port = httpd.server_address[1]
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=30).read()
        assert b"gsloc viewer" in page
        frame = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/render?az=0.3&el=0.1&r=4", timeout=120
        ).read()
        assert frame[:2] == b"\xff\xd8"  # JPEG magic
        assert len(frame) > 500
    finally:
        httpd.shutdown()
