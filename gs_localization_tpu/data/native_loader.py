"""ctypes binding for the native threaded image loader (native/loader.cpp).

Builds the shared library on demand (g++ + libpng/libjpeg, both baked into
the image) and exposes an async prefetcher:

    loader = NativeLoader(n_threads=4)
    loader.submit(tag=0, path="img.png", kind=KIND_RGB)
    tag, array = loader.fetch()        # (H, W, 3) float32 in [0,1]

Falls back cleanly (``NativeLoader.available() == False``) when no compiler
exists; callers then use data.scene.load_image (PIL).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

KIND_RGB = 0
KIND_DEPTH16 = 1

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgsl_loader.so")

_lib_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.gsl_create.restype = ctypes.c_void_p
        lib.gsl_create.argtypes = [ctypes.c_int]
        lib.gsl_destroy.argtypes = [ctypes.c_void_p]
        lib.gsl_submit.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                   ctypes.c_char_p, ctypes.c_int]
        lib.gsl_fetch.restype = ctypes.c_long
        lib.gsl_fetch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ]
        lib.gsl_peek_size.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.gsl_last_error.restype = ctypes.c_char_p
        lib.gsl_last_error.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


class NativeLoader:
    """Async threaded decoder. Not fork-safe; one per process."""

    def __init__(self, n_threads: int = 4,
                 initial_capacity: int = 1920 * 1080 * 3):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable (build failed)")
        self._lib = lib
        self._h = lib.gsl_create(n_threads)
        self._buf = np.empty(initial_capacity, np.float32)

    @staticmethod
    def available() -> bool:
        return _load_lib() is not None

    def submit(self, tag: int, path: str, kind: int = KIND_RGB) -> None:
        self._lib.gsl_submit(self._h, tag, path.encode(), kind)

    def fetch(self) -> Tuple[int, np.ndarray]:
        w = ctypes.c_int()
        h = ctypes.c_int()
        c = ctypes.c_int()
        while True:
            tag = self._lib.gsl_fetch(
                self._h, ctypes.byref(w), ctypes.byref(h), ctypes.byref(c),
                self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self._buf.size,
            )
            if tag == -2:
                self._lib.gsl_peek_size(self._h, ctypes.byref(w),
                                        ctypes.byref(h), ctypes.byref(c))
                self._buf = np.empty(w.value * h.value * max(c.value, 1),
                                     np.float32)
                continue
            if tag == -1:
                raise IOError(self._lib.gsl_last_error(self._h).decode())
            n = w.value * h.value * c.value
            arr = self._buf[:n].reshape(h.value, w.value, c.value).copy()
            if c.value == 1:
                arr = arr[:, :, 0]
            return tag, arr

    def close(self) -> None:
        if self._h:
            self._lib.gsl_destroy(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


class PrefetchingSceneLoader:
    """Image/depth loader for training: keeps up to ``ahead`` decodes in
    flight and serves results by uid with host-side caching."""

    def __init__(self, n_threads: int = 4, cache: bool = True):
        self._loader = NativeLoader(n_threads)
        self._cache: dict = {}
        self._pending: dict = {}
        self._next_tag = 0
        self._tags: dict = {}
        self._use_cache = cache

    def request(self, uid: int, image_path: str,
                depth_path: Optional[str] = None) -> None:
        if uid in self._cache or uid in self._pending:
            return
        tag_img = self._next_tag
        self._next_tag += 1
        self._loader.submit(tag_img, image_path, KIND_RGB)
        tag_dep = None
        if depth_path and os.path.exists(depth_path):
            tag_dep = self._next_tag
            self._next_tag += 1
            self._loader.submit(tag_dep, depth_path, KIND_DEPTH16)
        self._pending[uid] = {"img": tag_img, "dep": tag_dep,
                              "img_data": None, "dep_data": None}
        self._tags[tag_img] = (uid, "img")
        if tag_dep is not None:
            self._tags[tag_dep] = (uid, "dep")

    def get(self, uid: int):
        if uid in self._cache:
            return self._cache[uid]
        assert uid in self._pending, f"uid {uid} never requested"
        while uid in self._pending:
            tag, arr = self._loader.fetch()
            puid, kind = self._tags.pop(tag)
            ent = self._pending[puid]
            ent[f"{kind}_data"] = arr
            img_done = ent["img_data"] is not None
            dep_done = ent["dep"] is None or ent["dep_data"] is not None
            if img_done and dep_done:
                result = (ent["img_data"], ent["dep_data"])
                del self._pending[puid]
                if self._use_cache:
                    self._cache[puid] = result
                if puid == uid:
                    return result
        return self._cache[uid]
