"""ctypes bindings for the native C++ I/O runtime (native/st3d_native.cpp).

Builds the shared library on first use (g++ + zlib, ~2s) and caches it at
native/build/libst3d_native.so. Every entry point has a pure-Python
fallback, so the framework works without a toolchain; the native paths are
strictly faster (OBJ parse ~40x; PNG writes move off the training thread).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import warnings
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libst3d_native.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.isfile(_SO_PATH)
    except Exception as e:  # toolchain missing / compile error -> fallback
        warnings.warn(f"st3d native build failed ({e}); using Python I/O")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it if needed; None on failure."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.isfile(_SO_PATH) and not _build():
            _build_failed = True
            return None
        lib = ctypes.CDLL(_SO_PATH)
        lib.st3d_obj_parse.restype = ctypes.c_void_p
        lib.st3d_obj_parse.argtypes = [ctypes.c_char_p]
        lib.st3d_obj_error.restype = ctypes.c_char_p
        lib.st3d_obj_error.argtypes = [ctypes.c_void_p]
        lib.st3d_obj_mtllib.restype = ctypes.c_char_p
        lib.st3d_obj_mtllib.argtypes = [ctypes.c_void_p]
        lib.st3d_obj_counts.restype = None
        lib.st3d_obj_counts.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)
        ]
        lib.st3d_obj_copy.restype = None
        lib.st3d_obj_copy.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.st3d_obj_free.restype = None
        lib.st3d_obj_free.argtypes = [ctypes.c_void_p]
        lib.st3d_png_write.restype = ctypes.c_int
        lib.st3d_png_write.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int
        ]
        lib.st3d_png_write_async.restype = None
        lib.st3d_png_write_async.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int
        ]
        lib.st3d_io_flush.restype = ctypes.c_long
        _lib = lib
        return _lib


def parse_obj_native(path: str):
    """Native OBJ parse -> dict of arrays, or None if the lib is missing.

    Output contract matches st3d.io.obj.load_obj's geometry fields (the
    Python parser remains the golden reference; tests assert equality).
    """
    lib = get_lib()
    if lib is None:
        return None
    handle = lib.st3d_obj_parse(path.encode())
    try:
        err = lib.st3d_obj_error(handle)
        if err:
            raise IOError(err.decode())
        counts = (ctypes.c_int64 * 6)()
        lib.st3d_obj_counts(handle, counts)
        nv, nt, nn, nf, has_vt, has_vn = [int(c) for c in counts]
        verts = np.empty((nv, 3), np.float32)
        uvs = np.empty((nt, 2), np.float32)
        normals = np.empty((nn, 3), np.float32)
        faces_v = np.empty((nf, 3), np.int32)
        faces_vt = np.empty((nf, 3), np.int32)
        faces_vn = np.empty((nf, 3), np.int32)

        def ptr(a, ty):
            return a.ctypes.data_as(ctypes.POINTER(ty)) if a.size else None

        lib.st3d_obj_copy(
            handle,
            ptr(verts, ctypes.c_float), ptr(uvs, ctypes.c_float),
            ptr(normals, ctypes.c_float),
            ptr(faces_v, ctypes.c_int32), ptr(faces_vt, ctypes.c_int32),
            ptr(faces_vn, ctypes.c_int32),
        )
        mtllib = lib.st3d_obj_mtllib(handle).decode() or None
        return {
            "verts": verts,
            "verts_uvs": uvs if nt else None,
            "normals": normals if nn else None,
            "faces": faces_v,
            "faces_uvs": faces_vt if has_vt else None,
            "faces_normals": faces_vn if has_vn else None,
            "mtllib": mtllib,
        }
    finally:
        lib.st3d_obj_free(handle)


def write_png(path: str, rgb8: np.ndarray, async_: bool = False) -> bool:
    """Write an (H, W, 3) uint8 array as PNG natively; False -> caller
    should fall back to PIL."""
    lib = get_lib()
    if lib is None:
        return False
    rgb8 = np.ascontiguousarray(rgb8, dtype=np.uint8)
    h, w = rgb8.shape[:2]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = rgb8.ctypes.data_as(ctypes.c_char_p)
    if async_:
        lib.st3d_png_write_async(path.encode(), data, w, h)
        return True
    return lib.st3d_png_write(path.encode(), data, w, h) == 0


def flush() -> int:
    """Wait for pending async writes; returns failed-write count."""
    lib = get_lib()
    if lib is None:
        return 0
    return int(lib.st3d_io_flush())
