"""ctypes binding for the native marching-tetrahedra triangulator."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "marching_tets.cpp")
_LIB = os.path.join(_HERE, "_marching_tets.so")
_lock = threading.Lock()
_lib = None


def load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB) or
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                            _SRC, "-o", _LIB + ".tmp"],
                           check=True, capture_output=True)
            os.replace(_LIB + ".tmp", _LIB)
        lib = ctypes.CDLL(_LIB)
        lib.marching_tets.restype = ctypes.c_int64
        lib.marching_tets.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.mt_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def marching_tets_native(volume: np.ndarray, level: float = 0.0):
    """volume (nx, ny, nz) float32 -> (verts (V, 3) grid units,
    faces (F, 3))."""
    lib = load()
    vol = np.ascontiguousarray(volume, np.float32)
    nx, ny, nz = vol.shape
    verts_p = ctypes.POINTER(ctypes.c_float)()
    faces_p = ctypes.POINTER(ctypes.c_int64)()
    n_faces = ctypes.c_int64()
    nv = lib.marching_tets(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nx, ny, nz, np.float32(level),
        ctypes.byref(verts_p), ctypes.byref(faces_p),
        ctypes.byref(n_faces))
    try:
        verts = np.ctypeslib.as_array(verts_p,
                                      shape=(nv, 3)).copy() if nv else \
            np.zeros((0, 3), np.float32)
        faces = np.ctypeslib.as_array(
            faces_p, shape=(n_faces.value, 3)).copy() if n_faces.value \
            else np.zeros((0, 3), np.int64)
    finally:
        lib.mt_free(verts_p)
        lib.mt_free(faces_p)
    return verts, faces
