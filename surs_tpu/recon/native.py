"""ctypes bindings for the native mesh backend (csrc/mesh_native.cpp).

Loads ``csrc/libsurs_native.so`` if present (``make -C csrc``); every
entry point has a pure-numpy fallback in tetra.py / mesh_io.py, so the
framework works without the native build — just slower on the host side.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SO_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                 "libsurs_native.so"),
    os.path.join(os.path.dirname(__file__), "libsurs_native.so"),
]


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    for p in _SO_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            try:
                lib = ctypes.CDLL(p)
            except OSError:
                continue
            lib.surs_marching_tetrahedra.restype = ctypes.c_int
            lib.surs_marching_tetrahedra.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
                ctypes.POINTER(ctypes.c_int64)]
            lib.surs_free.argtypes = [ctypes.c_void_p]
            lib.surs_write_obj.restype = ctypes.c_int
            lib.surs_write_obj.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64]
            lib.surs_read_obj.restype = ctypes.c_int
            lib.surs_read_obj.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64)]
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _load() is not None


def marching_tetrahedra(volume: np.ndarray, level: float
                        ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    vol = np.ascontiguousarray(volume, dtype=np.float32)
    X, Y, Z = vol.shape
    vp = ctypes.POINTER(ctypes.c_float)()
    fp = ctypes.POINTER(ctypes.c_int64)()
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    rc = lib.surs_marching_tetrahedra(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        X, Y, Z, ctypes.c_float(level),
        ctypes.byref(vp), ctypes.byref(nv), ctypes.byref(fp),
        ctypes.byref(nf))
    if rc != 0:
        return None
    try:
        verts = np.ctypeslib.as_array(vp, shape=(nv.value, 3)).copy() \
            if nv.value else np.zeros((0, 3), np.float32)
        faces = np.ctypeslib.as_array(fp, shape=(nf.value, 3)).copy() \
            if nf.value else np.zeros((0, 3), np.int64)
    finally:
        lib.surs_free(vp)
        lib.surs_free(fp)
    return verts, faces


def write_obj(path: str, verts: np.ndarray, faces: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    verts = np.ascontiguousarray(verts, dtype=np.float64)
    faces = np.ascontiguousarray(faces, dtype=np.int64)
    rc = lib.surs_write_obj(
        path.encode(), verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        verts.shape[0], faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        faces.shape[0])
    return rc == 0


def read_obj(path: str) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    rc = lib.surs_read_obj(path.encode(), None, ctypes.byref(nv), None,
                           ctypes.byref(nf))
    if rc != 0:
        return None
    verts = np.empty((nv.value, 3), np.float32)
    faces = np.empty((nf.value, 3), np.int64)
    rc = lib.surs_read_obj(
        path.encode(), verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(nv), faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.byref(nf))
    if rc != 0:
        return None
    return verts, faces
