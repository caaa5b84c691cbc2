"""ctypes bindings for the native runtime library (native/tpt_native.cpp):
fast OBJ parse + dedup and HDR RLE decode. Builds on demand with `make`
(g++ only); every caller has a pure-Python fallback, so the native tier is
an accelerator, not a dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtpt_native.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.tpt_parse_obj.restype = ctypes.c_void_p
    lib.tpt_parse_obj.argtypes = [ctypes.c_char_p]
    lib.tpt_mesh_error.restype = ctypes.c_char_p
    lib.tpt_mesh_error.argtypes = [ctypes.c_void_p]
    lib.tpt_mesh_counts.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32)]
    lib.tpt_mesh_copy.argtypes = [ctypes.c_void_p] + [
        np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")] * 3 + [
        np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")] * 2
    lib.tpt_mesh_material_name.restype = ctypes.c_int32
    lib.tpt_mesh_material_name.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32]
    lib.tpt_mesh_mtl_file.restype = ctypes.c_int32
    lib.tpt_mesh_mtl_file.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32]
    lib.tpt_free_mesh.argtypes = [ctypes.c_void_p]
    lib.tpt_decode_hdr_rle.restype = ctypes.c_int32
    lib.tpt_decode_hdr_rle.argtypes = [
        np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")]
    lib.tpt_build_sah.restype = ctypes.c_void_p
    lib.tpt_build_sah.argtypes = [
        np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int64]
    lib.tpt_sah_counts.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_int64)]
    lib.tpt_sah_copy.argtypes = [ctypes.c_void_p] + [
        np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")] * 4 + [
        np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")] * 2
    lib.tpt_free_sah.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def build_sah_native(v012: np.ndarray):
    """Binned-SAH BVH build. v012: [T, 9] float32 triangle corners.
    Returns (left, right, parent, prim_index, aabb_min [N,3], aabb_max)
    in the standard layout (internal [0, T-2], leaves [T-1, 2T-2]),
    or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    t = v012.shape[0]
    h = lib.tpt_build_sah(np.ascontiguousarray(v012, np.float32), t)
    try:
        total = ctypes.c_int64()
        lib.tpt_sah_counts(h, ctypes.byref(total))
        n = total.value
        if n == 0:
            return None
        left = np.empty(n, np.int32)
        right = np.empty(n, np.int32)
        parent = np.empty(n, np.int32)
        prim = np.empty(n, np.int32)
        amin = np.empty((n, 3), np.float32)
        amax = np.empty((n, 3), np.float32)
        lib.tpt_sah_copy(h, left, right, parent, prim, amin.reshape(-1),
                         amax.reshape(-1))
        return left, right, parent, prim, amin, amax
    finally:
        lib.tpt_free_sah(h)


def available() -> bool:
    return _load() is not None


def parse_obj_native(path: str):
    """Returns (positions [V,3], normals [V,3], uvs [V,2], indices [T,3],
    mat_ids [T] (into names), names list, mtl_files list) or None if the
    native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    h = lib.tpt_parse_obj(path.encode())
    try:
        err = lib.tpt_mesh_error(h)
        if err:
            raise IOError(f"native obj parse failed: {err.decode()}")
        nv = ctypes.c_int64()
        nt = ctypes.c_int64()
        nm = ctypes.c_int32()
        nf = ctypes.c_int32()
        lib.tpt_mesh_counts(h, ctypes.byref(nv), ctypes.byref(nt),
                            ctypes.byref(nm), ctypes.byref(nf))
        pos = np.empty((nv.value, 3), np.float32)
        nrm = np.empty((nv.value, 3), np.float32)
        uv = np.empty((nv.value, 2), np.float32)
        idx = np.empty((nt.value, 3), np.int32)
        mat = np.empty((nt.value,), np.int32)
        if nv.value:
            lib.tpt_mesh_copy(h, pos, nrm, uv, idx, mat)
        buf = ctypes.create_string_buffer(4096)
        names: List[str] = []
        for i in range(nm.value):
            lib.tpt_mesh_material_name(h, i, buf, 4096)
            names.append(buf.value.decode(errors="replace"))
        mtls: List[str] = []
        for i in range(nf.value):
            lib.tpt_mesh_mtl_file(h, i, buf, 4096)
            mtls.append(buf.value.decode(errors="replace"))
        return pos, nrm, uv, idx, mat, names, mtls
    finally:
        lib.tpt_free_mesh(h)


def decode_hdr_rle_native(data: bytes, width: int, height: int
                          ) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    arr = np.frombuffer(data, np.uint8)
    out = np.empty((height, width, 4), np.uint8)
    rc = lib.tpt_decode_hdr_rle(np.ascontiguousarray(arr), arr.size,
                                width, height, out)
    if rc != 0:
        return None
    return out
