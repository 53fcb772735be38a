"""ctypes loader (with on-demand compilation) for the native VTK formatter.

Falls back silently to ``None`` when no C toolchain is available; io.vtk then
uses the pure-numpy path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "vtkfmt.c"
_LIB = _HERE / "_vtkfmt.so"

_lib = None
_tried = False


def _build():
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O2", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB)]
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)


def get_lib():
    """Return the loaded native library, building it on first use."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_LIB))
        lib.vtk_format_f64.restype = ctypes.c_long
        lib.vtk_format_f64.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
            ctypes.c_char_p, ctypes.c_long]
        lib.vtk_format_f32.restype = ctypes.c_long
        lib.vtk_format_f32.argtypes = lib.vtk_format_f64.argtypes
        lib.vtk_format_vec3_f64.restype = ctypes.c_long
        lib.vtk_format_vec3_f64.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_long, ctypes.c_char_p, ctypes.c_long]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def format_scalar(arr, row_len: int) -> str | None:
    """Format a float array as the body of a SCALARS block, or None if the
    native path is unavailable."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(arr)
    n = a.size
    cap = 32 * n + n // max(row_len, 1) + 64
    buf = ctypes.create_string_buffer(cap)
    if a.dtype == np.float32:
        written = lib.vtk_format_f32(a.ctypes.data, n, row_len, buf, cap)
    else:
        a = a.astype(np.float64, copy=False)
        written = lib.vtk_format_f64(a.ctypes.data, n, row_len, buf, cap)
    if written < 0:
        return None
    return buf.raw[:written].decode("ascii")


def format_vector3(vx, vy, vz) -> str | None:
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    ax = np.ascontiguousarray(vx, dtype=np.float64)
    ay = np.ascontiguousarray(vy, dtype=np.float64)
    az = np.ascontiguousarray(vz, dtype=np.float64)
    n = ax.size
    cap = 96 * n + 64
    buf = ctypes.create_string_buffer(cap)
    written = lib.vtk_format_vec3_f64(
        ax.ctypes.data, ay.ctypes.data, az.ctypes.data, n, buf, cap)
    if written < 0:
        return None
    return buf.raw[:written].decode("ascii")
