"""Native (C++) runtime components, built on demand with g++ and loaded
via ctypes (no pybind11 dependency)."""
import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "librasterizer.so")
_SRC = os.path.join(_DIR, "rasterizer.cpp")

_lib = None


def rasterizer_lib():
    """Compile (once) and load the native renderer; None if no g++."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O2", "-fopenmp", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True, capture_output=True)
        _lib = ctypes.CDLL(_SO)
        if not hasattr(_lib, "render_scene_mesh"):  # stale prebuilt .so
            subprocess.run(
                ["g++", "-O2", "-fopenmp", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True, capture_output=True)
            _lib = ctypes.CDLL(_SO)
        fptr = ctypes.POINTER(ctypes.c_float)
        iptr = ctypes.POINTER(ctypes.c_int32)
        _lib.render_scene.argtypes = [
            fptr, fptr, iptr, fptr, fptr, ctypes.c_int,
            fptr, fptr, ctypes.c_float, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib.render_scene.restype = None
        _lib.render_scene_mesh.argtypes = [
            fptr, fptr, iptr, fptr, fptr, ctypes.c_int,
            fptr, iptr, iptr, fptr,
            fptr, fptr, ctypes.c_float, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib.render_scene_mesh.restype = None
    except Exception as e:  # pragma: no cover - toolchain missing
        print("native rasterizer unavailable:", e)
        _lib = False
    return _lib
