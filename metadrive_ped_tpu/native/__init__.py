"""Native (C++) runtime components, consumed via ctypes.

Currently: the top-down map rasterizer (td_raster.cpp). The library is
compiled on first use with g++; a numpy fallback keeps the package usable
without a toolchain.
"""
import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libtdraster.so")
_SRC = os.path.join(_DIR, "td_raster.cpp")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_SO)) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.rasterize_polylines.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, f32p, i32p, ctypes.c_int, f32p, ctypes.c_float,
        ]
        lib.rasterize_polygons.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, f32p, i32p, ctypes.c_int, ctypes.c_float,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def rasterize_polylines(grid, origin, res, polylines, widths, value=1.0):
    """Stamp thick polylines into `grid` [H,W] float32 (in place).

    polylines: list of [n_i, 2] float arrays (world coords); widths: list of
    full stroke widths (m).
    """
    if not polylines:
        return grid
    pts = np.concatenate([np.asarray(p, np.float32).reshape(-1, 2) for p in polylines])
    starts = np.zeros(len(polylines) + 1, np.int32)
    np.cumsum([len(p) for p in polylines], out=starts[1:])
    widths = np.asarray(widths, np.float32)
    lib = _load()
    H, W = grid.shape
    if lib is not None:
        lib.rasterize_polylines(
            grid, H, W, np.float32(origin[0]), np.float32(origin[1]),
            np.float32(res), pts.reshape(-1), starts, len(polylines), widths, np.float32(value)
        )
        return grid
    # numpy fallback (slow; used only without a C++ toolchain)
    for p, w in zip(polylines, widths):
        p = (np.asarray(p, np.float32) - np.asarray(origin, np.float32)) / res
        half = w / (2 * res)
        for a, b in zip(p[:-1], p[1:]):
            x0 = max(0, int(min(a[0], b[0]) - half - 1))
            x1 = min(W - 1, int(max(a[0], b[0]) + half + 1))
            y0 = max(0, int(min(a[1], b[1]) - half - 1))
            y1 = min(H - 1, int(max(a[1], b[1]) + half + 1))
            if x1 < x0 or y1 < y0:
                continue
            xs, ys = np.meshgrid(np.arange(x0, x1 + 1), np.arange(y0, y1 + 1))
            d = b - a
            len2 = (d ** 2).sum()
            t = np.clip(((xs - a[0]) * d[0] + (ys - a[1]) * d[1]) / max(len2, 1e-9), 0, 1)
            px = xs - (a[0] + t * d[0])
            py = ys - (a[1] + t * d[1])
            mask = px ** 2 + py ** 2 <= half ** 2
            region = grid[y0:y1 + 1, x0:x1 + 1]
            region[mask] = np.maximum(region[mask], value)
    return grid


def native_available():
    return _load() is not None
