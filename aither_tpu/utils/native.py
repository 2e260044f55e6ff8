"""ctypes bindings for the native host-runtime components.

The hot device compute is JAX/XLA; host-side preprocessing that the
reference implements in C++ (the k-d tree used for wall distances and
point-cloud ICs, reference: src/kdtree.cpp) is likewise native here,
compiled on first use from ``native/kdtree.cpp`` and loaded via ctypes.
Falls back to a vectorized numpy brute force when no compiler is
available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libaither_native.so")
_lib = None
_lib_tried = False


def _load():
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not os.path.isfile(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.kdtree_build.restype = ctypes.c_void_p
        lib.kdtree_build.argtypes = [ctypes.POINTER(ctypes.c_double),
                                     ctypes.c_int64]
        lib.kdtree_free.argtypes = [ctypes.c_void_p]
        lib.kdtree_nearest.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def nearest_neighbors(points: np.ndarray, queries: np.ndarray):
    """(indices, distances) of the nearest point for each query.

    points: (n, 3), queries: (m, 3).  Uses the native k-d tree when
    available, else chunked numpy brute force.
    """
    points = np.ascontiguousarray(points, dtype=np.float64)
    queries = np.ascontiguousarray(queries, dtype=np.float64)
    lib = _load()
    if lib is not None and len(points) > 0:
        tree = lib.kdtree_build(
            points.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            len(points))
        idx = np.empty(len(queries), dtype=np.int64)
        dist = np.empty(len(queries), dtype=np.float64)
        lib.kdtree_nearest(
            tree, queries.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            len(queries), idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            dist.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        lib.kdtree_free(tree)
        return idx, dist
    # numpy fallback
    idx = np.empty(len(queries), dtype=np.int64)
    dist = np.empty(len(queries), dtype=np.float64)
    chunk = 16384
    for s in range(0, len(queries), chunk):
        d2 = ((queries[s:s + chunk, None, :] - points[None, :, :]) ** 2
              ).sum(axis=-1)
        ii = d2.argmin(axis=1)
        idx[s:s + chunk] = ii
        dist[s:s + chunk] = np.sqrt(d2[np.arange(len(ii)), ii])
    return idx, dist
