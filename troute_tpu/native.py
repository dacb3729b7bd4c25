"""ctypes loader for the native topology kernels.

Compiles ``native/topology_kernels.cpp`` on first use (g++ -O3, cached next
to the source) and exposes NumPy-friendly wrappers.  Every entry point has
a NumPy fallback so the package works without a toolchain; the native path
turns CONUS-scale (2.7M-node) preprocessing from tens of seconds into
milliseconds.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

LOG = logging.getLogger(__name__)

_SRC = Path(__file__).resolve().parent.parent / "native" / "topology_kernels.cpp"
_LIB_PATH = _SRC.with_suffix(".so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _LIB_PATH.exists() or \
                _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 str(_SRC), "-o", str(_LIB_PATH)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.wavefront_levels.argtypes = [i32p, ctypes.c_int64, i32p]
        lib.wavefront_levels.restype = ctypes.c_int
        lib.connected_components.argtypes = [i32p, ctypes.c_int64, i32p]
        lib.connected_components.restype = ctypes.c_int
        lib.invert_downstream.argtypes = [i32p, ctypes.c_int64,
                                          ctypes.c_int32, i32p]
        lib.invert_downstream.restype = ctypes.c_int32
        lib.tree_cut_parts.argtypes = [i32p, ctypes.c_int64,
                                       ctypes.c_int64, i32p]
        lib.tree_cut_parts.restype = ctypes.c_int64
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.postorder_forest.argtypes = [i32p, i32p, ctypes.c_int64,
                                         ctypes.c_int32, i64p]
        lib.postorder_forest.restype = ctypes.c_int64
        _lib = lib
    except Exception as e:  # toolchain missing / compile failure
        LOG.info("native topology kernels unavailable (%s); "
                 "using NumPy fallbacks", e)
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def wavefront_levels(downstream: np.ndarray) -> np.ndarray | None:
    """Longest-path levels, or None if the native lib is unavailable.

    Raises ValueError on cycles (same contract as the NumPy path).
    """
    lib = _load()
    if lib is None:
        return None
    ds = np.ascontiguousarray(downstream, np.int32)
    levels = np.zeros(ds.size, np.int32)
    rc = lib.wavefront_levels(ds, ds.size, levels)
    if rc != 0:
        raise ValueError("cycle detected in network")
    return levels


def connected_components(downstream: np.ndarray) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    ds = np.ascontiguousarray(downstream, np.int32)
    labels = np.zeros(ds.size, np.int32)
    lib.connected_components(ds, ds.size, labels)
    return labels


def invert_downstream(downstream: np.ndarray) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    ds = np.ascontiguousarray(downstream, np.int32)
    k = 4
    while True:
        upstream = np.full((ds.size, k), -1, np.int32)
        maxdeg = lib.invert_downstream(ds, ds.size, k, upstream)
        if maxdeg <= k:
            return upstream[:, :max(int(maxdeg), 1)]
        k = int(maxdeg)


def tree_cut_parts(downstream: np.ndarray, cap: int) -> np.ndarray | None:
    """Connected parts of size <= cap by minimal tree-edge cuts, or None
    if the native lib is unavailable.  Raises ValueError on cycles."""
    lib = _load()
    if lib is None:
        return None
    ds = np.ascontiguousarray(downstream, np.int32)
    part = np.zeros(ds.size, np.int32)
    p = lib.tree_cut_parts(ds, ds.size, int(cap), part)
    if p < 0:
        raise ValueError("cycle detected in network")
    return part


def postorder_forest(downstream: np.ndarray,
                     upstream: np.ndarray) -> np.ndarray | None:
    """Post-order DFS row order (children before parents, subtrees
    contiguous; same visit order as the Python fallback), or None if the
    native lib is unavailable.  Raises ValueError on cycles."""
    lib = _load()
    if lib is None:
        return None
    ds = np.ascontiguousarray(downstream, np.int32)
    up = np.ascontiguousarray(upstream, np.int32)
    order = np.zeros(ds.size, np.int64)
    got = lib.postorder_forest(ds, up, ds.size, up.shape[1], order)
    if got != ds.size:
        raise ValueError("drainage graph must be a forest (no cycles)")
    return order
