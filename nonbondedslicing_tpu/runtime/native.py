"""ctypes bridge to the native C++ host runtime (native/nbs_native.cpp).

Builds the shared library with g++ on first use (cached beside the package);
every entry point has a pure-Python fallback so the package works without a
toolchain.  The TPU compute path never goes through here — this covers the
host-side work the reference does in C++ (neighbor-list oracle, dispersion
class sums, FFT sizing; see the .cpp header for reference citations).
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native", "nbs_native.cpp")
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_nbs_native.so")


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or (os.path.exists(_SRC)
                        and os.path.getmtime(_SRC) > os.path.getmtime(_SO))):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.nbs_find_legal_dimension.restype = ctypes.c_int
            lib.nbs_find_legal_dimension.argtypes = [ctypes.c_int, ctypes.c_int]
            lib.nbs_dispersion_corrections.restype = None
            lib.nbs_dispersion_corrections.argtypes = [
                ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
                ctypes.POINTER(ctypes.c_double)]
            lib.nbs_neighbor_pairs.restype = ctypes.c_int64
            lib.nbs_neighbor_pairs.argtypes = [
                ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double), ctypes.c_double, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
            lib.nbs_max_cell_occupancy.restype = ctypes.c_int32
            lib.nbs_max_cell_occupancy.argtypes = [
                ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
                ctypes.c_int]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def find_legal_dimension(minimum, max_factor=7):
    lib = get_lib()
    if lib is not None:
        return lib.nbs_find_legal_dimension(int(minimum), int(max_factor))
    from ..utils.ewald_params import find_legal_dimension as py_fallback
    return py_fallback(minimum, max_factor)


def dispersion_corrections(sigma, epsilon, subset, num_subsets, use_switch,
                           cutoff, switch_dist):
    """Per-slice dispersion coefficients; None if native lib unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    sigma = np.ascontiguousarray(sigma, dtype=np.float64)
    epsilon = np.ascontiguousarray(epsilon, dtype=np.float64)
    subset = np.ascontiguousarray(subset, dtype=np.int32)
    num_slices = num_subsets * (num_subsets + 1) // 2
    out = np.zeros(num_slices)
    lib.nbs_dispersion_corrections(
        len(sigma), _dptr(sigma), _dptr(epsilon),
        subset.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        int(num_subsets), int(bool(use_switch)), float(cutoff),
        float(switch_dist), _dptr(out))
    return out


def neighbor_pairs(positions, box, cutoff, periodic=True):
    """Voxel-hash neighbor list -> (M, 2) int64 array of i<j pairs within
    cutoff, or None if native lib unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    positions = np.ascontiguousarray(positions, dtype=np.float64)
    box = np.ascontiguousarray(box, dtype=np.float64)
    n = len(positions)
    cap = max(1024, n * 128)
    while True:
        out = np.empty((cap, 2), dtype=np.int64)
        m = lib.nbs_neighbor_pairs(
            n, _dptr(positions), _dptr(box), float(cutoff),
            int(bool(periodic)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), cap)
        if m <= cap:
            return out[:m].copy()
        cap = m


def max_cell_occupancy(positions, box, counts):
    lib = get_lib()
    positions = np.ascontiguousarray(positions, dtype=np.float64)
    box = np.ascontiguousarray(box, dtype=np.float64)
    if lib is not None:
        return int(lib.nbs_max_cell_occupancy(
            len(positions), _dptr(positions), _dptr(box),
            int(counts[0]), int(counts[1]), int(counts[2])))
    # numpy fallback
    frac = positions @ np.linalg.inv(box).T
    frac -= np.floor(frac)
    ci = np.minimum((frac * counts).astype(int), np.asarray(counts) - 1)
    cell = (ci[:, 0] * counts[1] + ci[:, 1]) * counts[2] + ci[:, 2]
    return int(np.bincount(cell).max())
