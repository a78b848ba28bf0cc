"""ctypes bindings for the mppnative C++ runtime layer.

Builds ``mppnative.cpp`` with g++ on first import (cached next to the
source; rebuilt when the source is newer) and exposes:

* :func:`csr_template_native` — CSR sparsity discovery (MATPREALLOCATOR
  analog, SURVEY.md §2.0).
* :func:`structured_connections_native` — structured-mesh internal
  connection generation (``util/mpp_mesh_utils.F90``).
* :func:`petsc_vec_read_native` / :func:`petsc_vec_write_native` — PETSc
  binary Vec codec (PetscViewer analog).

All consumers keep a pure-Python fallback; ``available()`` reports whether
the native library loaded.  Nothing here is on the XLA compute path — this
is the host-side setup/IO runtime.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "mppnative.cpp")
_SO = os.path.join(_HERE, "libmppnative.so")

_lib = None
_err = None


def _build() -> None:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    # build into a temp file then rename, so a concurrent import never
    # dlopens a half-written .so
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_HERE)
    os.close(fd)
    try:
        cmd[-1] = tmp
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _load():
    global _lib, _err
    if _lib is not None or _err is not None:
        return _lib
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)

        i64 = ctypes.c_int64
        i32 = ctypes.c_int32
        p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        p_f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")

        lib.mpp_csr_template.restype = ctypes.c_int
        lib.mpp_csr_template.argtypes = [
            i64, i64, i64, p_i64, p_i64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(i64)]

        lib.mpp_structured_connections.restype = i64
        lib.mpp_structured_connections.argtypes = [
            i64, i64, i64, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            i32, p_i64, p_i64, p_f64, p_f64, p_f64]

        lib.mpp_petsc_vec_read.restype = ctypes.c_int
        lib.mpp_petsc_vec_read.argtypes = [
            ctypes.c_char_p, i64, ctypes.c_void_p, ctypes.POINTER(i64),
            ctypes.POINTER(i64)]

        lib.mpp_petsc_vec_write.restype = ctypes.c_int
        lib.mpp_petsc_vec_write.argtypes = [
            ctypes.c_char_p, p_f64, i64, i32]

        _lib = lib
    except Exception as e:  # compiler missing, load failure, ...
        _err = e
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def csr_template_native(n_rows: int, n_cols: int, coo_rows, coo_cols):
    """Return (indptr i32[n_rows+1], indices i32[nnz], slots i32[ncoo]).

    Matches the np.unique-based contract of ops/sparse.csr_template.
    Returns None if the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    rows = np.ascontiguousarray(coo_rows, np.int64)
    cols = np.ascontiguousarray(coo_cols, np.int64)
    ncoo = rows.shape[0]
    nnz = ctypes.c_int64(0)
    rc = lib.mpp_csr_template(n_rows, n_cols, ncoo, rows, cols,
                              None, None, None, ctypes.byref(nnz))
    if rc != 0:
        raise ValueError("mpp_csr_template: coordinate out of range")
    indptr = np.zeros(n_rows + 1, np.int32)
    indices = np.zeros(nnz.value, np.int32)
    slots = np.zeros(ncoo, np.int32)
    rc = lib.mpp_csr_template(
        n_rows, n_cols, ncoo, rows, cols,
        indptr.ctypes.data_as(ctypes.c_void_p),
        indices.ctypes.data_as(ctypes.c_void_p),
        slots.ctypes.data_as(ctypes.c_void_p), ctypes.byref(nnz))
    if rc != 0:
        raise ValueError("mpp_csr_template: coordinate out of range")
    return indptr, indices, slots


def structured_connections_native(nx, ny, nz, dx, dy, dz, idir):
    """Return (id_up, id_dn, dist_up, dist_dn, area) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    if idir == 1:
        nconn = max(nx - 1, 0) * ny * nz
    elif idir == 2:
        nconn = nx * max(ny - 1, 0) * nz
    elif idir == 3:
        nconn = nx * ny * max(nz - 1, 0)
    else:
        raise ValueError(f"bad idir {idir}")
    id_up = np.zeros(nconn, np.int64)
    id_dn = np.zeros(nconn, np.int64)
    dist_up = np.zeros(nconn, np.float64)
    dist_dn = np.zeros(nconn, np.float64)
    area = np.zeros(nconn, np.float64)
    n = lib.mpp_structured_connections(nx, ny, nz, dx, dy, dz, idir,
                                       id_up, id_dn, dist_up, dist_dn, area)
    if n != nconn:
        raise RuntimeError(f"mpp_structured_connections: {n} != {nconn}")
    return id_up, id_dn, dist_up, dist_dn, area


def petsc_vec_read_native(path: str, offset: int = 0):
    """Read one Vec at byte offset -> (data f64[n], next_offset) or None."""
    lib = _load()
    if lib is None:
        return None
    n = ctypes.c_int64(0)
    nxt = ctypes.c_int64(0)
    rc = lib.mpp_petsc_vec_read(path.encode(), offset, None,
                                ctypes.byref(n), ctypes.byref(nxt))
    if rc != 0:
        raise IOError(f"mpp_petsc_vec_read({path!r}@{offset}) rc={rc}")
    data = np.zeros(n.value, np.float64)
    rc = lib.mpp_petsc_vec_read(path.encode(), offset,
                                data.ctypes.data_as(ctypes.c_void_p),
                                ctypes.byref(n), ctypes.byref(nxt))
    if rc != 0:
        raise IOError(f"mpp_petsc_vec_read({path!r}@{offset}) rc={rc}")
    return data, nxt.value


def petsc_vec_write_native(path: str, data, append: bool = False) -> bool:
    lib = _load()
    if lib is None:
        return False
    arr = np.ascontiguousarray(data, np.float64)
    rc = lib.mpp_petsc_vec_write(path.encode(), arr, arr.shape[0],
                                 1 if append else 0)
    if rc != 0:
        raise IOError(f"mpp_petsc_vec_write({path!r}) rc={rc}")
    return True
