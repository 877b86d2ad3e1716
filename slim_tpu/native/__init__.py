"""ctypes bindings + build driver for the native C++ runtime (slimrt).

The shared library is built on demand with g++ (no pybind11; plain C ABI).
``available()`` gates all callers so the pure-Python/JAX paths keep working
on machines without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger("slim_tpu")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "slimrt.cpp")
_LIB = os.path.join(_HERE, "libslimrt.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           "-std=c++17", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as e:
        logger.warning("native slimrt build failed: %s", e)
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or \
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            logger.warning("native slimrt load failed: %s", e)
            return None

        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        f64p = ctypes.POINTER(ctypes.c_double)

        lib.slim_cd_learn.restype = ctypes.c_int64
        lib.slim_cd_learn.argtypes = [
            ctypes.c_int32, ctypes.c_int32, i64p, i32p, f32p,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_uint64, ctypes.c_int32,
            ctypes.POINTER(i64p), ctypes.POINTER(i32p), ctypes.POINTER(f32p),
            f64p, f64p]
        lib.slim_gram_dense.restype = None
        lib.slim_gram_dense.argtypes = [
            ctypes.c_int32, ctypes.c_int32, i64p, i32p, f32p,
            f32p, ctypes.c_int64, ctypes.c_int32]
        lib.slim_predict_topn.restype = None
        lib.slim_predict_topn.argtypes = [
            ctypes.c_int32, ctypes.c_int32, i64p, i32p, f32p,
            i64p, i32p, f32p, ctypes.c_int32, i32p, f32p, i32p,
            ctypes.c_int32]
        lib.slim_parse_tokens.restype = ctypes.c_int64
        lib.slim_parse_tokens.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, f64p, ctypes.c_int64,
            i64p, i64p]
        lib.slim_csr_from_blocks.restype = None
        lib.slim_csr_from_blocks.argtypes = [
            ctypes.c_int32, ctypes.POINTER(i32p), ctypes.POINTER(i32p),
            ctypes.POINTER(f32p), i64p, ctypes.c_int32, i64p, i32p, f32p]
        lib.slim_free.restype = None
        lib.slim_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def cd_learn(train, l1r=1.0, l2r=1.0, optTol=1e-7, maxniters=10000,
             shuffle=True, seed=0, nthreads=0):
    """Run the native OpenMP CD solver.  Returns (model CSR, err, obj).

    Semantics match slim_tpu.solvers.cd (same screen, caps, objective);
    used as the measured CPU baseline and as a cross-check oracle.
    """
    from ..types import CSR

    lib = _load()
    if lib is None:
        raise RuntimeError("native slimrt unavailable")
    train = train.infer_ncols()
    csc = train.transpose()

    colptr = np.ascontiguousarray(csc.indptr, dtype=np.int64)
    colind = np.ascontiguousarray(csc.indices, dtype=np.int32)
    colval = None if csc.data is None else \
        np.ascontiguousarray(csc.data, dtype=np.float32)

    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    out_ptr = i64p()
    out_ind = i32p()
    out_val = f32p()
    err = ctypes.c_double()
    obj = ctypes.c_double()

    tnnz = lib.slim_cd_learn(
        np.int32(train.nrows), np.int32(train.ncols),
        colptr.ctypes.data_as(i64p), colind.ctypes.data_as(i32p),
        None if colval is None else colval.ctypes.data_as(f32p),
        l1r, l2r, optTol, np.int32(maxniters), np.int32(int(shuffle)),
        np.uint64(seed), np.int32(nthreads),
        ctypes.byref(out_ptr), ctypes.byref(out_ind), ctypes.byref(out_val),
        ctypes.byref(err), ctypes.byref(obj))
    if tnnz < 0:
        raise RuntimeError("slim_cd_learn failed")

    n = train.ncols
    model_colptr = np.ctypeslib.as_array(out_ptr, shape=(n + 1,)).copy()
    model_colind = np.ctypeslib.as_array(out_ind, shape=(max(tnnz, 1),))[
        :tnnz].copy()
    model_colval = np.ctypeslib.as_array(out_val, shape=(max(tnnz, 1),))[
        :tnnz].copy()
    lib.slim_free(out_ptr)
    lib.slim_free(out_ind)
    lib.slim_free(out_val)

    # CSC of the model -> model CSR (rows=coordinate item, cols=target)
    model_csc = CSR.from_arrays(n, n, model_colptr, model_colind, model_colval)
    model = model_csc.transpose()
    model = CSR.from_arrays(n, n, model.indptr, model.indices, model.data)
    return model, err.value, obj.value


def parse_tokens(raw: bytes):
    """Tokenise a whitespace/newline numeric file with the native parser.

    Returns (tokens float64 array, tokens_per_line int64 array).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native slimrt unavailable")
    import ctypes

    f64p = ctypes.POINTER(ctypes.c_double)
    i64p = ctypes.POINTER(ctypes.c_int64)
    max_tokens = len(raw) // 2 + 2
    out = np.empty(max_tokens, dtype=np.float64)
    breaks = np.empty(raw.count(b"\n") + 2, dtype=np.int64)
    nlines = ctypes.c_int64()
    ntok = lib.slim_parse_tokens(
        raw, np.int64(len(raw)), out.ctypes.data_as(f64p),
        np.int64(max_tokens), breaks.ctypes.data_as(i64p),
        ctypes.byref(nlines))
    breaks = breaks[:nlines.value]
    per_line = np.diff(np.concatenate(([0], breaks)))
    return out[:ntok], per_line


def gram_dense(train, pad_to=None, nthreads=0) -> np.ndarray:
    """Threaded sparse Gram into a dense (pad, pad) f32 array."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native slimrt unavailable")
    train = train.infer_ncols()
    n = train.ncols
    ldg = pad_to if pad_to is not None else n
    assert ldg >= n
    out = np.zeros((ldg, ldg), dtype=np.float32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    rowptr = np.ascontiguousarray(train.indptr, dtype=np.int64)
    rowind = np.ascontiguousarray(train.indices, dtype=np.int32)
    rowval = None if train.data is None else \
        np.ascontiguousarray(train.data, dtype=np.float32)
    lib.slim_gram_dense(
        np.int32(train.nrows), np.int32(n),
        rowptr.ctypes.data_as(i64p), rowind.ctypes.data_as(i32p),
        None if rowval is None else rowval.ctypes.data_as(f32p),
        out.ctypes.data_as(f32p), np.int64(ldg), np.int32(nthreads))
    return out


def predict_topn(model, hist, nrcmds=10, nthreads=0):
    """Threaded CPU top-N prediction (bench baseline; scoring parity with
    slim_tpu.predict.predict_topn and reference predict.c:40-58)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native slimrt unavailable")
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    n = max(model.nrows, model.ncols, hist.ncols)
    nusers = hist.nrows
    wptr = np.ascontiguousarray(model.indptr, dtype=np.int64)
    if model.nrows < n:   # pad the row pointer for items without a row
        wptr = np.concatenate(
            [wptr, np.full(n - model.nrows, wptr[-1], dtype=np.int64)])
    wind = np.ascontiguousarray(model.indices, dtype=np.int32)
    wval = np.ascontiguousarray(model.values(), dtype=np.float32)
    hptr = np.ascontiguousarray(hist.indptr, dtype=np.int64)
    hind = np.ascontiguousarray(hist.indices, dtype=np.int32)
    hval = None if hist.data is None else \
        np.ascontiguousarray(hist.data, dtype=np.float32)
    ids = np.empty((nusers, nrcmds), dtype=np.int32)
    scores = np.empty((nusers, nrcmds), dtype=np.float32)
    counts = np.empty(nusers, dtype=np.int32)
    lib.slim_predict_topn(
        np.int32(nusers), np.int32(n),
        wptr.ctypes.data_as(i64p), wind.ctypes.data_as(i32p),
        wval.ctypes.data_as(f32p), hptr.ctypes.data_as(i64p),
        hind.ctypes.data_as(i32p),
        None if hval is None else hval.ctypes.data_as(f32p),
        np.int32(nrcmds), ids.ctypes.data_as(i32p),
        scores.ctypes.data_as(f32p), counts.ctypes.data_as(i32p),
        np.int32(nthreads))
    return ids, scores, counts


def csr_from_blocks(rows_list, cols_list, vals_list, nrows):
    """Threaded CSR assembly from COO fragments (no duplicate (row, col)
    pairs -- the model-harvest contract).  Returns (indptr int64,
    indices int32, data float32) with per-row sorted columns, or None when
    the native library is unavailable (caller falls back to
    CSR.from_ijv over concatenated fragments)."""
    lib = _load()
    if lib is None:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)

    rows = [np.ascontiguousarray(r, dtype=np.int32) for r in rows_list]
    cols = [np.ascontiguousarray(c, dtype=np.int32) for c in cols_list]
    vals = [np.ascontiguousarray(v, dtype=np.float32) for v in vals_list]
    nfrag = len(rows)
    sizes = np.array([r.size for r in rows], dtype=np.int64)
    total = int(sizes.sum())
    indptr = np.empty(nrows + 1, dtype=np.int64)
    indices = np.empty(total, dtype=np.int32)
    data = np.empty(total, dtype=np.float32)
    if nfrag == 0 or total == 0:
        indptr[:] = 0
        return indptr, indices, data
    rp = (i32p * nfrag)(*[r.ctypes.data_as(i32p) for r in rows])
    cp = (i32p * nfrag)(*[c.ctypes.data_as(i32p) for c in cols])
    vp = (f32p * nfrag)(*[v.ctypes.data_as(f32p) for v in vals])
    lib.slim_csr_from_blocks(
        np.int32(nfrag), rp, cp, vp, sizes.ctypes.data_as(i64p),
        np.int32(nrows), indptr.ctypes.data_as(i64p),
        indices.ctypes.data_as(i32p), data.ctypes.data_as(f32p))
    return indptr, indices, data
