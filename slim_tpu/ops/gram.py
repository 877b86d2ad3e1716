"""Gram matrix (G = AᵀA) computation.

The single most important algorithmic transform of the TPU rebuild
(SURVEY.md §7): the reference recomputes ``ATy = AᵀA[:,j]`` per item column
inside an O(ncols·nnz) scalar loop (src/libslim/estimate.c:411-421) and
sparse inner products inside every CD step (src/libslim/cd.c:123).  We
compute G once -- on the MXU as tiled dense matmuls, or on the host with a
sparse SpGEMM -- after which both the active-set screen and every CD sweep
become pure vector math against G.

G is symmetric (ncols × ncols), f32.  ``G[i,j] = aᵢᵀaⱼ``; ``diag(G) =
cnorms²`` (the reference's ``aTa*aTa``, cd.c:119-127).
"""

from __future__ import annotations

import math
import os

import numpy as np

from ..types import CSR


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def gram_host(mat: CSR, pad_to: int | None = None) -> np.ndarray:
    """Sparse Gram on the host (C-speed, exploits sparsity).

    Cost is Σᵤ nnzᵤ² -- orders of magnitude below the dense-matmul FLOP
    count when the matrix is very sparse, so this wins for huge sparse
    inputs where even the MXU would grind through mostly-zero tiles.
    Uses the native OpenMP kernel (writes straight into the padded
    buffer, no intermediate copies); scipy SpGEMM as fallback.
    """
    n = pad_to if pad_to is not None else mat.ncols
    try:
        from .. import native

        if native.available():
            return native.gram_dense(mat, pad_to=n)
    except Exception:
        pass
    sp = mat.to_scipy()
    g = (sp.T @ sp).toarray().astype(np.float32)
    if n != mat.ncols:
        out = np.zeros((n, n), dtype=np.float32)
        out[:mat.ncols, :mat.ncols] = g
        return out
    return g


_gram_acc = None


def _get_gram_acc():
    """Module-level jitted accumulator (defining it per call would
    recompile on every learn)."""
    global _gram_acc
    if _gram_acc is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def acc(g, blk):
            return g + jnp.dot(blk.T, blk, preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)

        _gram_acc = acc
    return _gram_acc


def gram_device(mat: CSR, pad_to: int | None = None, row_block: int = 8192):
    """Dense tiled Gram on the device: G = Σ_r A_rᵀ A_r over row blocks.

    Each row block is densified host-side (bounded memory) and accumulated
    on the MXU with f32 accumulation (precision=HIGHEST so implicit 0/1
    data gives exact integer counts).  Returns a device array.
    """
    import jax.numpy as jnp

    n = pad_to if pad_to is not None else mat.ncols
    n = _round_up(max(n, 1), 128)

    acc = _get_gram_acc()
    g = jnp.zeros((n, n), dtype=jnp.float32)
    vals = mat.values()
    for r0 in range(0, mat.nrows, row_block):
        r1 = min(r0 + row_block, mat.nrows)
        blk = np.zeros((row_block, n), dtype=np.float32)
        s, e = int(mat.indptr[r0]), int(mat.indptr[r1])
        rows = np.repeat(np.arange(r0, r1), np.diff(mat.indptr[r0:r1 + 1]).astype(np.int64))
        blk[rows - r0, mat.indices[s:e]] = vals[s:e]
        g = acc(g, jnp.asarray(blk))
    return g


_gram_sparse_fns: dict = {}


def _get_gram_sparse(rb: int, npad: int):
    """Jitted sparse-to-Gram kernel, cached per (rb, npad).

    Each scan step scatter-densifies ONE row block from its pre-bucketed
    (local_row, col, val) triplets -- padding entries carry local_row=rb,
    which is out of bounds and dropped (mode='drop'), so the in-bounds
    indices stay unique and the scatter takes the fast path -- then
    accumulates G += blkᵀ·blk on the MXU with exact f32.
    """
    key = (rb, npad)
    fn = _gram_sparse_fns.get(key)
    if fn is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def gram_sparse(lr, cols, vals):
            def body(g, xs):
                l, c, v = xs
                blk = jnp.zeros((rb, npad), jnp.float32)
                blk = blk.at[l, c].add(v, unique_indices=True, mode="drop")
                return g + jnp.dot(
                    blk.T, blk, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST), None

            g0 = jnp.zeros((npad, npad), jnp.float32)
            g, _ = jax.lax.scan(body, g0, (lr, cols, vals))
            return g

        fn = _gram_sparse_fns[key] = gram_sparse
    return fn


def gram_device_sparse(mat: CSR, pad_to: int | None = None,
                       row_block: int = 8192):
    """Device Gram that transfers only the sparse triplets (~12·nnz bytes
    instead of n²·4 for the host path or nrows·n·4 for dense row blocks) --
    the winning path when host↔device bandwidth is the bottleneck (this
    machine's TPU tunnel moves ~100-200 MB/s).

    Triplets are bucketed per row block host-side (CSR is already
    row-sorted, so this is a reshape, not a sort): scatter work per scan
    step is O(block nnz), not O(total nnz).
    """
    import jax.numpy as jnp

    n = pad_to if pad_to is not None else mat.ncols
    n = _round_up(max(n, 1), 128)
    nrb = max((mat.nrows + row_block - 1) // row_block, 1)
    starts = mat.indptr[np.minimum(
        np.arange(nrb + 1, dtype=np.int64) * row_block,
        mat.nrows)].astype(np.int64)
    bnnz = np.diff(starts)
    P = 1
    while P < max(int(bnnz.max()) if nrb else 1, 1):
        P *= 2
    lr = np.full((nrb, P), row_block, dtype=np.int32)   # OOB => dropped
    cc = np.zeros((nrb, P), dtype=np.int32)
    vv = np.zeros((nrb, P), dtype=np.float32)
    rows = np.repeat(np.arange(mat.nrows, dtype=np.int64),
                     np.diff(mat.indptr).astype(np.int64))
    vals = mat.values()
    for k in range(nrb):
        s, e = starts[k], starts[k + 1]
        lr[k, :e - s] = (rows[s:e] - k * row_block).astype(np.int32)
        cc[k, :e - s] = mat.indices[s:e]
        vv[k, :e - s] = vals[s:e]
    fn = _get_gram_sparse(row_block, n)
    return fn(jnp.asarray(lr), jnp.asarray(cc), jnp.asarray(vv))


_gram_csr_fns: dict = {}


def _get_gram_csr(rb: int, npad: int, P: int, nrb: int, ones: bool,
                  nnz: int, nrows: int, bf16_exact: bool = False):
    """Jitted CSR-to-Gram kernel: ships only the CSR column indices
    (uint16 when the catalogue fits, i.e. 2 bytes/nnz) and expands the
    per-row-block padded triplets ON DEVICE by gather + searchsorted --
    the 12-byte/nnz padded host triplets of the older path cost 10x the
    tunnel bytes.  Values are implicit 1.0 for binary matrices (``ones``)
    and shipped f32 otherwise.

    ``bf16_exact``: every value round-trips through bf16 exactly (always
    true for binary data; true for integer ratings <= 256, the common
    case).  Then a single-pass bf16 MXU matmul (DEFAULT precision) is
    numerically identical to HIGHEST -- products of exact-bf16 inputs are
    exact in the f32 accumulator -- at ~6x the MXU rate (HIGHEST runs 6
    bf16 passes per f32 matmul on TPU)."""
    key = (rb, npad, P, nrb, ones, nnz, nrows, bf16_exact)
    fn = _gram_csr_fns.get(key)
    if fn is None:
        import jax
        import jax.numpy as jnp

        prec = (jax.lax.Precision.DEFAULT if bf16_exact
                else jax.lax.Precision.HIGHEST)

        @jax.jit
        def gram_csr(idx, val, starts, indptr):
            def body(g, k):
                s = starts[k]
                e = s + jnp.arange(P, dtype=jnp.int32)
                valid = e < starts[k + 1]
                esafe = jnp.minimum(e, nnz - 1)
                c = jnp.take(idx, esafe).astype(jnp.int32)
                r = jnp.searchsorted(indptr, esafe, side="right") \
                    .astype(jnp.int32) - 1
                l = jnp.where(valid, r - k * rb, rb)   # OOB pad -> dropped
                if ones:
                    v = valid.astype(jnp.float32)
                else:
                    v = jnp.where(valid, jnp.take(val, esafe), 0.0)
                blk = jnp.zeros((rb, npad), jnp.float32)
                blk = blk.at[l, c].add(v, unique_indices=True, mode="drop")
                if bf16_exact:
                    blk = blk.astype(jnp.bfloat16)
                return g + jnp.dot(
                    blk.T, blk, preferred_element_type=jnp.float32,
                    precision=prec), None

            g0 = jnp.zeros((npad, npad), jnp.float32)
            g, _ = jax.lax.scan(body, g0, jnp.arange(nrb, dtype=jnp.int32))
            return g

        fn = _gram_csr_fns[key] = gram_csr
    return fn


def _values_bf16_exact(vals: np.ndarray) -> bool:
    """True when every value survives an f32->bf16->f32 round trip, so a
    single bf16 MXU pass reproduces the HIGHEST-precision Gram exactly."""
    if vals.size == 0:
        return True
    try:
        import ml_dtypes

        rt = vals.astype(ml_dtypes.bfloat16).astype(np.float32)
    except ImportError:
        # bf16 = f32 with the bottom 16 mantissa bits dropped
        rt = (vals.view(np.uint32) & np.uint32(0xFFFF0000)).view(np.float32)
    return bool(np.array_equal(rt, vals))


def gram_device_csr(mat: CSR, pad_to: int | None = None,
                    row_block: int = 8192):
    """Device Gram shipping ~2 bytes/nnz (binary) or ~6 bytes/nnz: CSR
    column indices (+ values when non-binary) upload once; row ids and the
    per-row-block bucketing are reconstructed on device."""
    import jax
    import jax.numpy as jnp

    n = pad_to if pad_to is not None else mat.ncols
    n = _round_up(max(n, 1), 128)
    nrb = max((mat.nrows + row_block - 1) // row_block, 1)
    starts = mat.indptr[np.minimum(
        np.arange(nrb + 1, dtype=np.int64) * row_block,
        mat.nrows)].astype(np.int32)
    bnnz = np.diff(starts)
    P = 1
    while P < max(int(bnnz.max()) if nrb else 1, 1):
        P *= 2
    vals = mat.values()
    ones = bool(vals.size == 0 or
                (vals[0] == 1.0 and np.all(vals == 1.0)))
    idt = np.uint16 if n <= 65536 else np.int32
    idx_d = mat.dev_put(("idx", idt.__name__),
                        lambda: jnp.asarray(mat.indices.astype(idt)))
    val_d = jnp.zeros((1,), jnp.float32) if ones \
        else mat.dev_put("val32",
                         lambda: jnp.asarray(vals.astype(np.float32)))
    fn = _get_gram_csr(row_block, n, P, nrb, ones, max(int(mat.nnz), 1),
                       mat.nrows,
                       bf16_exact=ones or _values_bf16_exact(vals))
    return fn(idx_d, val_d, jnp.asarray(starts),
              mat.dev_put("gram_indptr32",
                          lambda: jnp.asarray(mat.indptr.astype(np.int32))))


_gram_pallas_fns: dict = {}


def _get_gram_pallas(W: int, Rb: int, nblk: int, npad: int, ones: bool,
                     bf16_exact: bool, interpret: bool = False):
    """Jitted Gram accumulator over ``nblk`` row blocks of Rb nnz-sorted
    rows: device gather of the (W, Rb) transposed id layout from the CSR
    indices, Pallas densify (no scatter), MXU contraction.

    Binary matrices contract in int8 -> int32 (hardware A/B at
    (28672, 8192): 66.3 ms vs the single-pass bf16 contraction's 99.0,
    bit-equal counts); ``SLIM_GRAM_INT8=0`` reverts."""
    use_i8 = ones and os.environ.get("SLIM_GRAM_INT8", "1") != "0"
    key = (W, Rb, nblk, npad, ones, bf16_exact, use_i8, interpret)
    fn = _gram_pallas_fns.get(key)
    if fn is None:
        import functools

        import jax
        import jax.numpy as jnp

        from .pallas_gram import gathered_densifyT

        out_dt = (jnp.int8 if use_i8
                  else jnp.bfloat16 if bf16_exact else jnp.float32)
        prec = (jax.lax.Precision.DEFAULT if bf16_exact
                else jax.lax.Precision.HIGHEST)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def gram_pallas(G, idx, val, rowstart, rowlen):
            acc_dt = jnp.int32 if use_i8 else jnp.float32

            def body(g, xs):
                rs, rl = xs                         # (Rb,) int32 each
                blkT = gathered_densifyT(idx, val, rs, rl, W, npad, ones,
                                         out_dt, interpret=interpret)
                if use_i8:
                    d = jax.lax.dot_general(
                        blkT, blkT, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)
                else:
                    d = jnp.dot(blkT, blkT.T,
                                preferred_element_type=jnp.float32,
                                precision=prec)
                return g + d, None

            g0 = jnp.zeros((npad, npad), acc_dt) if use_i8 else G
            g, _ = jax.lax.scan(body, g0, (rowstart, rowlen))
            return G + g.astype(jnp.float32) if use_i8 else g

        fn = _gram_pallas_fns[key] = gram_pallas
    return fn


def _pallas_row_block(w: int) -> int:
    """Rows per block for entry width ``w``: bound the gathered (W, Rb)
    id buffer to ~32MB while keeping the MXU contraction batched."""
    for rb in (8192, 4096, 2048, 1024, 512, 256):
        if w * rb <= (1 << 23):
            return rb
    return 256


W_CAP = 4096  # rows with more entries go through the scatter path


def gram_device_pallas(mat: CSR, pad_to: int | None = None,
                       interpret: bool = False):
    """Device Gram with Pallas densification (see ops/pallas_gram.py).

    Rows are processed in nnz-sorted order (G = AᵀA is invariant to row
    permutation), in blocks whose entry width W is the pow2 ceiling of
    the block's max row nnz -- so the kernel's per-row-tile entry loop is
    tight.  Ships the same ~2-6 bytes/nnz as :func:`gram_device_csr`
    (indices + per-block row offsets); rows longer than W_CAP (rare
    power users) fall back to the scatter path as a residual sub-matrix.
    """
    import jax.numpy as jnp

    from .pallas_gram import RT, densify_supported

    n = pad_to if pad_to is not None else mat.ncols
    n = _round_up(max(n, 1), 128)
    if mat.nnz == 0:
        return jnp.zeros((n, n), jnp.float32)

    row_nnz = np.diff(mat.indptr).astype(np.int64)
    order = np.argsort(-row_nnz, kind="stable")
    snnz = row_nnz[order]
    nlong = int(np.searchsorted(-snnz, -W_CAP - 1, side="right"))

    vals = mat.values()
    ones = bool(vals.size == 0 or (vals[0] == 1.0 and np.all(vals == 1.0)))
    bf16_exact = ones or _values_bf16_exact(vals)

    # (W, Rb)-grouped blocks over the nnz-sorted main rows
    groups: dict = {}
    cur = nlong
    nrows = mat.nrows
    while cur < nrows:
        w = max(32, 1 << int(snnz[cur] - 1).bit_length()) if snnz[cur] \
            else 32
        if not densify_supported(w, RT, n):
            # shape outside the kernel domain: let the caller's fallback
            # route the whole matrix through the scatter path
            raise NotImplementedError(f"densify unsupported for W={w}, "
                                      f"npad={n}")
        rb = _pallas_row_block(w)
        take = min(rb, nrows - cur)
        rows = order[cur:cur + take]
        rs = np.zeros(rb, np.int32)
        rl = np.zeros(rb, np.int32)
        rs[:take] = mat.indptr[rows].astype(np.int32)
        rl[:take] = row_nnz[rows].astype(np.int32)
        groups.setdefault((w, rb), ([], []))
        groups[(w, rb)][0].append(rs)
        groups[(w, rb)][1].append(rl)
        cur += take

    idt = np.uint16 if n <= 65536 else np.int32
    idx_d = mat.dev_put(("idx", idt.__name__),
                        lambda: jnp.asarray(mat.indices.astype(idt)))
    val_d = jnp.zeros((1,), jnp.float32) if ones \
        else mat.dev_put("val32",
                         lambda: jnp.asarray(vals.astype(np.float32)))
    G = jnp.zeros((n, n), jnp.float32)
    for (w, rb), (rss, rls) in groups.items():
        fn = _get_gram_pallas(w, rb, len(rss), n, ones, bf16_exact,
                              interpret=interpret)
        args = (G, idx_d, val_d, jnp.asarray(np.stack(rss)),
                jnp.asarray(np.stack(rls)))
        if interpret:
            G = fn(*args)
        else:
            # persistent-executable cache (Mosaic recompiles per process;
            # skewed datasets hit several W buckets).  W/ones/bf16 are
            # baked into the closure, not the arg shapes, so they must
            # key through the entry name.
            from . import exec_cache

            G = exec_cache.call(
                fn, f"gram_pallas_w{w}_o{int(ones)}_b{int(bf16_exact)}",
                args, {})

    if nlong:
        # residual: the few very long rows via the scatter path
        long_rows = order[:nlong]
        ptr = np.zeros(nlong + 1, dtype=mat.indptr.dtype)
        ptr[1:] = np.cumsum(row_nnz[long_rows])
        ridx = np.concatenate([
            mat.indices[mat.indptr[r]:mat.indptr[r + 1]] for r in long_rows])
        rval = np.zeros(0, np.float32) if vals.size == 0 else np.concatenate(
            [vals[mat.indptr[r]:mat.indptr[r + 1]] for r in long_rows])
        sub = CSR.from_arrays(nlong, mat.ncols, ptr, ridx, rval)
        G = G + gram_device_csr(sub, pad_to=n)
    return G


def compute_gram(mat: CSR, mode: str = "auto", pad_to: int | None = None):
    """Compute G, returning a device array padded to ``pad_to`` (multiple of
    128 recommended).

    mode='auto' minimises an explicit cost model: host SpGEMM pays the
    sparse ops plus an n²·4-byte G transfer; the device sparse path pays
    the dense matmul FLOPs (mostly-zero tiles) plus a ~12·nnz-byte triplet
    transfer and a scatter.  On tunnelled setups the transfer term
    dominates and the device path wins even for very sparse matrices.
    """
    import jax.numpy as jnp

    n = pad_to if pad_to is not None else mat.ncols
    if mode == "host":
        return jnp.asarray(gram_host(mat, pad_to=n))
    if mode == "device":
        return _gram_device_dispatch(mat, n)
    if mode != "auto":
        raise ValueError(f"unknown gram mode {mode!r}")

    dense_flops = 2.0 * mat.nrows * float(n) * float(n)
    nnz_per_row = mat.row_nnz().astype(np.float64)
    sparse_ops = float(np.sum(nnz_per_row ** 2))
    # constants measured on this class of setup (tunnelled v5e, 4-core
    # host): tunnel ~30-50MB/s, device f32-HIGHEST matmul ~2e13 flop/s,
    # host SpGEMM ~4e7 op/s.  The device path ships ~2-6 bytes/nnz (CSR
    # indices, on-device expansion); the host path ships the n² G.
    bw = 50e6
    t_host = sparse_ops / 4e7 + float(n) * n * 4 / bw
    t_dev = (dense_flops / 2e13 + mat.nnz * 6.0 / bw
             + mat.nnz / 2e8)                       # scatter term
    # device path requires G (npad² f32) to fit HBM alongside the solver
    # workspace; above that the host SpGEMM + upload is the only option
    dense_g_ok = float(n) * n * 4 < 8e9
    if not dense_g_ok or t_host < t_dev:
        return jnp.asarray(gram_host(mat, pad_to=n))
    return _gram_device_dispatch(mat, n)


def _gram_device_dispatch(mat: CSR, n: int):
    """Device Gram: the Pallas densify path on TPU (hardware-measured
    5.75 s of XLA scatter per ML-20M Gram eliminated), the XLA scatter
    path elsewhere or when the kernel rejects the shape.
    ``SLIM_GRAM_DENSIFY=scatter`` forces the old path for A/Bs."""
    import logging
    import os

    import jax

    on_tpu = jax.devices()[0].platform not in ("cpu", "gpu")
    if on_tpu and os.environ.get("SLIM_GRAM_DENSIFY", "pallas") != "scatter":
        try:
            return gram_device_pallas(mat, pad_to=n)
        except NotImplementedError:
            pass  # shape outside the kernel domain: scatter handles it
        except Exception as e:
            logging.getLogger("slim_tpu").warning(
                "pallas Gram densify unavailable (%s); falling back to "
                "the scatter path", str(e).splitlines()[0][:120])
    return gram_device_csr(mat, pad_to=n)
