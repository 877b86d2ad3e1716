"""Coordinate-descent model estimation (the default SLIM solver).

TPU-native driver replacing src/libslim/estimate.c:328-558: instead of one
OpenMP thread per item column, item columns are processed in fixed-size
blocks; each block is solved by the batched CD kernel against the shared
Gram matrix.  Columns are ordered by training nnz so blocks carry columns
with similar sweep caps (the TPU analogue of ``schedule(dynamic,32)`` load
balancing, estimate.c:402).

Covers: active-set screening (estimate.c:411-421), FSLIM neighbour
restriction (estimate.c:424-431 / neighbors.c), warm starting
(estimate.c:453-471), the adaptive per-column iteration cap
(estimate.c:448-449), residual/objective accounting (estimate.c:477-489),
and model assembly with the |x| > 1e-7 threshold (estimate.c:492-505,
EPSILON in def.h:14).
"""

from __future__ import annotations

import logging

import numpy as np

from ..config import SlimConfig, SLIM_DBG_INFO, SLIM_DBG_PROGRESS, dbg
from ..ops.cd_kernel import cd_solve_block_ids
from ..ops.gram import compute_gram
from ..types import CSR

logger = logging.getLogger("slim_tpu")

EPSILON = 1e-7  # model nonzero threshold (reference def.h:14)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def estimate_model_cd(train: CSR, cfg: SlimConfig, imodel: CSR | None = None,
                      gram=None):
    """Estimate the SLIM/FSLIM model with batched coordinate descent.

    Returns ``(model, stats)`` where model is a CSR with rows = rated item,
    cols = target item (same orientation as the reference model,
    estimate.c:570-593) and stats carries loss/objective/nnz totals
    (printed by the reference at estimate.c:552-555).
    """
    import jax.numpy as jnp

    n = train.ncols
    npad = _round_up(n + 1, 128)
    B = int(cfg.block_size)

    g_dev = gram if gram is not None else compute_gram(train, cfg.gram, pad_to=npad)

    csc = train.transpose()
    nnz_col = csc.row_nnz().astype(np.int64)
    col_caps = np.minimum(50 * nnz_col, cfg.maxniters).astype(np.int32)

    # order columns by nnz desc => blocks have homogeneous sweep caps
    order = np.argsort(-nnz_col, kind="stable").astype(np.int32)

    # warm start source: dense columns of imodel (estimate.c:453-464).
    # FSLIM ignores the warm start (the active-flag handshake in
    # estimate.c:455-463 only engages for the screening path).
    use_warm = imodel is not None and cfg.mtype in ("slim", "oslim")
    imodel_csc = imodel.transpose() if use_warm else None

    fslim_nnbrs = cfg.nnbrs if cfg.mtype in ("fslim", "ofslim") else 0

    nblocks = (n + B - 1) // B
    out_cols = [None] * n
    total_err = 0.0
    total_obj = 0.0
    total_niters = 0

    zeros_x0 = None if use_warm else jnp.zeros((B, npad), dtype=jnp.float32)

    for blk in range(nblocks):
        J = order[blk * B:(blk + 1) * B]
        Jpad = np.full(B, npad - 1, dtype=np.int32)  # pad -> zero column
        Jpad[:len(J)] = J
        caps = np.zeros(B, dtype=np.int32)
        caps[:len(J)] = col_caps[J]

        if use_warm:
            x0_host = np.zeros((B, npad), dtype=np.float32)
            for b, j in enumerate(J):
                s, e = int(imodel_csc.indptr[j]), int(imodel_csc.indptr[j + 1])
                x0_host[b, imodel_csc.indices[s:e]] = imodel_csc.values()[s:e]
            x0 = jnp.asarray(x0_host)
        else:
            x0 = zeros_x0

        x, niters, rstatus, rnorm, obj = cd_solve_block_ids(
            g_dev, jnp.asarray(Jpad), jnp.asarray(caps), x0, n,
            float(cfg.l1r), float(cfg.l2r), float(cfg.optTol),
            int(cfg.seed) + blk, shuffle=cfg.shuffle,
            fslim_nnbrs=int(fslim_nnbrs), simtype=cfg.simtype)

        x_host = np.asarray(x[:len(J), :n])
        rnorm_h = np.asarray(rnorm[:len(J)], dtype=np.float64)
        obj_h = np.asarray(obj[:len(J)], dtype=np.float64)
        niters_h = np.asarray(niters[:len(J)])
        total_err += float(rnorm_h.sum())
        total_obj += float(obj_h.sum())
        total_niters += int(niters_h.sum())

        for b, j in enumerate(J):
            xb = x_host[b]
            nz = np.nonzero(np.abs(xb) > EPSILON)[0]
            out_cols[j] = (nz.astype(np.int32), xb[nz].astype(np.float32))
            if dbg(cfg, SLIM_DBG_PROGRESS):
                logger.info(
                    "Col: %5d %5d rs: %d nits: %4d nnz: %4d rsd: %.2e obj: %.2e",
                    j, int(nnz_col[j]), int(rstatus[b]), int(niters_h[b]),
                    len(nz), rnorm_h[b], obj_h[b])

    # assemble: columnwise lists -> CSR model with row index
    # (SaveModel, estimate.c:570-593)
    coord_ids = []
    target_ids = []
    vals = []
    for j in range(n):
        nz, xv = out_cols[j]
        coord_ids.append(nz)
        target_ids.append(np.full(len(nz), j, dtype=np.int32))
        vals.append(xv)
    coord_ids = np.concatenate(coord_ids) if coord_ids else np.zeros(0, np.int32)
    target_ids = np.concatenate(target_ids) if target_ids else np.zeros(0, np.int32)
    vals = np.concatenate(vals) if vals else np.zeros(0, np.float32)
    model = CSR.from_ijv(coord_ids, target_ids, vals, nrows=n, ncols=n)

    stats = {
        "loss": total_obj,
        "fit": total_err,
        "ffrac": total_err / total_obj if total_obj else 0.0,
        "nnz": model.nnz,
        "niters": total_niters,
    }
    if dbg(cfg, SLIM_DBG_INFO):
        logger.info(
            "Done estimation: loss: %.5e, fit: %.5e, ffrac: %.3f,  #nzs: %d",
            stats["loss"], stats["fit"], stats["ffrac"], stats["nnz"])
    return model, stats
