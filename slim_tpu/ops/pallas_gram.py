"""Pallas TPU densification kernel for the Gram builder.

The device Gram (G = AᵀA, the transform that replaces the reference's
per-column ``ATy`` recomputation, src/libslim/estimate.c:411-421, and
MKL's ``mkl_sparse_d_spmmd``, estimate.c:124-125) is computed as
``G += blkᵀ·blk`` over densified row blocks.  The densification was the
bottleneck: XLA lowers the (l, c) scatter-add to ~6.6M updates/s on TPU
(hardware-measured 5.75 s of the 7.2 s ML-20M Gram; sorted/1D variants
no better).  Scatter is the one memory pattern the TPU fundamentally
dislikes -- so this kernel replaces it with what the VPU *likes*: dense
compare-select.

Layout: rows are presented COLUMN-MAJOR per row block -- ``idsT (W, R)``
holds the w-th column id of row r at ``idsT[w, r]`` (sentinel ``>= npad``
pads short rows) -- so one sublane read ``idsT[w, :]`` yields the lane
vector of RT rows' w-th ids, broadcast against the tile's column iota:

    out[c0+cc, r] += (idsT[w, r] == c0+cc) * v        -- pure VPU

The output is the TRANSPOSED dense block (npad, R); the caller contracts
it on the MXU (``G += blkT @ blkTᵀ``), which needs no physical transpose.

Skip machinery: per (row-tile, W-chunk) column min/max ride in SMEM
(scalar prefetch).  Rows arrive nnz-sorted and column ids are ascending
within a row, so chunk w of a row tile spans a narrow column range and
most (tile, chunk) pairs are skipped -- after frequency relabeling the
tail column tiles see almost no entries.  The per-row-tile entry bound
``wmax`` caps the chunk loop itself.

No reference counterpart: the reference never materializes dense blocks
(its CD is gather-bound by design); this kernel exists to feed the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32

WCH = 32    # entries per skip-check chunk (granularity of cmin/cmax)
RT = 256    # rows (lanes) per tile


def pick_ct(npad: int) -> int:
    """Column-tile width: the largest of {512, 256, 128} dividing npad
    (every bucket of solvers.cd.bucket_npad is a multiple of 128)."""
    for ct in (512, 256, 128):
        if npad % ct == 0:
            return ct
    return 0


def _densify_kernel(W, CT, ones, out_dt,
                    # scalar prefetch
                    wmax_ref,   # (nRt,) per row-tile entry bound
                    cmin_ref,   # (nRt, W//WCH) chunk column min
                    cmax_ref,   # (nRt, W//WCH) chunk column max
                    # blocked inputs
                    ids_ref,    # (W, RT) int32 column ids (sentinel pad)
                    *rest):     # [vals_ref (W, RT) f32,] out_ref (CT, RT)
    vals_ref = None if ones else rest[0]
    out_ref = rest[-1]
    i = pl.program_id(0)
    j = pl.program_id(1)
    c0 = j * CT
    colids = c0 + jax.lax.broadcasted_iota(jnp.int32, (CT, RT), 0)

    def chunk(wc, acc):
        def hitchunk(acc):
            base = pl.multiple_of(wc * WCH, WCH)
            for k in range(WCH):
                idsr = ids_ref[pl.ds(base + k, 1), :]        # (1, RT)
                hit = colids == idsr
                if ones:
                    acc = acc + hit.astype(F32)
                else:
                    acc = acc + jnp.where(
                        hit, vals_ref[pl.ds(base + k, 1), :], 0.0)
            return acc

        # skip the whole chunk when its column range misses this tile
        return jax.lax.cond(
            (cmax_ref[i, wc] >= c0) & (cmin_ref[i, wc] < c0 + CT),
            hitchunk, lambda a: a, acc)

    trips = pl.cdiv(wmax_ref[i], WCH)
    acc = jax.lax.fori_loop(0, trips, chunk,
                            jnp.zeros((CT, RT), F32))
    out_ref[...] = acc.astype(out_dt)


@functools.partial(jax.jit,
                   static_argnames=("npad", "out_dtype", "interpret"))
def pallas_densify(idsT, valsT, wmax, cmin, cmax, npad,
                   out_dtype=jnp.bfloat16, interpret=False):
    """Densify one row block: returns the transposed dense block
    (npad, R) with ``out[c, r] = v`` for each entry ``(idsT[w, r] = c,
    valsT[w, r] = v)`` and 0 elsewhere.

    idsT (W, R) int32: column ids, ascending per row (CSR order), pad
    entries >= npad.  valsT (W, R) f32 or None (implicit 1.0, binary
    data).  wmax (nRt,) int32 bounds the entry loop per RT-row tile;
    cmin/cmax (nRt, W//WCH) int32 bound each WCH-entry chunk's column
    range (pad chunks: cmin=npad, cmax=-1, which never overlap a tile).
    W must be a multiple of WCH, R of RT, npad of CT.
    """
    W, R = idsT.shape
    ones = valsT is None
    CT = pick_ct(npad)
    kernel = functools.partial(_densify_kernel, W, CT, ones,
                               jnp.dtype(out_dtype))

    def ids_map(i, j, *_):
        return (0, i)

    in_specs = [pl.BlockSpec((W, RT), ids_map)]
    args = [idsT]
    if not ones:
        in_specs.append(pl.BlockSpec((W, RT), ids_map))
        args.append(valsT)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(R // RT, npad // CT),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((CT, RT), lambda i, j, *_: (j, i)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((npad, R), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(wmax, cmin, cmax, *args)


def densify_meta(idsT, npad):
    """Device-side skip metadata for :func:`pallas_densify`.

    Returns (wmax (nRt,) int32, cmin/cmax (nRt, W//WCH) int32) from the
    sentinel-padded idsT (W, R): wmax = index bound of real entries per
    RT-row tile; cmin/cmax = per-chunk column range (sentinels excluded:
    an all-pad chunk gets cmin=npad, cmax=-1 and never overlaps).
    """
    W, R = idsT.shape
    nrt = R // RT
    nch = W // WCH
    t = idsT.reshape(nch, WCH, nrt, RT)
    valid = t < npad
    cmin = jnp.min(jnp.where(valid, t, npad), axis=(1, 3)).T  # (nRt, nch)
    cmax = jnp.max(jnp.where(valid, t, -1), axis=(1, 3)).T
    # per-row-tile entry bound: highest w with any valid entry, +1
    anyv = jnp.any(valid, axis=3).reshape(W, nrt)             # (W, nRt)
    widx = jnp.where(anyv, jax.lax.broadcasted_iota(
        jnp.int32, (W, nrt), 0) + 1, 0)
    wmax = jnp.max(widx, axis=0).astype(jnp.int32)            # (nRt,)
    return wmax, cmin.astype(jnp.int32), cmax.astype(jnp.int32)


def gathered_densifyT(idx, val, rs, rl, W, npad, ones, out_dt,
                      n_valid=None, interpret=False):
    """Gather one row block's transposed padded-id layout from a flat CSR
    index array and densify it (the shared sequence of the Gram builder
    and the dense predict scan).

    idx (nnz,) uint16/int32 flat CSR column ids; val (nnz,) f32 (ignored
    when ``ones``); rs/rl (R,) int32 row starts/lengths.  Ids are sorted
    ascending per row ON DEVICE so the kernel's chunk-skip ranges are
    tight regardless of input order (the solver's frequency relabeling
    unsorts rows).  ``n_valid``: ids >= n_valid are dropped (the
    reference's ``id < ncols`` guard, predict.c:35).  Returns the
    (npad, R) dense transposed block in ``out_dt``.
    """
    W_, R = int(W), rs.shape[0]
    wio = jax.lax.broadcasted_iota(jnp.int32, (W_, R), 0)
    e = rs[None, :] + wio
    valid = wio < rl[None, :]
    ids32 = jnp.take(idx, e, mode="clip").astype(jnp.int32)
    if n_valid is not None:
        valid = valid & (ids32 < n_valid)
    idsT = jnp.where(valid, ids32, npad)
    if ones:
        idsT = jnp.sort(idsT, axis=0)
        valsT = None
    else:
        ordw = jnp.argsort(idsT, axis=0)
        idsT = jnp.take_along_axis(idsT, ordw, axis=0)
        valsT = jnp.take_along_axis(
            jnp.where(valid, jnp.take(val, e, mode="clip"), 0.0),
            ordw, axis=0)
    wmax, cmin, cmax = densify_meta(idsT, npad)
    return pallas_densify(idsT, valsT, wmax, cmin, cmax, npad,
                          out_dtype=out_dt, interpret=interpret)


def densify_supported(W: int, R: int, npad: int) -> bool:
    """Shape domain: divisibility plus a VMEM bound (ids block double-
    buffered + accumulator + output block)."""
    ct = pick_ct(npad)
    if W % WCH or R % RT or not ct:
        return False
    vmem = (2 * W * RT * 4            # ids in (double-buffered)
            + 2 * W * RT * 4          # vals (worst case, non-binary)
            + ct * RT * 4             # accumulator
            + 2 * ct * RT * 4)        # out block
    return vmem < 90 * 1024 * 1024
