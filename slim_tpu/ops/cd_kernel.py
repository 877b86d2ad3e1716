"""Batched coordinate-descent block solver.

TPU-native reformulation of the reference's per-column CD
(src/libslim/cd.c:101-142 + driver src/libslim/estimate.c:328-558): a block
of B item columns is solved simultaneously against the shared Gram matrix
G = AᵀA.  All sparse vector ops of the reference become dense vector math:

* ``aTy``            -> ``G[:, j]``  (the target's Gram column)
* ``aᵢᵀ yhat``       -> ``q[i] - G[i,i]·x[i]`` with ``q = G x`` maintained
                         incrementally (the reference maintains ``yhat`` in
                         user space at O(nnz) per update; we maintain ``q``
                         in item space at O(n) per update, B-way batched)
* soft-threshold + nonnegativity (cd.c:125-128) is unchanged:
  ``x_i = max(num - l1r, 0) / (G[i,i] + l2r)`` (no negative branch).

The update order is a per-sweep random permutation shared across the block
(the reference shuffles per column with a shared-state ``rand()``,
cd.c:76-86 -- benign nondeterminism; we use a counter-based key so runs are
reproducible).  Convergence per column: Σ(Δx)² < optTol (cd.c:135-138);
per-column sweep cap min(50·nnz_j, maxniters) (estimate.c:448-449).

``q`` is recomputed exactly on the MXU at the start of every sweep, so f32
drift from the incremental rank-1 updates never accumulates across sweeps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def fslim_active_mask(gj, diag, self_ids, n_valid, nnbrs, simtype,
                      col_ids=None, self_norms=None):
    """FSLIM neighbour selection from Gram columns (neighbors.c:16-125).

    Candidates are items co-rated with the target (gj > 0), excluding the
    target itself; similarity is ``dotp`` = aᵀb, ``cos`` = aᵀb/‖b‖ (the
    target's own norm is a constant per column so the ranking matches full
    cosine; neighbors.c:82-83), ``jac`` = aᵀb/(‖b‖+‖a‖-aᵀb)
    (neighbors.c:107-109; the reference uses 2-norms, not squared).  The
    top-nnbrs by similarity become the CD active set.

    ``col_ids`` (width,) maps positions to global item ids when operating
    in a compacted coordinate space (defaults to arange); ``self_norms``
    (B,) supplies ‖a_j‖ directly when ``diag`` is compacted (jac only).
    Restricting the top-k to a union superset of the true top sets is
    exact: every column's global top-nnbrs is inside the union, so the
    restricted ranking returns the same set.
    """
    B, width = gj.shape
    cnorms = jnp.sqrt(diag)
    ids = col_ids if col_ids is not None else \
        jnp.arange(width, dtype=self_ids.dtype)
    cand = (gj > 0) & (ids[None, :] != self_ids[:, None]) \
        & (ids[None, :] < n_valid)
    if simtype == "dotp":
        sim = gj
    elif simtype == "cos":
        sim = gj / jnp.maximum(cnorms[None, :], 1e-30)
    elif simtype == "jac":
        selfn = self_norms if self_norms is not None else jnp.take(
            cnorms, jnp.clip(self_ids, 0, width - 1))
        denom = cnorms[None, :] + selfn[:, None] - gj
        sim = gj / jnp.where(jnp.abs(denom) > 1e-30, denom, 1e-30)
    else:
        raise ValueError(f"unknown simtype {simtype!r}")
    sim = jnp.where(cand, sim, -jnp.inf)
    k = max(1, min(int(nnbrs), width))
    if width >= 1 << 18:
        # two-stage exact top-k: a single-pass top_k sorts the whole
        # 2M-wide row; the chunked composition keeps each sort window
        # small (see predict._topk_wide -- any global top-k element is
        # inside its chunk's top-k)
        from ..predict import _topk_wide

        vals, ids_k = _topk_wide(sim, k, chunk=32768)
    else:
        vals, ids_k = jax.lax.top_k(sim, k)
    valid = jnp.isfinite(vals)
    return jnp.zeros((B, width), bool).at[
        jnp.arange(B)[:, None], ids_k].max(valid)


def _large_variant_kwargs(variant):
    """Map the driver-resolved kernel variant onto
    :func:`pallas_solve_large_core`'s use_v3/use_v4 selectors.  ``None``
    keeps the trace-time auto-pick; an explicit value pins the variant --
    and, because ``variant`` is a *static* jit argument, re-keys JAX's
    trace cache so a post-denylist retry actually re-traces instead of
    reusing the failed variant's cached jaxpr (round-3 advisor finding)."""
    if variant is None:
        return {}
    return dict(use_v4=(variant == "v4"), use_v3=(variant == "v3"))


@functools.partial(
    jax.jit, static_argnames=("shuffle", "fslim_nnbrs", "simtype", "impl",
                              "x0_zero", "variant"))
def cd_solve_block_ids(G, j_ids, col_maxniters, x0, n_valid,
                       l1r, l2r, optTol, seed, gq=None, shuffle=True,
                       fslim_nnbrs=0, simtype="cos", impl="xla",
                       x0_zero=False, variant=None):
    """Column-id entry point: derives gj / active-set / yty from G inside
    the compiled program (one compile for the whole learn loop -- per-block
    eager slicing would trigger separate compilations on remote-compile
    TPU setups).

    ``j_ids`` padded entries should point at a zero column of G (the
    driver pads with npad-1); their caps must be 0.  ``l1r``/``l2r``
    accept a scalar or a per-column (B,) vector (per-column regularisation
    powers the parallel-grid mselect mode).  ``gq``: optional hoisted
    bf16(-tiled) copy of G for the v4 kernel (pallas_cd.make_gq) --
    building it once per learn instead of inside every launch saves
    ~17 ms/launch of HBM traffic.
    """
    diag = jnp.diagonal(G)
    gj = jnp.take(G, j_ids, axis=1).T                       # (B, npad)
    B, npad = gj.shape
    l1r = jnp.broadcast_to(jnp.asarray(l1r, gj.dtype).reshape(-1), (B,))
    l2r = jnp.broadcast_to(jnp.asarray(l2r, gj.dtype).reshape(-1), (B,))
    cols = jnp.arange(npad, dtype=j_ids.dtype)
    if fslim_nnbrs > 0:
        active = fslim_active_mask(gj, diag, j_ids, n_valid,
                                   fslim_nnbrs, simtype)
    else:
        active = (gj > l1r[:, None]) & (cols[None, :] != j_ids[:, None])
    yty = jnp.take(diag, j_ids)
    if impl == "pallas":
        from .pallas_cd import pallas_solve_core

        return pallas_solve_core(G, gj, diag, active, x0, col_maxniters,
                                 yty, l1r, l2r, optTol, seed, shuffle=shuffle)
    if impl == "pallas_large":
        from .pallas_cd import pallas_solve_large_core

        return pallas_solve_large_core(G, gj, diag, active, x0,
                                       col_maxniters, yty, l1r, l2r, optTol,
                                       seed, shuffle=shuffle,
                                       x0_zero=x0_zero, gq=gq,
                                       **_large_variant_kwargs(variant))
    return _cd_core(G, gj, diag, active, x0, col_maxniters, yty,
                    l1r, l2r, optTol, seed, shuffle)


@functools.partial(jax.jit, static_argnames=("shuffle",))
def cd_solve_block(G, gj, diag, active, x0, col_maxniters, yty,
                   l1r, l2r, optTol, seed, shuffle=True):
    return _cd_core(G, gj, diag, active, x0, col_maxniters, yty,
                    l1r, l2r, optTol, seed, shuffle)


@functools.partial(jax.jit, static_argnames=("fslim_nnbrs", "simtype"))
def block_union_masks_batched(G, j_ids_all, l1r, fslim_nnbrs=0,
                              simtype="cos"):
    """Union active sets for MANY blocks in one dispatch (vmapped
    :func:`block_union_mask` over (nblocks, B) column ids); returns
    (S_all (nblocks, npad), counts (nblocks,))."""
    def one(j_ids):
        return block_union_mask(G, j_ids, l1r, G.shape[0],
                                fslim_nnbrs=fslim_nnbrs, simtype=simtype)

    return jax.vmap(one)(j_ids_all)


@jax.jit
def count_over(x, eps):
    """Per-column model nnz: count of entries > eps (reference keeps
    entries > EPSILON=1e-7, slim.h:61)."""
    return jnp.sum(x > eps, axis=1, dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("Tpad", "idx16"))
def pack_flat(x, eps, offsets, Tpad, idx16):
    """Exact-size flat harvest pack (device-side model compaction).

    x (B, K) nonneg solution block; offsets (B,) exclusive prefix sums of
    the per-column counts (host-computed from a prior :func:`count_over`
    fetch); Tpad static >= total count.  Returns (vals (Tpad,) f32,
    idx (Tpad,) uint16|int32): entries of column b land at
    [offsets[b], offsets[b]+cnt[b]) in ascending coordinate order.  The
    device->host harvest then moves exactly 6 (or 8) bytes per model
    nonzero -- no top-M overflow refetches, no width-K padding.
    """
    B, K = x.shape
    mask = x > eps
    rank = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
    pos = jnp.where(mask, offsets[:, None] + rank, Tpad)
    flat_val = jnp.zeros((Tpad,), x.dtype).at[pos.reshape(-1)].set(
        x.reshape(-1), mode="drop", unique_indices=True)
    cols = jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int32)[None, :], (B, K))
    idt = jnp.uint16 if idx16 else jnp.int32
    flat_idx = jnp.zeros((Tpad,), idt).at[pos.reshape(-1)].set(
        cols.astype(idt).reshape(-1), mode="drop", unique_indices=True)
    return flat_val, flat_idx


@functools.partial(jax.jit, static_argnames=("nblocks", "B"))
def block_union_flags(G, nblocks, B, l1r):
    """Screening-union membership flags for consecutive-rank blocks in one
    slice-reduce pass over G (no per-block gathers, no device argsorts).

    Returns u (nblocks, npad) bool: u[b, i] = coordinate i is active for
    some column of block b (columns [b*B, (b+1)*B), self excluded).  The
    driver compacts u on device (:func:`compact_union_ids`) and fetches
    only the per-block counts.
    """
    npad = G.shape[0]
    total = nblocks * B
    Gb = G[:, :min(total, npad)]
    if total > npad:
        Gb = jnp.pad(Gb, ((0, 0), (0, total - npad)))
    over = (Gb > jnp.asarray(l1r, G.dtype)).reshape(npad, nblocks, B)
    cnt = jnp.sum(over, axis=2)                       # (npad, nblocks)
    rows = jnp.arange(npad)
    # remove the self term when coordinate i's own column is in block b
    self_block = rows // B
    self_over = jnp.diagonal(G) > jnp.asarray(l1r, G.dtype)
    self_term = (jnp.arange(nblocks)[None, :] == self_block[:, None]) \
        & self_over[:, None] & (rows < min(total, npad))[:, None]
    return ((cnt - self_term.astype(cnt.dtype)) > 0).T   # (nblocks, npad)


@jax.jit
def compact_union_ids(u):
    """Compact the (nblocks, npad) union flags ON DEVICE.

    Returns (ids (nblocks, npad) int32, counts (nblocks,) int32): ids[b]
    holds block b's flagged coordinate ids ascending, padded with npad-1
    (the zero row/col, same convention as block_union_mask).  The driver
    fetches only ``counts`` (the first post-Gram sync, a few hundred
    bytes) and slices each block's (K,) list from the device-resident
    ``ids`` -- the (nblocks, npad) flag matrix never crosses the tunnel
    and no host-side index lists are built or re-uploaded (the screen
    this serves: estimate.c:411-421).
    """
    npad = u.shape[1]
    iota = jnp.arange(npad, dtype=jnp.int32)
    # inactive entries sort after every real id, then clamp to npad-1
    keys = jnp.where(u, iota[None, :], jnp.int32(1 << 30))
    ids = jnp.minimum(jnp.sort(keys, axis=1), jnp.int32(npad - 1))
    return ids, jnp.sum(u, axis=1, dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("K", "fslim_nnbrs", "simtype"))
def block_union_mask(G, j_ids, l1r, K, fslim_nnbrs=0, simtype="cos"):
    """Screen a block and extract its union active set.

    Returns (S, union_count): S = (K,) compacted coordinate ids (ascending;
    padded entries point at npad-1, the zero row/col), union_count = true
    union size so the caller can grow K when it overflows.

    The union set is what makes large catalogues tractable: after
    frequency relabeling the blocks' active sets overlap heavily (popular
    items dominate every screen), so K_union ≈ K_active per column rather
    than B x K_active.
    """
    npad = G.shape[0]
    gj = jnp.take(G, j_ids, axis=1).T                  # (B, npad)
    B = gj.shape[0]
    l1v = jnp.broadcast_to(jnp.asarray(l1r, gj.dtype).reshape(-1), (B,))
    cols = jnp.arange(npad, dtype=j_ids.dtype)
    if fslim_nnbrs > 0:
        active = fslim_active_mask(gj, jnp.diagonal(G), j_ids, npad,
                                   fslim_nnbrs, simtype)
    else:
        active = (gj > l1v[:, None]) & (cols[None, :] != j_ids[:, None])
    u = jnp.any(active, axis=0)                        # (npad,)
    count = jnp.sum(u.astype(jnp.int32))
    # ascending active ids first: sort key puts active coords (key=idx)
    # before inactive ones (key=idx+npad); padded tail -> npad-1
    key = jnp.where(u, cols, cols + npad)
    order = jnp.argsort(key)[:K]
    pos = jnp.arange(K, dtype=j_ids.dtype)
    S = jnp.where(pos < count, order.astype(j_ids.dtype), npad - 1)
    return S, count


@functools.partial(
    jax.jit, static_argnames=("shuffle", "impl", "fslim_nnbrs", "simtype",
                              "x0_zero", "variant"))
def cd_solve_block_compact(G, S, j_ids, col_maxniters, x0s,
                           l1r, l2r, optTol, seed, shuffle=True, impl="xla",
                           fslim_nnbrs=0, simtype="cos", x0_zero=False,
                           variant=None):
    """Solve a block in the compacted coordinate space S (from
    :func:`block_union_mask`).

    Exact: coordinates outside S are inactive for every column of the
    block (for FSLIM, S is the union of the per-column top-k sets, so the
    restricted top-k returns the same sets), and restricting the solve to
    S changes nothing; per-sweep cost drops from O(npad²) to O(K²).
    ``x0s`` is the warm start already gathered into compact space ((B, K)).
    """
    npad = G.shape[0]
    B = j_ids.shape[0]
    K = S.shape[0]
    l1v = jnp.broadcast_to(jnp.asarray(l1r, G.dtype).reshape(-1), (B,))
    l2v = jnp.broadcast_to(jnp.asarray(l2r, G.dtype).reshape(-1), (B,))

    # compact Gram: row gather (DMA-friendly) then column gather
    Gs = jnp.take(jnp.take(G, S, axis=0), S, axis=1)   # (K, K)
    diag_full = jnp.diagonal(G)
    diag_s = jnp.take(diag_full, S)
    gjs = jnp.take(jnp.take(G, j_ids, axis=1).T, S, axis=1)  # (B, K)
    yty = jnp.take(diag_full, j_ids)

    pad_mask = S != (npad - 1)                         # real compact coords
    if fslim_nnbrs > 0:
        active_s = fslim_active_mask(
            gjs, diag_s, j_ids, npad, fslim_nnbrs, simtype,
            col_ids=S, self_norms=jnp.sqrt(yty)) & pad_mask[None, :]
    else:
        active_s = (gjs > l1v[:, None]) & (S[None, :] != j_ids[:, None]) \
            & pad_mask[None, :]

    if impl == "pallas":
        from .pallas_cd import pallas_solve_core

        return pallas_solve_core(Gs, gjs, diag_s, active_s, x0s,
                                 col_maxniters, yty, l1v, l2v, optTol, seed,
                                 shuffle=shuffle)
    if impl == "pallas_large":
        from .pallas_cd import pallas_solve_large_core

        return pallas_solve_large_core(Gs, gjs, diag_s, active_s, x0s,
                                       col_maxniters, yty, l1v, l2v, optTol,
                                       seed, shuffle=shuffle,
                                       x0_zero=x0_zero,
                                       **_large_variant_kwargs(variant))
    return _cd_core(Gs, gjs, diag_s, active_s, x0s, col_maxniters, yty,
                    l1v, l2v, optTol, seed, shuffle)


CHUNK = 128  # coordinates per Gauss-Seidel chunk (VPU lane width)


def _cd_core(G, gj, diag, active, x0, col_maxniters, yty,
             l1r, l2r, optTol, seed, shuffle=True):
    """Solve B columns of the SLIM elastic-net problem against shared G.

    Parameters
    ----------
    G : (n, n) f32          symmetric Gram matrix (padded cols are zero).
    gj : (B, n) f32         Gram columns of the B targets: gj[b] = G[:, J[b]].
    diag : (n,) f32         diag(G) = squared column norms.
    active : (B, n) bool    active-set mask (screen G[:,j] > l1r, i != j --
                            estimate.c:412-421 -- or FSLIM neighbour set).
    x0 : (B, n) f32         warm start (caller pre-masks to the active set,
                            estimate.c:453-471).
    col_maxniters : (B,) i32  per-column sweep caps.
    yty : (B,) f32          ||y_j||² = G[j,j] for residual computation.
    l1r, l2r : scalar or per-column (B,) vector.
    optTol : scalar.
    seed : i32 scalar       base for the per-sweep permutation keys.
    shuffle : static bool   permuted vs cyclic coordinate order.

    Returns
    -------
    x : (B, n) f32 solutions (zero outside active set).
    niters : (B,) i32 sweeps run per column.
    rstatus : (B,) bool converged-within-cap flag (cd.c:97-98).
    rnorm : (B,) f32   ½||y - Ax||² per column (estimate.c:477-481).
    obj : (B,) f32     full objective per column (estimate.c:484-489).
    """
    B, n = gj.shape
    f32 = gj.dtype
    l1v = jnp.broadcast_to(jnp.asarray(l1r, f32).reshape(-1), (B,))
    l2v = jnp.broadcast_to(jnp.asarray(l2r, f32).reshape(-1), (B,))
    x0 = jnp.where(active, x0, jnp.zeros((), f32))
    tmax = jnp.max(jnp.where(jnp.any(active, axis=1), col_maxniters, 0))
    key = jax.random.PRNGKey(seed)

    def sweep_cond(carry):
        x, q, t, converged, niters = carry
        live = (~converged) & (t < col_maxniters)
        return (t < tmax) & jnp.any(live)

    nchunks = n // CHUNK
    assert n % CHUNK == 0, "pad the coordinate dimension to a CHUNK multiple"

    def sweep_body(carry):
        x, q, t, converged, niters = carry
        live = (~converged) & (t < col_maxniters)  # (B,)
        # exact q at sweep start: one MXU matmul kills f32 drift
        # (HIGHEST => true f32 accumulation on TPU, not bf16 passes)
        q = jnp.dot(x, G, preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST)
        if shuffle:
            # randomised visit order = shuffled chunk order x shuffled
            # order within each chunk (shared across the block).  The
            # reference shuffles the flat active list per column
            # (cd.c:115); any decorrelated order serves the same purpose
            # and the optimum is identical (strongly convex problem).
            tkey = jax.random.fold_in(key, t)
            chunk_perm = jax.random.permutation(tkey, nchunks)
            inner_perm = jax.random.permutation(
                jax.random.fold_in(tkey, 1), CHUNK)
        else:
            chunk_perm = jnp.arange(nchunks)
            inner_perm = jnp.arange(CHUNK)

        def chunk_body(cc, inner):
            x, q, dltx = inner
            base = chunk_perm[cc] * CHUNK
            # local views for the Gauss-Seidel chunk (all contiguous)
            Gloc = jax.lax.dynamic_slice(G, (base, 0), (CHUNK, G.shape[1]))
            Gcc = jax.lax.dynamic_slice(Gloc, (0, base), (CHUNK, CHUNK))
            gj_loc = jax.lax.dynamic_slice(gj, (0, base), (B, CHUNK))
            a_loc = jax.lax.dynamic_slice(active, (0, base), (B, CHUNK))
            x_loc = jax.lax.dynamic_slice(x, (0, base), (B, CHUNK))
            q_loc = jax.lax.dynamic_slice(q, (0, base), (B, CHUNK))
            d_loc = jax.lax.dynamic_slice(diag, (base,), (CHUNK,))

            def run_chunk(args):
                x, q, dltx, x_loc, q_loc = args
                x_old = x_loc

                def coord_body(ci, st):
                    x_loc, q_loc = st
                    i = inner_perm[ci]
                    gcol = jax.lax.dynamic_slice(gj_loc, (0, i), (B, 1))[:, 0]
                    qcol = jax.lax.dynamic_slice(q_loc, (0, i), (B, 1))[:, 0]
                    xcol = jax.lax.dynamic_slice(x_loc, (0, i), (B, 1))[:, 0]
                    acol = jax.lax.dynamic_slice(a_loc, (0, i), (B, 1))[:, 0]
                    di = jax.lax.dynamic_slice(d_loc, (i,), (1,))[0]
                    num = gcol - qcol + di * xcol
                    cand = jnp.where(num > l1v, (num - l1v) / (di + l2v),
                                     jnp.zeros((), f32))
                    newx = jnp.where(acol & live, cand, xcol)
                    delta = newx - xcol
                    # in-chunk Gauss-Seidel: only the local C-wide tile
                    Grow = jax.lax.dynamic_slice(Gcc, (i, 0), (1, CHUNK))[0]
                    q_loc = q_loc + delta[:, None] * Grow[None, :]
                    x_loc = jax.lax.dynamic_update_slice(
                        x_loc, newx[:, None], (0, i))
                    return x_loc, q_loc

                x_loc, q_loc = jax.lax.fori_loop(0, CHUNK, coord_body,
                                                 (x_loc, q_loc))
                dx = x_loc - x_old
                # propagate the finished chunk to the global q on the MXU
                q = q + jnp.dot(dx, Gloc, preferred_element_type=f32,
                                precision=jax.lax.Precision.HIGHEST)
                x = jax.lax.dynamic_update_slice(x, x_loc, (0, base))
                return x, q, dltx + jnp.sum(dx * dx, axis=1)

            # skip chunks with no active coordinate in any live column
            return jax.lax.cond(
                jnp.any(a_loc & live[:, None]), run_chunk,
                lambda args: args[:3], (x, q, dltx, x_loc, q_loc))

        x, q, dltx = jax.lax.fori_loop(
            0, nchunks, chunk_body, (x, q, jnp.zeros(B, f32)))
        converged = converged | (live & (dltx < optTol))
        niters = niters + live.astype(jnp.int32)
        return x, q, t + 1, converged, niters

    q0 = jnp.dot(x0, G, preferred_element_type=f32,
                 precision=jax.lax.Precision.HIGHEST)
    x, q, t, converged, niters = jax.lax.while_loop(
        sweep_cond, sweep_body,
        (x0, q0, jnp.zeros((), jnp.int32), jnp.zeros(B, bool),
         jnp.zeros(B, jnp.int32)))

    # final exact q for the residual/objective (estimate.c:477-489):
    # ||y - Ax||² = yᵀy - 2 xᵀ(Aᵀy) + xᵀ G x
    q = jnp.dot(x, G, preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST)
    rnorm = 0.5 * (yty - 2.0 * jnp.sum(x * gj, axis=1) + jnp.sum(x * q, axis=1))
    obj = rnorm + 0.5 * l2v * jnp.sum(x * x, axis=1) \
        + l1v * jnp.sum(jnp.abs(x), axis=1)
    return x, niters, converged, rnorm, obj
