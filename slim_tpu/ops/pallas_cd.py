"""Pallas TPU kernel for the CD sweep (the hot loop of SLIM learning).

One kernel invocation = one coordinate-descent sweep over all (padded)
coordinates for a block of B item columns.  The kernel runs on a
``grid=(nchunks,)`` pipeline: grid step c processes one 128-coordinate
chunk, whose G rows / gj / active / diag blocks are DMA'd by the Pallas
pipeline itself, with the *shuffled* chunk order driven by a
scalar-prefetched permutation (the index maps read ``perm[c]``).

Within a chunk the kernel runs 128 *unrolled* Gauss-Seidel steps on VMEM
tiles -- each step is ~6 vector ops on (B,1) plus one (B,128) FMA, raw VPU
throughput with no XLA op-dispatch overhead -- then propagates the chunk's
deltas to the global ``q = G x`` with one (B,128)x(128,npad) MXU matmul.
The evolving x and q live in whole-array VMEM blocks that persist across
grid steps (constant index map).  ``q`` is recomputed exactly from x by
XLA before every sweep, so f32 drift never crosses sweep boundaries.

Correctness notes
-----------------
* Mathematically exact cyclic CD (same fixpoint as the reference's
  cd.c:101-142): each coordinate is visited once per sweep; its numerator
  sees all earlier updates of the sweep (in-chunk via the local tile,
  cross-chunk via the MXU propagation).
* Visit order is "shuffled chunks, sequential within chunk" (the static
  unroll keeps every slice lane-aligned).  The reference shuffles the
  flat active list (cd.c:115); both decorrelate the order and reach the
  same optimum (strongly convex for l2r > 0).
* Masks travel as int8/f32 and the soft-threshold is in ReLU form
  (max(num-l1r,0)/(d+l2r), identical to cd.c:125-128): Mosaic cannot
  relayout wide i1 vectors, so the kernel is bool-free.

Capacity: ~4 f32 (B,npad) whole-array blocks (x in/out, q in/out) +
double-buffered (128,npad) G rows must fit VMEM; ``pallas_max_block``
clamps B.  Larger problems fall back to the XLA path (ops/cd_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128

F32 = jnp.float32


def _sweep_kernel(nchunks: int, B: int, npad: int,
                  # scalar-prefetch refs
                  perm_ref, has_ref,
                  # blocked inputs
                  grow_ref,   # (CHUNK, npad) rows [perm[c]*C : +C] of G
                  gj_ref,     # (B, CHUNK) target-Gram chunk
                  act_ref,    # (B, CHUNK) int8 active mask chunk
                  diag_ref,   # (1, CHUNK) Gram diagonal chunk
                  x_in_ref,   # (B, npad) whole
                  q_in_ref,   # (B, npad) whole
                  live_ref,   # (B, 1) f32 0/1
                  regs_ref,   # (B, 2) per-column [l1r, l2r]
                  # outputs (whole-array blocks, persistent across steps)
                  x_ref, q_ref, dltx_ref):
    c = pl.program_id(0)
    l1 = regs_ref[:, 0:1]                            # (B, 1)
    l2 = regs_ref[:, 1:2]

    @pl.when(c == 0)
    def _():
        x_ref[...] = x_in_ref[...]
        q_ref[...] = q_in_ref[...]
        dltx_ref[...] = jnp.zeros((B, 1), F32)

    # skip chunks with no live active coordinate (flags precomputed per
    # sweep by the wrapper, already in permuted order)
    @pl.when(has_ref[c] != 0)
    def _():
        base = pl.multiple_of(perm_ref[c] * CHUNK, CHUNK)
        live = live_ref[...]
        gjloc = gj_ref[...]                          # (B, C)
        okf = act_ref[...].astype(F32) * live        # (B, C) f32 0/1
        dloc = diag_ref[...]                         # (1, C)
        xloc = x_ref[:, pl.ds(base, CHUNK)]          # (B, C)
        qloc = q_ref[:, pl.ds(base, CHUNK)]          # (B, C)
        gcc = grow_ref[:, pl.ds(base, CHUNK)]        # (C, C)

        deltas = []
        ql = qloc
        for ci in range(CHUNK):
            gcol = gjloc[:, ci:ci + 1]               # (B, 1)
            qcol = ql[:, ci:ci + 1]
            xcol = xloc[:, ci:ci + 1]
            ok = okf[:, ci:ci + 1]
            di = dloc[0, ci]
            # nonneg soft-threshold in ReLU form (== cd.c:125-128)
            num = gcol - qcol + di * xcol
            cand = jnp.maximum(num - l1, 0.0) / (di + l2)
            delta = ok * (cand - xcol)
            ql = ql + delta * gcc[ci:ci + 1, :]      # (B,1)*(1,C) FMA
            deltas.append(delta)
        dx = jnp.concatenate(deltas, axis=1)         # (B, C)
        x_ref[:, pl.ds(base, CHUNK)] = xloc + dx
        # propagate the chunk's deltas to the global q on the MXU
        q_ref[...] += jnp.dot(dx, grow_ref[...], preferred_element_type=F32)
        dltx_ref[...] += jnp.sum(dx * dx, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_cd_sweep(G, gj, act_i8, x, q, live_f32, diag2d, regs, chunkperm,
                    haschunk, interpret=False):
    """One CD sweep.  G (npad,npad) f32; gj/x/q (B,npad) f32; act_i8
    (B,npad) int8; live_f32 (B,1); diag2d (1,npad); regs (B,2) per-column
    [l1r,l2r]; chunkperm/haschunk (nchunks,) int32 (haschunk already in
    permuted order).  Returns (x', q', dltx)."""
    B, npad = gj.shape
    nchunks = npad // CHUNK
    kernel = functools.partial(_sweep_kernel, nchunks, B, npad)

    def chunk_cols(c, perm, has):
        return (0, perm[c])

    def grow_map(c, perm, has):
        return (perm[c], 0)

    def whole(c, perm, has):
        return (0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((CHUNK, npad), grow_map),    # G rows
            pl.BlockSpec((B, CHUNK), chunk_cols),     # gj chunk
            pl.BlockSpec((B, CHUNK), chunk_cols),     # act chunk
            pl.BlockSpec((1, CHUNK), chunk_cols),     # diag chunk
            pl.BlockSpec((B, npad), whole),           # x (initial)
            pl.BlockSpec((B, npad), whole),           # q (initial)
            pl.BlockSpec((B, 1), whole),              # live
            pl.BlockSpec((B, 2), whole),              # per-column regs
        ],
        out_specs=[
            pl.BlockSpec((B, npad), whole),           # x out
            pl.BlockSpec((B, npad), whole),           # q out
            pl.BlockSpec((B, 1), whole),              # dltx
        ],
    )
    xout, qout, dltx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, npad), F32),
            jax.ShapeDtypeStruct((B, npad), F32),
            jax.ShapeDtypeStruct((B, 1), F32),
        ],
        interpret=interpret,
    )(chunkperm, haschunk, G, gj, act_i8, diag2d, x, q, live_f32, regs)
    return xout, qout, dltx[:, 0]


def pallas_supported(B: int, npad: int) -> bool:
    """VMEM capacity check: 4 whole (B,npad) f32 blocks (x/q in+out) +
    2x (CHUNK,npad) G-row buffers + small chunks, with Mosaic headroom."""
    # the pipeline double-buffers every block, including the whole-array
    # x/q in+out blocks: 8 (B,npad) f32 buffers + 2 (CHUNK,npad) G-row
    # buffers + the small per-chunk blocks
    vmem = (8 * B * npad * 4 + 2 * CHUNK * npad * 4
            + 8 * B * CHUNK * 4) * 1.05
    # B % 32: int8 blocks need a sublane count divisible by 32
    return npad % CHUNK == 0 and B % 32 == 0 and vmem < 15 * 1024 * 1024


def pallas_max_block(npad: int, cap: int = 512) -> int:
    """Largest supported block size (multiple of 32) for this npad, or 0
    when even the smallest block does not fit VMEM (caller falls back to
    the XLA kernel)."""
    b = max((cap // 32) * 32, 32)
    while b >= 32 and not pallas_supported(b, npad):
        b -= 32
    return b if b >= 32 else 0


@functools.partial(jax.jit, static_argnames=("shuffle", "interpret"))
def pallas_cd_solve(G, gj, diag, active, x0, col_maxniters, yty,
                    l1r, l2r, optTol, seed, shuffle=True, interpret=False):
    """Jitted entry for tests/benchmarks."""
    return pallas_solve_core(G, gj, diag, active, x0, col_maxniters, yty,
                             l1r, l2r, optTol, seed, shuffle=shuffle,
                             interpret=interpret)


def pallas_solve_core(G, gj, diag, active, x0, col_maxniters, yty,
                      l1r, l2r, optTol, seed, shuffle=True, interpret=False):
    """Full block solve built on the sweep kernel: JAX while-loop over
    sweeps with per-column convergence, matching ops/cd_kernel semantics
    (same screen, caps, Σ(Δx)² < optTol stop, residual/objective)."""
    B, npad = gj.shape
    nchunks = npad // CHUNK
    act_i8 = active.astype(jnp.int8)
    act_f = active.astype(F32)
    diag2d = diag.reshape(1, npad).astype(F32)
    l1v = jnp.broadcast_to(jnp.asarray(l1r, F32).reshape(-1), (B,))
    l2v = jnp.broadcast_to(jnp.asarray(l2r, F32).reshape(-1), (B,))
    regs = jnp.stack([l1v, l2v], axis=1)              # (B, 2)
    key = jax.random.PRNGKey(seed)
    x0 = jnp.where(active, x0.astype(F32), 0.0)
    tmax = jnp.max(jnp.where(jnp.any(active, axis=1), col_maxniters, 0))

    def cond(carry):
        x, t, converged, niters = carry
        return (t < tmax) & jnp.any((~converged) & (t < col_maxniters))

    def body(carry):
        x, t, converged, niters = carry
        live = (~converged) & (t < col_maxniters)
        if shuffle:
            perm = jax.random.permutation(
                jax.random.fold_in(key, t), nchunks).astype(jnp.int32)
        else:
            perm = jnp.arange(nchunks, dtype=jnp.int32)
        live_f = live.astype(F32)[:, None]
        chunk_any = (jnp.sum(act_f * live_f, axis=0)
                     .reshape(nchunks, CHUNK).sum(axis=1) > 0)
        has_perm = jnp.take(chunk_any, perm).astype(jnp.int32)
        # exact q at sweep start (MXU, f32 accumulation)
        q = jnp.dot(x, G, preferred_element_type=F32,
                    precision=jax.lax.Precision.HIGHEST)
        xn, qn, dltx = pallas_cd_sweep(G, gj, act_i8, x, q, live_f, diag2d,
                                       regs, perm, has_perm,
                                       interpret=interpret)
        converged = converged | (live & (dltx < optTol))
        return xn, t + 1, converged, niters + live.astype(jnp.int32)

    x, t, converged, niters = jax.lax.while_loop(
        cond, body,
        (x0, jnp.zeros((), jnp.int32), jnp.zeros(B, bool),
         jnp.zeros(B, jnp.int32)))

    q = jnp.dot(x, G, preferred_element_type=F32,
                precision=jax.lax.Precision.HIGHEST)
    rnorm = 0.5 * (yty - 2.0 * jnp.sum(x * gj, axis=1)
                   + jnp.sum(x * q, axis=1))
    obj = rnorm + 0.5 * l2v * jnp.sum(x * x, axis=1) \
        + l1v * jnp.sum(jnp.abs(x), axis=1)
    return x, niters, converged, rnorm, obj
