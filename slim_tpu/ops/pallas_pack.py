"""Pallas TPU ragged-compaction kernel for the harvest pack.

The harvest moves each solved block's model nonzeros device->host as an
exact-size flat pack (6 bytes/nonzero, ops/cd_kernel.pack_flat).  The
XLA formulation is a (B*K)-update scatter -- hardware-measured 0.377 s
per (1024, 28672) block, ~10 s of device time across an ML-20M learn,
and the variants (fused payload, gather-by-searchsorted) measure WORSE
(1.72 s / 0.51 s).  Compaction is a layout problem, not a scatter
problem: this kernel walks each row's 128-lane groups, compacts a
group's surviving lanes to the front with one one-hot MXU contraction,
rotates the compact run to its destination lane offset
(``pltpu.roll``, dynamic shift), and commits it with two masked stores
(the run may straddle a 128-lane output row).  Group destinations come
from a per-row prefix matmul, so there is no serial pointer chain, and
empty groups (most of a sparse solution's tail after frequency
relabeling) skip everything but one scalar test.

Layout contract (identical to pack_flat, cd_kernel.py): row b's entries
land at [off[b], off[b]+cnt[b]) in ascending column order; the padded
tail [T, Tpad) is zero.  ``cnt`` uses the same ``x > eps`` predicate as
count_over, so the caller's offsets line up exactly.

Reference anchor: replaces the save-nonzeros walk of
src/libslim/estimate.c:492-505 on the device side of the harvest.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
GR = 128           # lanes per compaction group
RB = 8             # rows per grid step


def _pack_kernel(ngr, Tpad, eps,
                 off_ref,            # scalar prefetch: (B,) int32 offsets
                 x_ref,              # (RB*ngr, GR) row-group tiles
                 vals_ref,           # (Tpad//GR, GR) f32 out (whole)
                 idx_ref,            # (Tpad//GR, GR) f32 out (whole)
                 gp_ref,             # (ngr, GR) f32 scratch: col0=cnt col1=pfx
                 rank_ref):          # (ngr, GR) f32 scratch: in-group ranks
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        vals_ref[...] = jnp.zeros((Tpad // GR, GR), F32)
        idx_ref[...] = jnp.zeros((Tpad // GR, GR), F32)

    lanes_i = jax.lax.broadcasted_iota(jnp.int32, (1, GR), 1)
    lanes_f = lanes_i.astype(F32)
    # U[k, j] = 1 if k < j  (exclusive in-group rank via one MXU pass);
    # Mosaic iota is integer-only, so compare in int32 and cast
    iu = jax.lax.broadcasted_iota(jnp.int32, (GR, GR), 0)
    ju = jax.lax.broadcasted_iota(jnp.int32, (GR, GR), 1)
    U = (iu < ju).astype(F32)
    js = iu.astype(F32)
    # strict lower-triangular (ngr, ngr) for the group-prefix matmul
    ig = jax.lax.broadcasted_iota(jnp.int32, (ngr, ngr), 0)
    jg = jax.lax.broadcasted_iota(jnp.int32, (ngr, ngr), 1)
    LT = (jg < ig).astype(F32)

    for r in range(RB):
        row = x_ref[r * ngr:(r + 1) * ngr, :]              # (ngr, GR)
        mrow = (row > eps).astype(F32)
        gc = jnp.sum(mrow, axis=1, keepdims=True)          # (ngr, 1)
        # HIGHEST everywhere: DEFAULT rounds MXU operands to bf16, which
        # corrupts values, prefixes > 256 and column ids > 256
        pfx = jnp.dot(LT, gc, preferred_element_type=F32,
                      precision=jax.lax.Precision.HIGHEST)  # exclusive
        gp_ref[:, 0:1] = gc
        gp_ref[:, 1:2] = pfx
        # all groups' in-group ranks in ONE MXU pass (the per-group form
        # issued ~ngr small (1,GR)x(GR,GR) dots -- MXU issue overhead,
        # not FLOPs, dominated the kernel)
        rank_ref[...] = jnp.dot(mrow, U, preferred_element_type=F32,
                                precision=jax.lax.Precision.HIGHEST)
        off_b = off_ref[i * RB + r]

        def grp(g, carry):
            cnt = gp_ref[g, 0].astype(jnp.int32)

            @pl.when(cnt > 0)
            def _():
                p = off_b + gp_ref[g, 1].astype(jnp.int32)
                v = x_ref[pl.ds(r * ngr + g, 1), :]        # (1, GR)
                m = v > eps
                mf = m.astype(F32)
                rank = rank_ref[pl.ds(g, 1), :]            # (1, GR)
                B1 = jnp.broadcast_to(rank, (GR, GR))      # [j,k]=rank[k]
                Bm = ((B1 == js) & jnp.broadcast_to(m, (GR, GR)))
                Bf = Bm.astype(F32)
                dn = (((1,), (1,)), ((), ()))
                kf = jnp.float32(g * GR) + lanes_f
                # value + column id through ONE (2, GR) contraction
                cvi = jax.lax.dot_general(
                    jnp.concatenate([v * mf, kf], axis=0), Bf, dn,
                    preferred_element_type=F32,
                    precision=jax.lax.Precision.HIGHEST)   # (2, GR)
                lo = jax.lax.rem(p, GR)
                q0 = jax.lax.div(p, GR)
                rvi = pltpu.roll(cvi, lo, axis=1)
                rv = rvi[0:1, :]
                ri = rvi[1:2, :]
                w0 = (lanes_i >= lo) & (lanes_i < lo + cnt)
                pltpu.store(vals_ref.at[pl.ds(q0, 1), :], rv, mask=w0)
                pltpu.store(idx_ref.at[pl.ds(q0, 1), :], ri, mask=w0)

                @pl.when(lo + cnt > GR)
                def _():
                    w1 = lanes_i < (lo + cnt - GR)
                    pltpu.store(vals_ref.at[pl.ds(q0 + 1, 1), :], rv,
                                mask=w1)
                    pltpu.store(idx_ref.at[pl.ds(q0 + 1, 1), :], ri,
                                mask=w1)

            return carry

        jax.lax.fori_loop(0, ngr, grp, 0)


@functools.partial(jax.jit,
                   static_argnames=("eps", "Tpad", "idx16", "interpret"))
def pallas_pack(x, offsets, eps, Tpad, idx16, interpret=False):
    """Exact-size flat pack of ``x (B, K)``: same contract and outputs as
    cd_kernel.pack_flat ((Tpad,) f32 values + (Tpad,) uint16/int32
    ascending column ids per row segment), built by ragged compaction
    instead of a (B*K)-update scatter.  B must be a multiple of 8, K of
    128, Tpad of 128."""
    B, K = x.shape
    ngr = K // GR
    kernel = functools.partial(_pack_kernel, ngr, Tpad, float(eps))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // RB,),
        in_specs=[pl.BlockSpec((RB * ngr, GR), lambda i, *_: (i, 0))],
        out_specs=[
            pl.BlockSpec((Tpad // GR, GR), lambda i, *_: (0, 0)),
            pl.BlockSpec((Tpad // GR, GR), lambda i, *_: (0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((ngr, GR), F32),
                        pltpu.VMEM((ngr, GR), F32)],
    )
    vals2d, idx2d = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Tpad // GR, GR), F32),
            jax.ShapeDtypeStruct((Tpad // GR, GR), F32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            # the out blocks accumulate across steps (masked ragged
            # stores): the grid must be sequential with revisited
            # outputs held in VMEM, not treated as parallelizable
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(offsets.astype(jnp.int32), x.reshape(B * ngr, GR))
    idt = jnp.uint16 if idx16 else jnp.int32
    return vals2d.reshape(-1), idx2d.reshape(-1).astype(idt)


def pack_supported(B: int, K: int, Tpad: int) -> bool:
    """Shape domain: divisibility plus the whole-array output VMEM bound
    (both out buffers live in VMEM across the grid)."""
    if B % RB or K % GR or Tpad % GR:
        return False
    vmem = (2 * Tpad * 4                  # vals + idx whole buffers
            + 2 * RB * K * 4              # x block, double-buffered
            + 2 * (K // GR) * GR * 4      # scratch (gp + ranks)
            + 3 * GR * GR * 4)            # constants
    return vmem < 80 * 1024 * 1024
