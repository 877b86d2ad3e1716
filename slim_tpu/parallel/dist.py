"""SPMD distributed learning and prediction over a device mesh.

TPU-native replacement for the reference's OpenMP shared-memory fan-out
(estimate.c:371-403).  Data layout and collectives:

* the rating matrix is row(user)-sharded over ``dp``; each device computes
  a partial Gram ``A_shardᵀ A_shard`` on its MXU and a single
  ``psum('dp')`` produces the full G everywhere (the only inter-device
  traffic of the learn phase, riding ICI);
* item columns are sharded over the flattened (dp, mp) grid; each device
  runs the batched CD kernel on its own column block -- zero communication,
  mirroring the embarrassing parallelism of the reference;
* results are reassembled by the out-sharding (an all-gather only if the
  caller asks for a replicated model).

For models too large to replicate G (≈ >100k items), G itself must be
column-sharded and active-set rows exchanged per block; that variant is
tracked in parallel/ROADMAP (round-2 work).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 promotes shard_map to the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..ops.cd_kernel import cd_solve_block
from ..types import CSR


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# --------------------------------------------------------------------- #
# sharded Gram
# --------------------------------------------------------------------- #
def make_sharded_gram(mesh: Mesh):
    """Returns a jitted fn: (A_blk row-sharded over dp) -> G replicated."""

    def gram(a):
        g_part = jnp.dot(a.T, a, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        return jax.lax.psum(g_part, "dp")

    fn = shard_map(gram, mesh=mesh, in_specs=(P("dp", None),),
                   out_specs=P(None, None))
    return jax.jit(fn)


# --------------------------------------------------------------------- #
# sharded CD solve
# --------------------------------------------------------------------- #
def make_sharded_solve(mesh: Mesh, l1r: float, l2r: float, optTol: float,
                       shuffle: bool = True):
    """Returns a jitted fn solving a super-block of columns sharded over the
    flattened (dp, mp) grid.

    Inputs (global shapes): G (n, n) replicated; J (S,) caps (S,) x0 (S, n)
    sharded over ('dp','mp'); seed scalar.  S = dp*mp*B.
    Outputs: x (S, n), niters (S,), rstatus (S,), rnorm (S,), obj (S,)
    sharded the same way.
    """

    def solve(g, j_ids, caps, x0, seed):
        n = g.shape[0]
        diag = jnp.diagonal(g)
        gj = jnp.take(g, j_ids, axis=1).T                      # (B, n)
        cols = jnp.arange(n, dtype=j_ids.dtype)
        active = (gj > l1r) & (cols[None, :] != j_ids[:, None])
        yty = jnp.take(diag, j_ids)
        # distinct seed per device so nothing depends on shard layout only
        seed_local = seed + jax.lax.axis_index("dp") * 131071 \
            + jax.lax.axis_index("mp") * 8191
        return cd_solve_block(g, gj, diag, active, x0, caps, yty,
                              l1r, l2r, optTol, seed_local, shuffle=shuffle)

    fn = shard_map(
        solve, mesh=mesh,
        in_specs=(P(None, None), P(("dp", "mp")), P(("dp", "mp")),
                  P(("dp", "mp"), None), P()),
        out_specs=(P(("dp", "mp"), None), P(("dp", "mp")), P(("dp", "mp")),
                   P(("dp", "mp")), P(("dp", "mp"))),
        check_vma=False)
    return jax.jit(fn)


# --------------------------------------------------------------------- #
# one fused learn step (used by __graft_entry__.dryrun_multichip)
# --------------------------------------------------------------------- #
def sharded_learn_step(mesh: Mesh, l1r=1.0, l2r=1.0, optTol=1e-7,
                       shuffle=True):
    """A single SPMD training step: psum-Gram + column-block CD solve.

    This is the full multi-chip compute graph of one learn round in one
    compiled program (gram collective + independent solves), suitable for
    compile-validation on a virtual mesh.
    """

    def step(a_blk, j_ids, caps, seed):
        g_part = jnp.dot(a_blk.T, a_blk, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        g = jax.lax.psum(g_part, "dp")                  # collective 1: psum
        n = g.shape[0]
        diag = jnp.diagonal(g)
        gj = jnp.take(g, j_ids, axis=1).T
        cols = jnp.arange(n, dtype=j_ids.dtype)
        active = (gj > l1r) & (cols[None, :] != j_ids[:, None])
        yty = jnp.take(diag, j_ids)
        x0 = jnp.zeros_like(gj)
        x, niters, rstatus, rnorm, obj = cd_solve_block(
            g, gj, diag, active, x0, caps, yty, l1r, l2r, optTol,
            seed, shuffle=shuffle)
        # collective 2: every device sees the whole solved super-block
        x_all = jax.lax.all_gather(x, ("dp", "mp"), tiled=True)
        return x_all, jnp.sum(rnorm), jnp.sum(obj)

    fn = shard_map(
        step, mesh=mesh,
        in_specs=(P("dp", None), P(("dp", "mp")), P(("dp", "mp")), P()),
        out_specs=(P(None, None), P(), P()),
        check_vma=False)
    return jax.jit(fn)


# --------------------------------------------------------------------- #
# host-level distributed learn
# --------------------------------------------------------------------- #
def distributed_learn(train: CSR, cfg, mesh: Mesh, imodel: CSR | None = None):
    """Learn a model across all devices of ``mesh``.

    Returns (model CSR, stats).  Matches the single-device
    ``estimate_model_cd`` result (same optimum; identical screening and
    caps), validated by tests/test_dist.py on a virtual CPU mesh.
    ``imodel`` warm-starts the solves (estimate.c:453-471 semantics: only
    screened-active coordinates inherit the previous value).
    """
    from ..solvers.cd import EPSILON

    train = train.infer_ncols()
    n = train.ncols
    ndev = mesh.size
    B = int(cfg.block_size)
    S = ndev * B
    npad = _round_up(n + 1, 128)

    # densify + row-pad to a dp multiple (zero rows contribute nothing)
    dp = mesh.shape["dp"]
    nrows_pad = _round_up(max(train.nrows, dp), dp)
    A = np.zeros((nrows_pad, npad), dtype=np.float32)
    rows = np.repeat(np.arange(train.nrows),
                     train.row_nnz().astype(np.int64))
    A[rows, train.indices] = train.values()
    a_dev = jax.device_put(
        A, NamedSharding(mesh, P("dp", None)))

    gram_fn = make_sharded_gram(mesh)
    g = gram_fn(a_dev)

    solve_fn = make_sharded_solve(mesh, float(cfg.l1r), float(cfg.l2r),
                                  float(cfg.optTol), shuffle=cfg.shuffle)

    csc = train.transpose()
    nnz_col = csc.row_nnz().astype(np.int64)
    col_caps = np.minimum(50 * nnz_col, cfg.maxniters).astype(np.int32)
    order = np.argsort(-nnz_col, kind="stable").astype(np.int32)

    out_cols = [None] * n
    total_err = total_obj = 0.0
    shard_spec = NamedSharding(mesh, P(("dp", "mp")))
    shard_spec2 = NamedSharding(mesh, P(("dp", "mp"), None))

    imodel_csc = imodel.transpose() if imodel is not None else None

    for s0 in range(0, n, S):
        J = order[s0:s0 + S]
        Jpad = np.full(S, npad - 1, dtype=np.int32)
        Jpad[:len(J)] = J
        caps = np.zeros(S, dtype=np.int32)
        caps[:len(J)] = col_caps[J]
        j_dev = jax.device_put(Jpad, shard_spec)
        c_dev = jax.device_put(caps, shard_spec)
        x0_host = np.zeros((S, npad), np.float32)
        if imodel_csc is not None:
            for b, j in enumerate(J):
                lo = int(imodel_csc.indptr[j])
                hi = int(imodel_csc.indptr[j + 1])
                x0_host[b, imodel_csc.indices[lo:hi]] = \
                    imodel_csc.values()[lo:hi]
        x0 = jax.device_put(x0_host, shard_spec2)
        x, niters, rstatus, rnorm, obj = solve_fn(
            g, j_dev, c_dev, x0, int(cfg.seed) + s0)
        x_host = np.asarray(x)[:len(J), :n]
        total_err += float(np.asarray(rnorm)[:len(J)].sum())
        total_obj += float(np.asarray(obj)[:len(J)].sum())
        for b, j in enumerate(J):
            nz = np.nonzero(np.abs(x_host[b]) > EPSILON)[0]
            out_cols[j] = (nz.astype(np.int32), x_host[b, nz])

    coord, target, vals = [], [], []
    for j in range(n):
        nz, xv = out_cols[j]
        coord.append(nz)
        target.append(np.full(len(nz), j, np.int32))
        vals.append(xv)
    model = CSR.from_ijv(
        np.concatenate(coord) if coord else np.zeros(0, np.int32),
        np.concatenate(target) if target else np.zeros(0, np.int32),
        np.concatenate(vals) if vals else np.zeros(0, np.float32),
        nrows=n, ncols=n)
    stats = {"loss": total_obj, "fit": total_err, "nnz": model.nnz,
             "ndevices": ndev}
    return model, stats


# --------------------------------------------------------------------- #
# sharded predict
# --------------------------------------------------------------------- #
def make_sharded_predict(mesh: Mesh, nrcmds: int):
    """Users sharded over the flattened grid, W replicated; per-shard
    score + top-k (predict.c semantics, see slim_tpu.predict)."""

    def score(w, hidx, hval):
        npad = w.shape[0]
        safe = jnp.where(hidx >= 0, hidx, npad - 1)
        rows = w[safe]
        scores = jnp.einsum("uh,uhn->un", hval, rows)
        u = hidx.shape[0]
        mask = jnp.zeros((u, npad), bool).at[
            jnp.arange(u)[:, None], safe].max(hidx >= 0)
        scores = jnp.where(mask, -jnp.inf, scores)
        ncand = jnp.sum(scores > 0, axis=1)
        top_sc, top_id = jax.lax.top_k(scores, nrcmds)
        counts = jnp.minimum(ncand, nrcmds).astype(jnp.int32)
        valid = jnp.arange(nrcmds)[None, :] < counts[:, None]
        return (jnp.where(valid, top_id, -1).astype(jnp.int32),
                jnp.where(valid, top_sc, 0.0), counts)

    fn = shard_map(
        score, mesh=mesh,
        in_specs=(P(None, None), P(("dp", "mp"), None), P(("dp", "mp"), None)),
        out_specs=(P(("dp", "mp"), None), P(("dp", "mp"), None),
                   P(("dp", "mp"))),
        check_vma=False)
    return jax.jit(fn)


def sharded_predict(model: CSR, hist: CSR, mesh: Mesh, nrcmds: int = 10):
    from ..predict import densify_model

    n = max(model.nrows, model.ncols, hist.ncols)
    npad = _round_up(n + 1, 128)
    W = densify_model(model, npad)
    ndev = mesh.size
    nusers = hist.nrows
    upad = _round_up(max(nusers, ndev), ndev)
    H = max(int(hist.row_nnz().max()) if nusers else 1, 1)
    hidx = np.full((upad, H), -1, np.int32)
    hval = np.zeros((upad, H), np.float32)
    hi, hv = hist.padded_rows(width=H)
    hidx[:nusers] = np.where(hi >= n, -1, hi)
    hval[:nusers] = hv if hist.data is not None else (hidx[:nusers] >= 0)

    fn = make_sharded_predict(mesh, nrcmds)
    spec = NamedSharding(mesh, P(("dp", "mp"), None))
    ids, scores, counts = fn(W, jax.device_put(hidx, spec),
                             jax.device_put(hval, spec))
    return (np.asarray(ids)[:nusers], np.asarray(scores)[:nusers],
            np.asarray(counts)[:nusers])
