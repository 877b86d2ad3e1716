"""Pallas CD sweep kernel parity (interpret mode on CPU).

The real-TPU path is exercised by bench.py / the verify flow; these tests
run the kernel through the Pallas interpreter against the XLA reference
kernel on small problems.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from conftest import random_csr
from slim_tpu.ops.cd_kernel import cd_solve_block_ids
from slim_tpu.ops.gram import compute_gram
from slim_tpu.ops.pallas_cd import (CHUNK, pallas_cd_solve, pallas_max_block,
                                    pallas_supported)


def _setup(rng_seed=0, nrows=60, n=20, B=32, l1r=0.3, l2r=0.5):
    rng = np.random.default_rng(rng_seed)
    mat = random_csr(rng, nrows, n, density=0.3, seed=rng_seed)
    npad = ((n + 1 + 127) // 128) * 128
    G = compute_gram(mat, "host", pad_to=npad)
    diag = jnp.diagonal(G)
    csc = mat.transpose()
    caps = np.minimum(50 * csc.row_nnz(), 10000).astype(np.int32)
    J = np.arange(B, dtype=np.int32) % n
    gj = jnp.take(G, jnp.asarray(J), axis=1).T
    cols = jnp.arange(npad, dtype=jnp.int32)
    active = (gj > l1r) & (cols[None, :] != jnp.asarray(J)[:, None])
    yty = jnp.take(diag, jnp.asarray(J))
    x0 = jnp.zeros((B, npad), jnp.float32)
    return (G, gj, diag, active, x0, jnp.asarray(caps[J]), yty, l1r, l2r)


@pytest.mark.parametrize("shuffle", [False, True])
def test_pallas_sweep_matches_xla(shuffle):
    G, gj, diag, active, x0, caps, yty, l1r, l2r = _setup()
    xp, nit_p, rs_p, rn_p, obj_p = pallas_cd_solve(
        G, gj, diag, active, x0, caps, yty, l1r, l2r, 1e-10, 3,
        shuffle=shuffle, interpret=True)
    from slim_tpu.ops.cd_kernel import cd_solve_block
    xx, nit_x, rs_x, rn_x, obj_x = cd_solve_block(
        G, gj, diag, active, x0, caps, yty, l1r, l2r, 1e-10, 3,
        shuffle=shuffle)
    np.testing.assert_allclose(np.asarray(xp), np.asarray(xx), atol=2e-4)
    np.testing.assert_allclose(np.asarray(obj_p), np.asarray(obj_x),
                               rtol=1e-4)


def test_pallas_capacity_model():
    assert pallas_supported(128, 1792)
    assert not pallas_supported(1024, 8192)
    # B capped at 128: (256, K) instances crash this Mosaic toolchain
    # (dispatch_split covers bigger column batches with multiple launches)
    assert not pallas_supported(192, 1792)
    b = pallas_max_block(1792)
    assert b % 32 == 0 and pallas_supported(b, 1792)
    assert pallas_max_block(128) == 128  # cap applies even for tiny npad


def test_pallas_large_v3_matches_xla():
    """Deferred-flush kernel (window corrections + combined q flush) in
    interpret mode vs the XLA reference, across multiple K-windows and
    with inactive (skipped) groups in the middle of a window."""
    from slim_tpu.ops.pallas_cd import (GROUP, K_FLUSH,
                                        pallas_large_v3_supported,
                                        pallas_solve_large_core)
    import jax

    npad = GROUP * 2 * K_FLUSH          # 2 flush windows
    assert pallas_large_v3_supported(32, npad)
    rng = np.random.default_rng(7)
    n = 90
    mat = random_csr(rng, 120, n, density=0.25, seed=7)
    G = compute_gram(mat, "host", pad_to=npad)
    # place extra mass in a far group so actives span several windows
    Gh = np.array(G)
    Gh[GROUP * 3:GROUP * 3 + 8, :32] = 0.9
    Gh[:32, GROUP * 3:GROUP * 3 + 8] = 0.9
    np.fill_diagonal(Gh, np.maximum(np.diagonal(Gh), 1.0))
    G = jnp.asarray(Gh)
    diag = jnp.diagonal(G)
    B = 32
    J = np.arange(B, dtype=np.int32) % n
    gj = jnp.take(G, jnp.asarray(J), axis=1).T
    cols = jnp.arange(npad, dtype=jnp.int32)
    active = (gj > 0.3) & (cols[None, :] != jnp.asarray(J)[:, None])
    yty = jnp.take(diag, jnp.asarray(J))
    x0 = jnp.zeros((B, npad), jnp.float32)
    caps = jnp.full((B,), 200, jnp.int32)

    solve = jax.jit(pallas_solve_large_core, static_argnames=(
        "shuffle", "interpret", "use_v3"))
    # unshuffled: exact-order parity with the XLA chunked kernel
    out_l = solve(G, gj, diag, active, x0, caps, yty, 0.3, 0.5, 1e-10, 5,
                  shuffle=False, interpret=True, use_v3=True)
    from slim_tpu.ops.cd_kernel import cd_solve_block
    out_x = cd_solve_block(G, gj, diag, active, x0, caps, yty,
                           0.3, 0.5, 1e-10, 5, shuffle=False)
    np.testing.assert_allclose(np.asarray(out_l[0]),
                               np.asarray(out_x[0]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_l[4]),
                               np.asarray(out_x[4]), rtol=1e-4)
    # shuffled: v3 must track the eager-flush kernel (identical group
    # perm stream, so the only difference is delta-flush reassociation)
    out_s3 = solve(G, gj, diag, active, x0, caps, yty, 0.3, 0.5, 1e-10, 5,
                   shuffle=True, interpret=True, use_v3=True)
    out_s1 = solve(G, gj, diag, active, x0, caps, yty, 0.3, 0.5, 1e-10, 5,
                   shuffle=True, interpret=True, use_v3=False)
    np.testing.assert_allclose(np.asarray(out_s3[0]),
                               np.asarray(out_s1[0]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_s3[4]),
                               np.asarray(out_s1[4]), rtol=1e-4)


def test_pallas_large_v4_matches_xla():
    """Transposed deferred-flush kernel (v4) in interpret mode: exact-order
    parity with XLA, and shuffled parity with the eager panelized kernel
    (identical perm stream -- differences are reassociation only)."""
    from slim_tpu.ops.pallas_cd import (GROUP, K_FLUSH,
                                        pallas_large_v4_supported,
                                        pallas_solve_large_core)
    import jax

    npad = GROUP * 2 * K_FLUSH
    assert pallas_large_v4_supported(32, npad)
    rng = np.random.default_rng(11)
    n = 90
    mat = random_csr(rng, 120, n, density=0.25, seed=11)
    G = compute_gram(mat, "host", pad_to=npad)
    Gh = np.array(G)
    Gh[GROUP * 3:GROUP * 3 + 8, :32] = 0.9
    Gh[:32, GROUP * 3:GROUP * 3 + 8] = 0.9
    np.fill_diagonal(Gh, np.maximum(np.diagonal(Gh), 1.0))
    G = jnp.asarray(Gh)
    diag = jnp.diagonal(G)
    B = 32
    J = np.arange(B, dtype=np.int32) % n
    gj = jnp.take(G, jnp.asarray(J), axis=1).T
    cols = jnp.arange(npad, dtype=jnp.int32)
    active = (gj > 0.3) & (cols[None, :] != jnp.asarray(J)[:, None])
    yty = jnp.take(diag, jnp.asarray(J))
    x0 = jnp.zeros((B, npad), jnp.float32)
    caps = jnp.full((B,), 200, jnp.int32)

    solve = jax.jit(pallas_solve_large_core, static_argnames=(
        "shuffle", "interpret", "use_v3", "use_v4"))
    out_l = solve(G, gj, diag, active, x0, caps, yty, 0.3, 0.5, 1e-10, 5,
                  shuffle=False, interpret=True, use_v4=True)
    from slim_tpu.ops.cd_kernel import cd_solve_block
    out_x = cd_solve_block(G, gj, diag, active, x0, caps, yty,
                           0.3, 0.5, 1e-10, 5, shuffle=False)
    np.testing.assert_allclose(np.asarray(out_l[0]),
                               np.asarray(out_x[0]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_l[4]),
                               np.asarray(out_x[4]), rtol=1e-4)
    # same visit order, so sweep counts agree up to the bf16 rounding of
    # the deferred-flush propagation dots (the kernel streams a bf16 G
    # copy -- what the MXU consumed at default precision anyway -- which
    # can shift a column's crossing of optTol by a sweep or two)
    assert np.all(np.abs(np.asarray(out_l[1]).astype(np.int64)
                         - np.asarray(out_x[1]).astype(np.int64)) <= 3)
    out_s4 = solve(G, gj, diag, active, x0, caps, yty, 0.3, 0.5, 1e-10, 5,
                   shuffle=True, interpret=True, use_v4=True)
    out_s1 = solve(G, gj, diag, active, x0, caps, yty, 0.3, 0.5, 1e-10, 5,
                   shuffle=True, interpret=True, use_v3=False, use_v4=False)
    np.testing.assert_allclose(np.asarray(out_s4[0]),
                               np.asarray(out_s1[0]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_s4[4]),
                               np.asarray(out_s1[4]), rtol=1e-4)


def test_pallas_large_kernel_matches_xla():
    """Panelized (HBM-resident x/q) kernel in interpret mode vs XLA."""
    from slim_tpu.ops.pallas_cd import pallas_solve_large_core, PANEL
    import jax

    # npad must be a PANEL multiple: use 1024 with a 60-column problem
    rng = np.random.default_rng(3)
    mat = random_csr(rng, 80, 60, density=0.25, seed=3)
    npad = PANEL
    G = compute_gram(mat, "host", pad_to=npad)
    diag = jnp.diagonal(G)
    csc = mat.transpose()
    caps = np.minimum(50 * csc.row_nnz(), 10000).astype(np.int32)
    B = 32
    J = np.arange(B, dtype=np.int32) % 60
    gj = jnp.take(G, jnp.asarray(J), axis=1).T
    cols = jnp.arange(npad, dtype=jnp.int32)
    active = (gj > 0.3) & (cols[None, :] != jnp.asarray(J)[:, None])
    yty = jnp.take(diag, jnp.asarray(J))
    x0 = jnp.zeros((B, npad), jnp.float32)
    capsJ = jnp.asarray(caps[J])

    out_l = jax.jit(pallas_solve_large_core, static_argnames=(
        "shuffle", "interpret"))(
        G, gj, diag, active, x0, capsJ, yty, 0.3, 0.5, 1e-10, 5,
        shuffle=False, interpret=True)
    from slim_tpu.ops.cd_kernel import cd_solve_block
    out_x = cd_solve_block(G, gj, diag, active, x0, capsJ, yty,
                           0.3, 0.5, 1e-10, 5, shuffle=False)
    np.testing.assert_allclose(np.asarray(out_l[0]), np.asarray(out_x[0]),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_l[4]), np.asarray(out_x[4]),
                               rtol=1e-4)


def test_v4_denylist_fallback(tmp_path, monkeypatch):
    """A v4 compile failure denylists only the v4 variant for the shape
    (persistently) and retries the block on v3 -- never straight to XLA."""
    from slim_tpu.ops import pallas_cd
    from slim_tpu.solvers import cd as cdmod

    monkeypatch.setenv("SLIM_TPU_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(cdmod, "_pallas_failed_shapes", None)
    monkeypatch.setattr(pallas_cd, "V4_SHAPE_DENYLIST", set())

    shape = (128, 28672)
    assert pallas_cd.pallas_pick_large_variant(*shape) == "v4"

    calls = []

    def run(impl):
        calls.append((impl, pallas_cd.pallas_pick_large_variant(*shape)))
        if len(calls) == 1:
            raise RuntimeError("Mosaic failed to lower: VMEM exceeded")
        return "ok"

    out = cdmod._dispatch_with_fallback(run, "pallas_large", shape)
    assert out == "ok"
    # first attempt picked v4, retry re-picked v3 on the same impl
    assert calls == [("pallas_large", "v4"), ("pallas_large", "v3")]
    assert shape in pallas_cd.V4_SHAPE_DENYLIST
    # the (B, npad) pair must NOT be in the all-kernels-failed set
    assert shape not in cdmod._load_failed_shapes()

    # persistence: a fresh load repopulates the v4 denylist from disk
    monkeypatch.setattr(cdmod, "_pallas_failed_shapes", None)
    monkeypatch.setattr(pallas_cd, "V4_SHAPE_DENYLIST", set())
    cdmod._load_failed_shapes()
    assert shape in pallas_cd.V4_SHAPE_DENYLIST
    assert pallas_cd.pallas_pick_large_variant(*shape) == "v3"

    # a v3 failure on the denylisted shape falls back to XLA and records
    # the plain (B, npad) line
    def run2(impl):
        if impl == "pallas_large":
            raise RuntimeError("Mosaic failed to lower: VMEM exceeded")
        return "xla-ok"

    assert cdmod._dispatch_with_fallback(run2, "pallas_large", shape) \
        == "xla-ok"
    assert shape in cdmod._load_failed_shapes()


def test_pallas_v4_group_pick(monkeypatch):
    """pick_group_v4: the global GROUP by default (group=1024 lost the
    end-to-end A/B to straggler-sweep skipping granularity); a forced
    SLIM_PALLAS_V4_GROUP engages only where the budget/K-window admits
    it."""
    from slim_tpu.ops import pallas_cd as pc

    assert pc.pick_group_v4(4096, 32) == pc.GROUP
    assert pc.pick_group_v4(28672, 512) == pc.GROUP
    monkeypatch.setenv("SLIM_PALLAS_V4_GROUP", "1024")
    assert pc.pick_group_v4(4096, 32) == 1024       # ngroups=4, K=4
    assert pc.pick_group_v4(28672, 512) == 1024     # the ML-20M head shape
    assert pc.pick_group_v4(2048, 32) == pc.GROUP   # ngroups=2 < K window
    assert pc.pick_group_v4(6144, 32) == pc.GROUP   # ngroups=6 % 4 != 0


def test_pallas_large_v4_group1024_matches_xla(monkeypatch):
    """v4 parity at a forced non-default supergroup (group=1024), the
    per-shape layout the SLIM_PALLAS_V4_GROUP A/B knob engages."""
    import jax
    from slim_tpu.ops import pallas_cd as pc
    from slim_tpu.ops.cd_kernel import cd_solve_block

    monkeypatch.setenv("SLIM_PALLAS_V4_GROUP", "1024")
    npad = 4096
    assert pc.pick_group_v4(npad, 32) == 1024
    rng = np.random.default_rng(13)
    n = 90
    mat = random_csr(rng, 120, n, density=0.25, seed=13)
    G = compute_gram(mat, "host", pad_to=npad)
    Gh = np.array(G)
    np.fill_diagonal(Gh, np.maximum(np.diagonal(Gh), 1.0))
    G = jnp.asarray(Gh)
    diag = jnp.diagonal(G)
    B = 32
    J = np.arange(B, dtype=np.int32) % n
    gj = jnp.take(G, jnp.asarray(J), axis=1).T
    cols = jnp.arange(npad, dtype=jnp.int32)
    active = (gj > 0.3) & (cols[None, :] != jnp.asarray(J)[:, None])
    yty = jnp.take(diag, jnp.asarray(J))
    x0 = jnp.zeros((B, npad), jnp.float32)
    caps = jnp.full((B,), 200, jnp.int32)
    # fresh (unjitted-wrapper) trace so the env knob is re-read
    out_l = jax.jit(pc.pallas_solve_large_core, static_argnames=(
        "shuffle", "interpret", "use_v4"))(
        G, gj, diag, active, x0, caps, yty, 0.3, 0.5, 1e-10, 7,
        shuffle=False, interpret=True, use_v4=True)
    out_x = cd_solve_block(G, gj, diag, active, x0, caps, yty,
                           0.3, 0.5, 1e-10, 7, shuffle=False)
    np.testing.assert_allclose(np.asarray(out_l[0]),
                               np.asarray(out_x[0]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_l[4]),
                               np.asarray(out_x[4]), rtol=1e-4)


def test_pallas_pack_interpret_parity(rng):
    """Ragged-compaction pack (ops/pallas_pack.py) == pack_flat: exact
    values, ascending ids, zero tail -- over dense/sparse/empty rows and
    straddling runs, both id dtypes."""
    import jax.numpy as jnp

    from slim_tpu.ops.cd_kernel import pack_flat
    from slim_tpu.ops.pallas_pack import pallas_pack

    for B, K, dens in [(8, 256, 0.3), (16, 384, 0.05), (8, 128, 0.9),
                       (8, 256, 0.0)]:
        x = np.where(rng.random((B, K)) < dens,
                     rng.random((B, K)).astype(np.float32) + 0.5,
                     0.0).astype(np.float32)
        c = (x > 1e-7).sum(axis=1).astype(np.int32)
        off = np.zeros(B, np.int32)
        np.cumsum(c[:-1], out=off[1:])
        T = int(c.sum())
        Tpad = max(1 << max(T - 1, 0).bit_length(), 128)
        xd, offd = jnp.asarray(x), jnp.asarray(off)
        for idx16 in (True, False):
            fv0, fi0 = pack_flat(xd, 1e-7, offd, Tpad, idx16)
            fv1, fi1 = pallas_pack(xd, offd, 1e-7, Tpad, idx16,
                                   interpret=True)
            np.testing.assert_array_equal(np.asarray(fv0), np.asarray(fv1))
            np.testing.assert_array_equal(np.asarray(fi0), np.asarray(fi1))


def test_pallas_pack_supported_domain():
    from slim_tpu.ops.pallas_pack import pack_supported

    assert pack_supported(1024, 28672, 1 << 21)
    assert not pack_supported(1001, 28672, 1 << 21)   # B % 8
    assert not pack_supported(1024, 28700, 1 << 21)   # K % 128
    assert not pack_supported(1024, 28672, 1 << 26)   # VMEM bound
