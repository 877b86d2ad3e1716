"""Gram-path parity: host SpGEMM vs device scatter-densify vs dense row
blocks, plus the batched union-flag screen against the per-block oracle.

Reference behavior restated: ATy[i] = (AᵀA)[i,j] (estimate.c:411-421), the
active-set screen keeps i with ATy[i] > l1r, i != j (estimate.c:424-430).
"""

import numpy as np
import pytest

from conftest import random_csr
from slim_tpu.ops.cd_kernel import block_union_flags, block_union_mask
from slim_tpu.ops.gram import (compute_gram, gram_device, gram_device_sparse,
                               gram_host)


def test_gram_paths_agree(rng):
    mat = random_csr(rng, 64, 48, density=0.2, implicit=False)
    gh = gram_host(mat, pad_to=128)
    gd = np.asarray(gram_device(mat, pad_to=128))
    gs = np.asarray(gram_device_sparse(mat, pad_to=128, row_block=16))
    np.testing.assert_allclose(gd, gh, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gs, gh, rtol=1e-5, atol=1e-5)


def test_gram_sparse_implicit_exact_counts(rng):
    # implicit data => G holds integer co-occurrence counts, exactly
    mat = random_csr(rng, 200, 60, density=0.15, implicit=True)
    gh = gram_host(mat, pad_to=128)
    gs = np.asarray(gram_device_sparse(mat, pad_to=128, row_block=64))
    assert np.array_equal(gs, gh)
    assert np.array_equal(gs, np.round(gs))


def test_compute_gram_modes(rng):
    mat = random_csr(rng, 50, 30, density=0.3, implicit=False)
    for mode in ("host", "device", "auto"):
        g = np.asarray(compute_gram(mat, mode, pad_to=128))
        np.testing.assert_allclose(g, gram_host(mat, pad_to=128),
                                   rtol=1e-5, atol=1e-5)


def test_union_flags_match_per_block_oracle(rng):
    import jax.numpy as jnp

    mat = random_csr(rng, 120, 100, density=0.12, implicit=False)
    npad, B = 128, 16
    G = jnp.asarray(gram_host(mat, pad_to=npad))
    nblocks = (mat.ncols + B - 1) // B
    l1r = 0.5
    u = np.asarray(block_union_flags(G, nblocks, B, l1r))
    assert u.shape == (nblocks, npad)
    for blk in range(nblocks):
        j_ids = np.minimum(np.arange(blk * B, blk * B + B), npad - 1)
        j_ids[blk * B + np.arange(B) >= mat.ncols] = npad - 1
        S, cnt = block_union_mask(G, jnp.asarray(j_ids), l1r, npad)
        oracle = np.zeros(npad, bool)
        oracle[np.asarray(S)[:int(cnt)]] = True
        assert np.array_equal(u[blk], oracle), f"block {blk}"


def _densify_ref(idsT, valsT, npad):
    """Numpy restatement of the densify contract."""
    W, R = idsT.shape
    out = np.zeros((npad, R), np.float32)
    for w in range(W):
        for r in range(R):
            c = idsT[w, r]
            if c < npad:
                out[c, r] += 1.0 if valsT is None else valsT[w, r]
    return out


def test_pallas_densify_interpret(rng):
    """Interpret-mode parity of the densify kernel: sentinel pads, short
    rows, multiple row/col tiles, binary and valued variants."""
    import jax.numpy as jnp

    from slim_tpu.ops.pallas_gram import RT, densify_meta, pallas_densify

    npad, W, R = 256, 64, 2 * RT
    lens = rng.integers(0, W, R)
    lens[0] = W  # one full row
    idsT = np.full((W, R), npad, np.int32)
    valsT = np.zeros((W, R), np.float32)
    for r in range(R):
        c = np.sort(rng.choice(npad, lens[r], replace=False))
        idsT[:lens[r], r] = c
        valsT[:lens[r], r] = rng.random(lens[r]).astype(np.float32) + 0.5
    ids_d = jnp.asarray(idsT)
    wmax, cmin, cmax = densify_meta(ids_d, npad)
    # binary
    got = np.asarray(pallas_densify(ids_d, None, wmax, cmin, cmax, npad,
                                    out_dtype=jnp.float32, interpret=True))
    np.testing.assert_array_equal(got, _densify_ref(idsT, None, npad))
    # valued
    got = np.asarray(pallas_densify(ids_d, jnp.asarray(valsT), wmax, cmin,
                                    cmax, npad, out_dtype=jnp.float32,
                                    interpret=True))
    np.testing.assert_array_equal(got, _densify_ref(idsT, valsT, npad))


def test_densify_meta_bounds(rng):
    import jax.numpy as jnp

    from slim_tpu.ops.pallas_gram import RT, WCH, densify_meta

    npad, W, R = 128, 64, RT
    idsT = np.full((W, R), npad, np.int32)
    idsT[:3, 5] = [7, 60, 100]
    wmax, cmin, cmax = (np.asarray(x)
                        for x in densify_meta(jnp.asarray(idsT), npad))
    assert wmax[0] == 3
    assert cmin[0, 0] == 7 and cmax[0, 0] == 100
    # all-pad chunks never overlap any tile
    assert (cmin[0, 1:] == npad).all() and (cmax[0, 1:] == -1).all()
    assert cmin.shape == (1, W // WCH)


@pytest.mark.parametrize("implicit", [True, False])
def test_gram_pallas_parity(rng, implicit):
    """gram_device_pallas (interpret mode) == host SpGEMM, including the
    nnz-sorted row permutation, partial blocks, and W bucketing."""
    from slim_tpu.ops.gram import gram_device_pallas

    mat = random_csr(rng, 700, 100, density=0.12, implicit=implicit)
    gh = gram_host(mat, pad_to=128)
    gp = np.asarray(gram_device_pallas(mat, pad_to=128, interpret=True))
    if implicit:
        np.testing.assert_array_equal(gp, gh)   # integer counts: exact
    else:
        np.testing.assert_allclose(gp, gh, rtol=1e-5, atol=1e-5)


def test_gram_pallas_long_row_residual(rng):
    """Rows above W_CAP route through the scatter residual; totals match
    the host oracle."""
    import scipy.sparse as sp

    from slim_tpu.ops import gram as gram_mod
    from slim_tpu.types import CSR

    dense = (rng.random((40, 64)) < 0.1).astype(np.float32)
    dense[3, :] = 1.0   # a 64-nnz power row
    mat = CSR.from_scipy(sp.csr_matrix(dense))
    old_cap = gram_mod.W_CAP
    gram_mod.W_CAP = 32  # force row 3 into the residual path
    try:
        gp = np.asarray(gram_mod.gram_device_pallas(mat, pad_to=128,
                                                    interpret=True))
    finally:
        gram_mod.W_CAP = old_cap
    np.testing.assert_array_equal(gp, gram_host(mat, pad_to=128))
