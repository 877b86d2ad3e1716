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
