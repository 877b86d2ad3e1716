"""Multi-device SPMD tests on the virtual 8-device CPU mesh
(conftest forces xla_force_host_platform_device_count=8)."""

import jax
import numpy as np
import pytest

from conftest import random_csr
from slim_tpu.config import SlimConfig
from slim_tpu.parallel.mesh import make_mesh, default_mesh_shape
from slim_tpu.parallel.dist import (distributed_learn, sharded_learn_step,
                                    sharded_predict)
from slim_tpu.predict import predict_topn
from slim_tpu.solvers.cd import estimate_model_cd


def test_mesh_shapes():
    assert default_mesh_shape(8) == (2, 4)
    assert default_mesh_shape(4) == (2, 2)
    assert default_mesh_shape(1) == (1, 1)
    assert default_mesh_shape(6) == (2, 3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_distributed_matches_single_device(rng):
    mat = random_csr(rng, 64, 40, density=0.25, seed=77)
    cfg = SlimConfig(l1r=0.5, l2r=0.5, optTol=1e-12, block_size=8,
                     shuffle=False)
    mesh = make_mesh(8)
    dist_model, dist_stats = distributed_learn(mat, cfg, mesh)
    single_model, single_stats = estimate_model_cd(mat, cfg)
    np.testing.assert_allclose(dist_model.to_scipy().toarray(),
                               single_model.to_scipy().toarray(), atol=5e-4)
    np.testing.assert_allclose(dist_stats["fit"], single_stats["fit"],
                               rtol=1e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_learn_step_compiles_and_runs():
    mesh = make_mesh(8)
    step = sharded_learn_step(mesh, l1r=0.5, l2r=0.5)
    npad, B = 128, 2
    S = 8 * B
    rng = np.random.default_rng(0)
    a = (rng.random((16, npad)) < 0.3).astype(np.float32)
    a[:, 100:] = 0
    j = np.arange(S, dtype=np.int32)
    caps = np.full(S, 50, dtype=np.int32)
    x_all, err, obj = step(a, j, caps, 0)
    assert x_all.shape == (S, npad)
    assert np.isfinite(float(err)) and np.isfinite(float(obj))
    x_host = np.asarray(x_all)
    assert np.all(x_host >= 0)
    # zero-diagonal: column b never uses coordinate j[b]
    for b in range(S):
        assert x_host[b, j[b]] == 0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_blockwise_matches_single_device(rng):
    """G-free blockwise mode vs the single-device solver (exact same
    screening/caps => same optimum)."""
    from slim_tpu.parallel.dist import distributed_learn_blockwise

    mat = random_csr(rng, 64, 40, density=0.25, seed=78)
    cfg = SlimConfig(l1r=0.5, l2r=0.5, optTol=1e-12, block_size=8,
                     shuffle=False)
    mesh = make_mesh(8)
    bw_model, bw_stats = distributed_learn_blockwise(mat, cfg, mesh)
    single_model, single_stats = estimate_model_cd(mat, cfg)
    np.testing.assert_allclose(bw_model.to_scipy().toarray(),
                               single_model.to_scipy().toarray(), atol=5e-4)
    np.testing.assert_allclose(bw_stats["fit"], single_stats["fit"],
                               rtol=1e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_blockwise_100k_items_no_dense_g(rng):
    """The >100k-item regime (round-1 weakness #4): G would be 68GB dense;
    the blockwise mode never materializes it.  Quality checked against the
    native reference oracle."""
    from slim_tpu.parallel.dist import distributed_learn_blockwise
    from slim_tpu import native

    nrows, ncols, nnz = 1500, 100_001, 60_000
    r = np.random.default_rng(3)
    users = r.integers(0, nrows, nnz)
    # catalogue is 100k+ items but activity concentrates on ~1.5k of them
    # (real long-tail shape); empty tail columns are skipped exactly
    items = (r.zipf(1.2, nnz * 2) % 1500)[:nnz] * 67 % ncols
    from slim_tpu.types import CSR
    mat = CSR.from_ijv(users, items, np.ones(nnz, np.float32),
                       nrows, ncols).binarize()
    cfg = SlimConfig(l1r=0.5, l2r=0.5, block_size=16, shuffle=False)
    mesh = make_mesh(8)
    model, stats = distributed_learn_blockwise(mat, cfg, mesh)
    assert model.nnz > 0 and stats["loss"] > 0
    if native.available():
        _, _, obj = native.cd_learn(mat, l1r=0.5, l2r=0.5, optTol=1e-7,
                                    maxniters=10000, nthreads=0)
        np.testing.assert_allclose(stats["loss"], obj, rtol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_blockwise_fslim(rng, monkeypatch):
    # force a multi-chunk memory-bounded screen (the FSLIM
    # top-k path must be exact across chunk boundaries)
    monkeypatch.setenv("SLIM_SCREEN_BYTES", str(128 * 300 * 4))
    from slim_tpu.parallel.dist import distributed_learn_blockwise

    mat = random_csr(rng, 60, 30, density=0.3, seed=79)
    cfg = SlimConfig(l1r=0.2, l2r=0.5, nnbrs=3, simtype="cos",
                     block_size=4, shuffle=False)
    mesh = make_mesh(8)
    bw_model, _ = distributed_learn_blockwise(mat, cfg, mesh)
    single_model, _ = estimate_model_cd(mat, cfg)
    np.testing.assert_allclose(bw_model.to_scipy().toarray(),
                               single_model.to_scipy().toarray(), atol=5e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_predict_matches_single(rng):
    mat = random_csr(rng, 50, 30, density=0.3, seed=5)
    cfg = SlimConfig(l1r=0.3, l2r=0.5)
    model, _ = estimate_model_cd(mat, cfg)
    mesh = make_mesh(8)
    ids_d, sc_d, ct_d = sharded_predict(model, mat, mesh, nrcmds=5)
    ids_s, sc_s, ct_s = predict_topn(model, mat, nrcmds=5)
    np.testing.assert_array_equal(ct_d, ct_s)
    np.testing.assert_allclose(sc_d, sc_s, rtol=1e-5)


def test_blockwise_chunked_screen_matches(rng, monkeypatch):
    """The memory-bounded screen (union flags accumulated over column
    chunks, gj rows read from the compact Gram) must reproduce the
    full-width screen exactly.  Forces multiple chunks per superblock by
    shrinking the per-device ATY byte budget."""
    import slim_tpu.parallel.dist as dist

    # 300 items, Bsup = 8 dev * 32 = 256 -> first superblock has nJ=256
    # targets; budget of 128 columns -> 2 screen chunks per superblock
    mat = random_csr(rng, 96, 300, density=0.18, seed=79)
    mesh = make_mesh(8)
    cfg2 = SlimConfig(l1r=0.5, l2r=0.5, optTol=1e-12, block_size=32,
                      shuffle=False)
    monkeypatch.setenv("SLIM_SCREEN_BYTES", str(128 * 384 * 4))
    bw_model, _ = dist.distributed_learn_blockwise(mat, cfg2, mesh)
    single_model, _ = estimate_model_cd(mat, cfg2)
    np.testing.assert_allclose(bw_model.to_scipy().toarray(),
                               single_model.to_scipy().toarray(), atol=5e-4)


def test_sharded_g_matches_single_device(rng):
    """Resident column-sharded-G mode (ROADMAP #2): G computed once,
    sharded over the grid; per-superblock flags and G[S,S] gathered from
    it.  Must equal the single-device solver exactly."""
    from slim_tpu.parallel.dist import distributed_learn_sharded_g

    mat = random_csr(rng, 96, 300, density=0.18, seed=81)
    cfg = SlimConfig(l1r=0.5, l2r=0.5, optTol=1e-12, block_size=16,
                     shuffle=False)
    mesh = make_mesh(8)
    sg_model, sg_stats = distributed_learn_sharded_g(mat, cfg, mesh)
    single_model, single_stats = estimate_model_cd(mat, cfg)
    assert sg_stats["mode"] == "sharded_g"
    np.testing.assert_allclose(sg_model.to_scipy().toarray(),
                               single_model.to_scipy().toarray(), atol=5e-4)
    np.testing.assert_allclose(sg_stats["fit"], single_stats["fit"],
                               rtol=1e-3)


def test_sharded_predict_coo_matches_single(rng, monkeypatch):
    """Sparse (COO) sharded predict vs the single-device path, forced at
    a small catalogue via the env threshold."""
    from slim_tpu.parallel.dist import sharded_predict
    from slim_tpu.parallel.mesh import make_mesh
    from slim_tpu.predict import predict_topn

    monkeypatch.setenv("SLIM_PREDICT_COO_NPAD", "1")
    model = random_csr(rng, 50, 50, density=0.2, seed=300)
    hist = random_csr(rng, 37, 50, density=0.2, seed=301)
    mesh = make_mesh(len(jax.devices()))
    si, ssc, sc = sharded_predict(model, hist, mesh, nrcmds=6)
    di, dsc, dc = predict_topn(model, hist, nrcmds=6, sparse=True,
                               scan=False)
    np.testing.assert_array_equal(dc, sc)
    for u in range(hist.nrows):
        k = dc[u]
        assert set(di[u][:k]) == set(si[u][:k]), u
        np.testing.assert_allclose(np.sort(dsc[u][:k]), np.sort(ssc[u][:k]),
                                   rtol=1e-5, atol=1e-6)


def test_blockwise_warm_start_matches_single(rng):
    """Warm-started distributed blockwise learn must match the warm-started
    single-device solver (same imodel mapping into each block's compact
    space)."""
    from slim_tpu.parallel.dist import distributed_learn_blockwise

    trn = random_csr(rng, 60, 40, density=0.15, implicit=True, seed=310)
    cfg = SlimConfig(l1r=0.3, l2r=0.3, block_size=4, shuffle=False)
    base, _ = estimate_model_cd(trn, cfg)
    # warm start from a perturbed copy of the base model
    im = base
    cfg2 = cfg.replace(l1r=0.4)
    ms, ss = estimate_model_cd(trn, cfg2, imodel=im)
    mesh = make_mesh(len(jax.devices()))
    md, sd = distributed_learn_blockwise(trn, cfg2, mesh, imodel=im)
    assert abs(ss["loss"] - sd["loss"]) <= 1e-4 * max(abs(ss["loss"]), 1.0)
    assert ms.nnz == md.nnz
