"""mselect: warm-started sweeps, pair lists, and the parallel-grid mode."""

import numpy as np

from conftest import random_csr
from slim_tpu.config import SlimConfig
from slim_tpu.mselect import mselect_grid, mselect_pairs
from slim_tpu.solvers.cd import estimate_grid_cd, estimate_model_cd


def _data(seed=101):
    rng = np.random.default_rng(seed)
    trn = random_csr(rng, 60, 30, density=0.25, seed=seed)
    tst = random_csr(rng, 60, 30, density=0.05, seed=seed + 1)
    return trn, tst


def test_mselect_pairs_tracks_best():
    trn, tst = _data()
    cfg = SlimConfig(optTol=1e-8, nrcmds=5)
    res = mselect_pairs(trn, tst, cfg, [(0.1, 0.5), (5.0, 0.5)])
    assert len(res["results"]) == 2
    # heavier l1 => sparser model
    assert res["results"][1]["nnz"] < res["results"][0]["nnz"]
    hrs = [r["hr"] for r in res["results"]]
    assert res["bestHRHR"] == max(hrs)


def test_grid_cd_matches_individual_solves():
    """The packed multi-point solve must equal point-by-point solves."""
    trn, _ = _data(7)
    cfg = SlimConfig(optTol=1e-12, block_size=16, shuffle=False)
    points = [(0.2, 0.5), (1.0, 2.0), (3.0, 0.1)]
    packed = estimate_grid_cd(trn, cfg, points)
    for (l1, l2), (model, stats) in zip(points, packed):
        solo, solo_stats = estimate_model_cd(
            trn, cfg.replace(l1r=l1, l2r=l2))
        np.testing.assert_allclose(model.to_scipy().toarray(),
                                   solo.to_scipy().toarray(), atol=5e-4,
                                   err_msg=f"point ({l1},{l2})")
        np.testing.assert_allclose(stats["loss"], solo_stats["loss"],
                                   rtol=1e-4)


def test_parallel_grid_matches_sequential():
    trn, tst = _data(13)
    cfg = SlimConfig(optTol=1e-10, nrcmds=5, block_size=16, shuffle=False)
    seq = mselect_grid(trn, tst, cfg, [0.2, 1.0], [0.5], parallel=False)
    par = mselect_grid(trn, tst, cfg, [0.2, 1.0], [0.5], parallel=True)
    for rs, rp in zip(seq["results"], par["results"]):
        assert rs["l1r"] == rp["l1r"] and rs["l2r"] == rp["l2r"]
        np.testing.assert_allclose(rs["hr"], rp["hr"], atol=1e-6)
        assert abs(rs["nnz"] - rp["nnz"]) <= max(2, 0.01 * rs["nnz"])
    assert par["bestl1HR"] == seq["bestl1HR"]

def test_mesh_mselect_matches_single_device():
    """mesh= runs every point's solves distributed with ONE shared psum'd
    Gram and preserved warm starts; results must match the single-device
    sweep (same screening/caps => same models up to f32 order)."""
    from slim_tpu.parallel.mesh import make_mesh

    trn, tst = _data(29)
    cfg = SlimConfig(optTol=1e-9, nrcmds=5, block_size=8, shuffle=False)
    pairs = [(0.2, 0.5), (1.0, 0.5)]
    solo = mselect_pairs(trn, tst, cfg, pairs)
    dist = mselect_pairs(trn, tst, cfg, pairs, mesh=make_mesh(8))
    for rs, rd in zip(solo["results"], dist["results"]):
        assert rs["l1r"] == rd["l1r"]
        np.testing.assert_allclose(rs["hr"], rd["hr"], atol=1e-6)
        np.testing.assert_allclose(rs["arhr"], rd["arhr"], atol=1e-6)
        assert abs(rs["nnz"] - rd["nnz"]) <= max(2, 0.01 * rs["nnz"])
    assert solo["bestl1HR"] == dist["bestl1HR"]
