"""Union-active-set compacted solves (the large-catalogue regime) must be
exactly equivalent to the full-width path."""

import numpy as np

from conftest import random_csr
from slim_tpu.config import SlimConfig
from slim_tpu.solvers.cd import estimate_model_cd


def test_compact_matches_full(rng):
    mat = random_csr(rng, 80, 50, density=0.2, seed=140)
    base = SlimConfig(l1r=0.4, l2r=0.7, optTol=1e-12, block_size=16,
                      shuffle=False)
    full, sf = estimate_model_cd(mat, base.replace(compact_threshold=10**9))
    comp, sc = estimate_model_cd(mat, base.replace(compact_threshold=128))
    np.testing.assert_allclose(comp.to_scipy().toarray(),
                               full.to_scipy().toarray(), atol=5e-4)
    np.testing.assert_allclose(sc["loss"], sf["loss"], rtol=1e-4)
    np.testing.assert_allclose(sc["fit"], sf["fit"], rtol=1e-4)


def test_compact_with_warm_start(rng):
    mat = random_csr(rng, 60, 40, density=0.25, seed=141)
    cfg = SlimConfig(l1r=0.3, l2r=0.5, optTol=1e-12, block_size=16,
                     shuffle=False, compact_threshold=128)
    cold, s_cold = estimate_model_cd(mat, cfg)
    warm, s_warm = estimate_model_cd(mat, cfg, imodel=cold)
    np.testing.assert_allclose(cold.to_scipy().toarray(),
                               warm.to_scipy().toarray(), atol=5e-4)
    assert s_warm["niters"] <= s_cold["niters"]


def test_compact_high_l1_small_unions(rng):
    """With strong l1 the unions collapse to tiny K buckets and the model
    empties -- the compact path must handle near-empty active sets."""
    mat = random_csr(rng, 50, 40, density=0.2, seed=142)
    cfg = SlimConfig(l1r=1e9, l2r=1.0, compact_threshold=128, block_size=16)
    model, stats = estimate_model_cd(mat, cfg)
    assert model.nnz == 0


def test_compact_fslim_matches_full(rng):
    mat = random_csr(rng, 60, 45, density=0.25, seed=150)
    base = SlimConfig(l1r=0.2, l2r=0.5, nnbrs=4, simtype="cos",
                      optTol=1e-12, block_size=16, shuffle=False)
    full, sf = estimate_model_cd(mat, base.replace(compact_threshold=10**9))
    comp, sc = estimate_model_cd(mat, base.replace(compact_threshold=128))
    np.testing.assert_allclose(comp.to_scipy().toarray(),
                               full.to_scipy().toarray(), atol=5e-4)
    np.testing.assert_allclose(sc["loss"], sf["loss"], rtol=1e-4)


def test_packed_harvest_matches_full(rng, monkeypatch):
    """Device-side top-M harvest compaction must reproduce the plain
    full-row fetch exactly (including the >M-entries-per-column fallback,
    exercised with an absurdly small cap)."""
    import slim_tpu.solvers.cd as cdmod

    mat = random_csr(rng, 80, 60, density=0.3, seed=160)
    cfg = SlimConfig(l1r=0.05, l2r=0.2, optTol=1e-10, block_size=16,
                     shuffle=False, compact_threshold=10**9)
    ref, sr = estimate_model_cd(mat, cfg)
    for cap in (8, 2):  # 8: packed path; 2: forces the fallback fetch
        monkeypatch.setattr(cdmod, "HARVEST_TOPM", cap)
        got, sg = estimate_model_cd(mat, cfg)
        np.testing.assert_array_equal(got.to_scipy().toarray(),
                                      ref.to_scipy().toarray())
        assert sg["loss"] == sr["loss"]
