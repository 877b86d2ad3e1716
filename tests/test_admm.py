"""ADMM solver tests against an independent float64 numpy restatement of
the reference iteration (estimate.c:171-214)."""

import numpy as np

from conftest import random_csr
from slim_tpu.config import SlimConfig
from slim_tpu.solvers.admm import RHO, MAXITERS, estimate_model_admm


def oracle_admm(A, l1r, l2r):
    """f64 restatement of the reference ADMM loop (rho/iters hardcoded,
    estimate.c:48-49)."""
    m = A.shape[1]
    T = A.T.astype(np.float64) @ A.astype(np.float64)
    P = np.linalg.inv(T + (l2r + RHO) * np.eye(m))
    Amat = P @ T
    W = np.zeros((m, m))
    C = np.zeros((m, m))
    for _ in range(MAXITERS):
        V = RHO * W - C
        Tm = P @ V + Amat
        gamma = np.diag(Tm) / np.diag(P)
        B = Tm - P * gamma[None, :]
        alpha = B + C / RHO
        kappa = l1r / RHO
        soft = np.maximum(alpha - kappa, 0) - np.maximum(-alpha - kappa, 0)
        W = np.maximum(soft, 0.0)
        C = C + RHO * (B - W)
    return W


def test_admm_matches_oracle(rng):
    mat = random_csr(rng, 40, 12, density=0.35)
    A = mat.to_dense()
    model, _ = estimate_model_admm(mat, SlimConfig(l1r=1.0, l2r=1.0,
                                                   algo="admm"))
    W_ref = oracle_admm(A, 1.0, 1.0)
    W_ours = model.to_scipy().toarray()
    # reference keeps strictly-positive entries only (estimate.c:241)
    W_ref = np.where(W_ref > 0, W_ref, 0)
    # f32 through 30 iterations with rho=1e4 amplification accumulates
    # ~1e-3-level absolute noise vs the f64 oracle; require elementwise
    # agreement at that level plus near-identical aggregate fit
    np.testing.assert_allclose(W_ours, W_ref, atol=2e-2)

    def fit(W):
        R = A.astype(np.float64) - A.astype(np.float64) @ W
        return np.sum(R * R)

    assert abs(fit(W_ours) - fit(W_ref)) < 1e-3 * max(fit(W_ref), 1.0)


def test_admm_f64_parity_mode(rng):
    """admm_solve (f32, device) vs admm_solve_f64 (numpy, CPU) agreement
    -- the f64-on-CPU parity mode asked for in SURVEY §7 step 6."""
    from slim_tpu.solvers.admm import admm_solve, admm_solve_f64

    mat = random_csr(rng, 45, 14, density=0.35)
    A = mat.to_dense().astype(np.float64)
    npad = 16
    T = np.zeros((npad, npad), np.float32)
    T[:14, :14] = (A.T @ A).astype(np.float32)
    W32, err, obj = admm_solve(T, 0.8, 1.2, 14)
    W64 = admm_solve_f64(T, 0.8, 1.2, 14)
    np.testing.assert_allclose(np.asarray(W32), W64, atol=2e-2)
    assert float(obj) >= float(err) > 0.0


def test_admm_stats_have_loss(rng):
    """CLI `-algo=admm` must print a real objective (round-1 gap: stats
    carried only nnz/density so loss printed as 0)."""
    mat = random_csr(rng, 40, 12, density=0.35)
    model, stats = estimate_model_admm(mat, SlimConfig(l1r=1.0, l2r=1.0,
                                                       algo="admm"))
    A = mat.to_dense().astype(np.float64)
    W = model.to_scipy().toarray()
    R = A - A @ W
    err_ref = 0.5 * np.sum(R * R)
    obj_ref = err_ref + 0.5 * 1.0 * np.sum(W * W) + 1.0 * np.sum(np.abs(W))
    assert stats["loss"] > 0
    np.testing.assert_allclose(stats["fit"], err_ref, rtol=5e-3, atol=1e-2)
    np.testing.assert_allclose(stats["loss"], obj_ref, rtol=5e-3, atol=1e-2)


def test_admm_zero_diagonal(rng):
    mat = random_csr(rng, 50, 15, density=0.3)
    model, _ = estimate_model_admm(mat, SlimConfig(l1r=0.5, l2r=2.0,
                                                   algo="admm"))
    W = model.to_scipy().toarray()
    # the gamma correction drives the diagonal to ~0; after the >0 filter it
    # must be exactly 0 within f32 noise
    assert np.all(np.abs(np.diag(W)) < 1e-3)
    assert np.all(W >= 0)


def test_admm_vs_cd_similar_quality(rng):
    """Both solvers should produce models with comparable fit on the same
    data (not identical: different algorithms/regularisation handling)."""
    from slim_tpu.solvers.cd import estimate_model_cd

    mat = random_csr(rng, 60, 20, density=0.3)
    cd_model, _ = estimate_model_cd(mat, SlimConfig(l1r=1.0, l2r=1.0))
    admm_model, _ = estimate_model_admm(mat, SlimConfig(l1r=1.0, l2r=1.0,
                                                        algo="admm"))
    A = mat.to_dense().astype(np.float64)

    def fit(W):
        R = A - A @ W
        return np.sum(R * R)

    base = np.sum(A * A)
    assert fit(cd_model.to_scipy().toarray()) < base
    assert fit(admm_model.to_scipy().toarray()) < base
