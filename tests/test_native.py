"""Native C++ runtime (slimrt) tests: build, correctness vs the JAX solver
and the f64 oracle."""

import numpy as np
import pytest

from conftest import random_csr
from slim_tpu import native
from slim_tpu.config import SlimConfig
from slim_tpu.solvers.cd import estimate_model_cd

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def test_native_cd_matches_jax(rng):
    mat = random_csr(rng, 50, 20, density=0.3, seed=55)
    cfg = SlimConfig(l1r=0.5, l2r=0.5, optTol=1e-12, shuffle=False)
    jax_model, jax_stats = estimate_model_cd(mat, cfg)
    nat_model, nat_err, nat_obj = native.cd_learn(
        mat, l1r=0.5, l2r=0.5, optTol=1e-12, shuffle=False)
    np.testing.assert_allclose(nat_model.to_scipy().toarray(),
                               jax_model.to_scipy().toarray(), atol=5e-4)
    np.testing.assert_allclose(nat_obj, jax_stats["loss"], rtol=1e-4)
    np.testing.assert_allclose(nat_err, jax_stats["fit"], rtol=1e-4)


def test_native_cd_implicit(rng):
    mat = random_csr(rng, 40, 15, density=0.3, implicit=True, seed=66)
    nat_model, _, _ = native.cd_learn(mat, l1r=0.3, l2r=0.5, optTol=1e-12,
                                      shuffle=False)
    cfg = SlimConfig(l1r=0.3, l2r=0.5, optTol=1e-12, shuffle=False)
    jax_model, _ = estimate_model_cd(mat, cfg)
    np.testing.assert_allclose(nat_model.to_scipy().toarray(),
                               jax_model.to_scipy().toarray(), atol=5e-4)


def test_native_cd_multithreaded_same_result(rng):
    mat = random_csr(rng, 60, 25, density=0.25, seed=77)
    m1, e1, o1 = native.cd_learn(mat, l1r=0.5, l2r=1.0, optTol=1e-12,
                                 shuffle=False, nthreads=1)
    m4, e4, o4 = native.cd_learn(mat, l1r=0.5, l2r=1.0, optTol=1e-12,
                                 shuffle=False, nthreads=4)
    np.testing.assert_allclose(m1.to_scipy().toarray(),
                               m4.to_scipy().toarray(), atol=1e-6)
    np.testing.assert_allclose(o1, o4, rtol=1e-10)


def test_native_gram(rng):
    mat = random_csr(rng, 30, 12, density=0.4, seed=88)
    g = native.gram_dense(mat, pad_to=16)
    A = mat.to_dense().astype(np.float64)
    expect = A.T @ A
    np.testing.assert_allclose(g[:12, :12], expect, rtol=1e-5)
    assert np.all(g[12:, :] == 0) and np.all(g[:, 12:] == 0)
