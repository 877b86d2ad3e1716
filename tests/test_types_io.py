import numpy as np
import pytest

from conftest import random_csr, reference_data_available, REFERENCE_TEST_DIR
from slim_tpu.types import CSR
from slim_tpu.io import (read_matrix, write_matrix, read_csr, write_csr,
                         read_ijv, write_ijv, read_cluto, write_cluto,
                         read_binrow, write_binrow)


def test_csr_roundtrip_scipy(rng):
    mat = random_csr(rng, 20, 15, density=0.3)
    sp = mat.to_scipy()
    back = CSR.from_scipy(sp)
    assert back == mat


def test_transpose_is_sorted(rng):
    mat = random_csr(rng, 30, 25, density=0.2)
    t = mat.transpose()
    assert t.shape == (25, 30)
    for c in range(25):
        s, e = t.indptr[c], t.indptr[c + 1]
        idx = t.indices[s:e]
        assert np.all(np.diff(idx) > 0), "row ids within a column must be sorted"
    # transpose of transpose round-trips
    assert np.allclose(t.transpose().to_dense(), mat.to_dense())


def test_column_norms(rng):
    mat = random_csr(rng, 12, 9, density=0.4)
    dense = mat.to_dense().astype(np.float64)
    expect = np.linalg.norm(dense, axis=0)
    np.testing.assert_allclose(mat.column_norms(), expect, rtol=1e-5)


def test_implicit_values():
    mat = CSR.from_ijv([0, 0, 1], [0, 2, 1], [5.0, 3.0, 2.0], 2, 3).binarize()
    assert mat.data is None
    np.testing.assert_array_equal(mat.values(), [1, 1, 1])
    dense = mat.to_dense()
    np.testing.assert_array_equal(dense, [[1, 0, 1], [0, 1, 0]])


def test_padded_rows(rng):
    mat = random_csr(rng, 8, 10, density=0.35)
    idx, val = mat.padded_rows()
    dense = np.zeros((8, 10), np.float32)
    for r in range(8):
        for k in range(idx.shape[1]):
            if idx[r, k] >= 0:
                dense[r, idx[r, k]] = val[r, k]
    np.testing.assert_allclose(dense, mat.to_dense())


def test_infer_ncols():
    mat = CSR.from_ijv([0, 1], [4, 7], [1.0, 1.0], nrows=2, ncols=0)
    assert mat.infer_ncols().ncols == 8


@pytest.mark.parametrize("fmt", ["csr", "cluto", "ijv", "binrow"])
def test_format_roundtrip(tmp_path, rng, fmt):
    mat = random_csr(rng, 15, 12, density=0.3)
    path = str(tmp_path / f"mat.{fmt}")
    write_matrix(mat, path, fmt=fmt)
    back = read_matrix(path, fmt=fmt)
    assert back.nrows == mat.nrows
    # text formats infer ncols from max index; compare dense content
    np.testing.assert_allclose(back.to_dense()[:, :mat.ncols],
                               mat.to_dense(), rtol=1e-4)


def test_csrnv_roundtrip(tmp_path, rng):
    mat = random_csr(rng, 10, 8, density=0.3, implicit=True)
    path = str(tmp_path / "mat.csrnv")
    write_matrix(mat, path, fmt="csrnv")
    back = read_matrix(path, fmt="csrnv")
    assert back.data is None
    np.testing.assert_array_equal(back.to_dense(), mat.to_dense()[:, :back.ncols])


def test_binrow_exact(tmp_path, rng):
    mat = random_csr(rng, 10, 9, density=0.25)
    path = str(tmp_path / "m.bin")
    write_binrow(mat, path)
    back = read_binrow(path)
    assert back == mat


@pytest.mark.skipif(not reference_data_available(),
                    reason="reference test data not mounted")
def test_read_reference_datasets():
    auto = read_matrix(f"{REFERENCE_TEST_DIR}/AutomotiveTrain.ijv", fmt="ijv")
    assert auto.nnz == 17545
    ml_train = read_matrix(f"{REFERENCE_TEST_DIR}/ml100k-train.csr", fmt="csr")
    assert ml_train.nrows == 934
    cluto = read_matrix(f"{REFERENCE_TEST_DIR}/ml100k.cluto", fmt="cluto")
    assert cluto.shape == (943, 1682)
    assert cluto.nnz == 100000
    # cluto ratings are 1..5 explicit
    assert cluto.values().min() >= 1.0 and cluto.values().max() <= 5.0


def test_duplicate_entries_sum_on_read(tmp_path):
    """A file with duplicate (row, col) entries canonicalizes to their SUM
    at the reader boundary (the reference's += loops accumulate them; the
    device scatter kernels assume unique coordinates)."""
    from slim_tpu.io.readers import read_matrix

    f = tmp_path / "dup.csr"
    f.write_text("3 1.0 3 2.0 5 1.0\n0 4.0\n")
    m = read_matrix(str(f), fmt="csr")
    assert m.nnz == 3
    d = m.to_dense()
    assert d[0, 3] == 3.0 and d[0, 5] == 1.0 and d[1, 0] == 4.0

    # implicit (no-values) duplicates carry their multiplicity
    f2 = tmp_path / "dup.csrnv"
    f2.write_text("2 2 7\n")
    m2 = read_matrix(str(f2), fmt="csrnv")
    assert m2.nnz == 2 and m2.to_dense()[0, 2] == 2.0
