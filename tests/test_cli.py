"""CLI smoke tests (in-process, CPU backend): the three programs with the
reference's single-dash flag syntax, plus the neg-file 1-vs-k path."""

import numpy as np
import pytest

from conftest import random_csr
from slim_tpu.io.readers import write_matrix, read_matrix
from slim_tpu.cli import slim_learn, slim_predict, slim_mselect


@pytest.fixture
def data_files(tmp_path, rng):
    trn = random_csr(rng, 40, 25, density=0.3, seed=200)
    tst = random_csr(rng, 40, 25, density=0.08, seed=201)
    trn_f = str(tmp_path / "trn.csr")
    tst_f = str(tmp_path / "tst.csr")
    write_matrix(trn, trn_f, fmt="csr")
    write_matrix(tst, tst_f, fmt="csr")
    return tmp_path, trn_f, tst_f


def test_learn_then_predict_cli(data_files, capsys):
    tmp_path, trn_f, tst_f = data_files
    mdl_f = str(tmp_path / "m.model")
    rc = slim_learn.main(["-l1r=0.5", "-l2r=0.5", trn_f, mdl_f])
    assert rc == 0
    model = read_matrix(mdl_f, fmt="csr")
    assert model.nnz > 0

    rc = slim_predict.main([mdl_f, trn_f, tst_f])
    assert rc == 0
    out = capsys.readouterr().out
    assert "hr:" in out and "arhr:" in out


def test_predict_cli_negfile(data_files, rng, capsys):
    tmp_path, trn_f, tst_f = data_files
    mdl_f = str(tmp_path / "m.model")
    slim_learn.main(["-l1r=0.3", "-l2r=0.5", trn_f, mdl_f])

    # negatives: 5 random items per user
    neg = random_csr(rng, 40, 25, density=0.25, seed=202)
    neg_f = str(tmp_path / "neg.csr")
    write_matrix(neg, neg_f, fmt="csr")
    out_f = str(tmp_path / "recs.txt")
    rc = slim_predict.main(["-nrcmds=5", f"-outfile={out_f}",
                            mdl_f, trn_f, tst_f, neg_f])
    assert rc == 0
    lines = open(out_f).read().splitlines()
    assert len(lines) == 40
    out = capsys.readouterr().out
    assert "hr:" in out


def test_mselect_cli(data_files, tmp_path, capsys, monkeypatch):
    _, trn_f, tst_f = data_files
    l12 = str(tmp_path / "l12file")
    with open(l12, "w") as fh:
        fh.write("0.2 0.5\n1.0 1.0\n")
    monkeypatch.chdir(tmp_path)  # per-point models land in cwd
    rc = slim_mselect.main([trn_f, tst_f, l12])
    assert rc == 0
    out = capsys.readouterr().out
    assert "The selected hyperparameters" in out
    # per-point model files are written by default (slim_mselect.c:110-112)
    assert (tmp_path / "0.2 0.5.model").exists()
    assert (tmp_path / "1.0 1.0.model").exists()


def test_learn_cli_binarize_and_warmstart(data_files, capsys):
    tmp_path, trn_f, _ = data_files
    m1 = str(tmp_path / "m1.model")
    rc = slim_learn.main(["-binarize", "-l1r=0.5", "-l2r=0.5", trn_f, m1])
    assert rc == 0
    # warm start from the previous model
    m2 = str(tmp_path / "m2.model")
    rc = slim_learn.main(["-l1r=0.6", "-l2r=0.5", f"-ipmdlfile={m1}",
                          trn_f, m2])
    assert rc == 0


def test_learn_cli_admm(data_files):
    tmp_path, trn_f, _ = data_files
    mdl_f = str(tmp_path / "admm.model")
    rc = slim_learn.main(["-algo=admm", "-l1r=1.0", "-l2r=1.0", trn_f, mdl_f])
    assert rc == 0
    model = read_matrix(mdl_f, fmt="csr")
    assert model.nnz > 0


def test_learn_cli_fslim(data_files):
    tmp_path, trn_f, _ = data_files
    mdl_f = str(tmp_path / "fslim.model")
    rc = slim_learn.main(["-nnbrs=3", "-simtype=jac", "-l1r=0.2",
                          "-l2r=0.5", trn_f, mdl_f])
    assert rc == 0
    model = read_matrix(mdl_f, fmt="csr")
    # FSLIM: each column supported on <= nnbrs coordinates
    W = model.to_scipy().toarray()
    assert (W > 0).sum(axis=0).max() <= 3


def test_learn_cli_distributed(data_files):
    """-dist=blockwise runs the G-free distributed learn over all visible
    devices (8 virtual CPU devices here) and matches the single-device
    model's objective."""
    tmp_path, trn_f, _ = data_files
    m_solo = str(tmp_path / "solo.model")
    m_dist = str(tmp_path / "dist.model")
    rc = slim_learn.main(["-l1r=0.5", "-l2r=0.5", trn_f, m_solo])
    assert rc == 0
    rc = slim_learn.main(["-l1r=0.5", "-l2r=0.5", "-dist=blockwise",
                          trn_f, m_dist])
    assert rc == 0
    a = read_matrix(m_solo, fmt="csr")
    b = read_matrix(m_dist, fmt="csr")
    assert abs(a.nnz - b.nnz) <= max(2, 0.01 * a.nnz)
