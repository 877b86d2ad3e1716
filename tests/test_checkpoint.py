"""Checkpoint/resume of column-block solves."""

import glob
import os

import numpy as np

from conftest import random_csr
from slim_tpu.config import SlimConfig
from slim_tpu.solvers.cd import estimate_model_cd


def test_checkpoint_resume_identical(tmp_path, rng):
    mat = random_csr(rng, 50, 40, density=0.25, seed=91)
    cfg = SlimConfig(l1r=0.4, l2r=0.6, block_size=16,
                     checkpoint_dir=str(tmp_path), shuffle=False)

    m1, s1 = estimate_model_cd(mat, cfg)
    files = glob.glob(str(tmp_path / "cdblk_*"))
    assert len(files) == (40 + 15) // 16  # one per block

    # simulate a crash that lost one block's result
    os.remove(files[1])
    m2, s2 = estimate_model_cd(mat, cfg)
    np.testing.assert_allclose(m1.to_scipy().toarray(),
                               m2.to_scipy().toarray(), atol=1e-7)
    np.testing.assert_allclose(s1["loss"], s2["loss"], rtol=1e-6)

    # different hyper-parameters must NOT reuse stale checkpoints
    cfg3 = cfg.replace(l1r=0.9)
    m3, _ = estimate_model_cd(mat, cfg3)
    assert m3.nnz != m1.nnz or not np.allclose(
        m3.to_scipy().toarray(), m1.to_scipy().toarray())


def test_checkpoint_off_by_default(tmp_path, rng):
    mat = random_csr(rng, 30, 20, density=0.3, seed=92)
    estimate_model_cd(mat, SlimConfig(l1r=0.5, l2r=0.5))
    assert not glob.glob(str(tmp_path / "cdblk_*"))
