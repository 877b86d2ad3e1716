"""Benchmark: SLIM CD learn throughput (item-columns solved/sec) on the
ml100k workload, TPU vs the native multithreaded CPU baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

The baseline is this repo's own C++/OpenMP CD solver (slim_tpu/native),
which implements the reference algorithm's exact computational shape
(per-column O(nnz) screen + sparse CD sweeps, OpenMP over columns --
estimate.c:328-558) at all available cores.  The reference itself ships no
numbers and its GKlib submodule is not vendored (BASELINE.md), so this is
the honest stand-in for "the 16-thread C baseline" on this machine.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_TEST_DIR = "/root/reference/test"

L1R, L2R = 1.0, 1.0
OPT_TOL = 1e-7
MAXNITERS = 10000


def load_workload():
    """Default: ml100k explicit train matrix (943 x ~1682), or a synthetic
    clone.  SLIM_BENCH_LARGE=1 switches to a 50k x 10k zipf implicit
    matrix (2M nnz) exercising the compacted large-catalogue solver."""
    from slim_tpu.io.readers import read_matrix
    from slim_tpu.types import CSR

    rng = np.random.default_rng(0)
    if os.environ.get("SLIM_BENCH_LARGE") == "1":
        nrows, ncols, nnz = 50000, 10000, 2_000_000
        users = rng.integers(0, nrows, nnz)
        items = (rng.zipf(1.25, nnz * 2) % ncols)[:nnz]
        mat = CSR.from_ijv(users, items, np.ones(nnz, np.float32),
                           nrows, ncols).binarize()
        return mat, "synthetic-50kx10k"

    path = os.path.join(REFERENCE_TEST_DIR, "ml100k.cluto")
    if os.path.exists(path):
        return read_matrix(path, fmt="cluto"), "ml100k"
    nrows, ncols, nnz = 943, 1682, 100000
    users = rng.integers(0, nrows, nnz)
    pop = rng.zipf(1.3, nnz * 2) % ncols
    items = pop[:nnz]
    vals = rng.integers(1, 6, nnz).astype(np.float32)
    return CSR.from_ijv(users, items, vals, nrows, ncols), "synthetic-ml100k"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_tpu(train, repeats=3):
    from slim_tpu.api import learn
    from slim_tpu.config import SlimConfig

    cfg = SlimConfig(l1r=L1R, l2r=L2R, optTol=OPT_TOL, maxniters=MAXNITERS,
                     block_size=256)
    # warmup (compile)
    t0 = time.perf_counter()
    learn(train, cfg)
    log(f"[bench] warmup learn {time.perf_counter() - t0:.1f}s")
    best = float("inf")
    for r in range(repeats):
        t0 = time.perf_counter()
        model, stats = learn(train, cfg)
        dt = time.perf_counter() - t0
        log(f"[bench] learn repeat {r}: {dt:.2f}s")
        best = min(best, dt)
    return train.infer_ncols().ncols / best, model, stats, best


def bench_predict(train, model, repeats=3):
    from slim_tpu.predict import densify_model, predict_topn

    W = densify_model(model)
    predict_topn(model, train, nrcmds=10, W_dev=W)  # warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        predict_topn(model, train, nrcmds=10, W_dev=W)
        best = min(best, time.perf_counter() - t0)
    return train.nrows / best


def bench_cpu(train):
    from slim_tpu import native

    if not native.available():
        return None, None
    log("[bench] running native CPU baseline...")
    t0 = time.perf_counter()
    model, err, obj = native.cd_learn(
        train, l1r=L1R, l2r=L2R, optTol=OPT_TOL, maxniters=MAXNITERS,
        nthreads=0)  # all cores
    dt = time.perf_counter() - t0
    return train.infer_ncols().ncols / dt, obj


def bench_cpu_predict(train, model, repeats=3):
    from slim_tpu import native

    if not native.available():
        return None
    native.predict_topn(model, train, nrcmds=10)  # warm/alloc
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        native.predict_topn(model, train, nrcmds=10)
        best = min(best, time.perf_counter() - t0)
    return train.nrows / best


def main():
    # persistent compile cache: repeat bench runs skip the (remote) TPU
    # compilation of the solver kernels
    from slim_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    train, name = load_workload()
    train = train.infer_ncols()

    tpu_cps, model, stats, tpu_s = bench_tpu(train)
    users_ps = bench_predict(train, model)
    log(f"[bench] predict {users_ps:.0f} users/sec")
    cpu_cps, cpu_obj = bench_cpu(train)
    cpu_ups = bench_cpu_predict(train, model)
    if cpu_ups:
        log(f"[bench] native CPU predict {cpu_ups:.0f} users/sec")

    vs = tpu_cps / cpu_cps if cpu_cps else float("nan")
    out = {
        "metric": f"{name}_cd_item_columns_per_sec",
        "value": round(tpu_cps, 2),
        "unit": "columns/sec",
        "vs_baseline": round(vs, 3) if cpu_cps else None,
        "tpu_learn_s": round(tpu_s, 3),
        "predict_users_per_sec": round(users_ps, 1),
        "cpu_baseline_columns_per_sec": round(cpu_cps, 2) if cpu_cps else None,
        "cpu_predict_users_per_sec": round(cpu_ups, 1) if cpu_ups else None,
        "objective": stats.get("loss"),
        "cpu_objective": cpu_obj,
        "model_nnz": model.nnz,
        "ncols": train.ncols,
        "device": str(__import__("jax").devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
