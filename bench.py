"""Benchmark: SLIM CD learn throughput (item-columns solved/sec) at
ML-20M scale (138k users x 27k items x 20M nnz -- BASELINE.md configs[2]),
TPU vs the native multithreaded CPU baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

The baseline is this repo's own C++/OpenMP CD solver (slim_tpu/native),
which implements the reference algorithm's exact computational shape
(per-column O(nnz) screen + sparse CD sweeps, OpenMP over columns --
estimate.c:328-558) at all available cores.  The reference itself ships no
numbers and its GKlib submodule is not vendored (BASELINE.md), so this is
the honest stand-in for "the 16-thread C baseline" on this machine.

The ML-20M native run costs ~16 minutes, so its result is cached in
``bench_baseline.json`` (keyed by workload signature + cpu count) and
remeasured only when missing or when SLIM_BENCH_CPU=1 forces a rerun.
The TPU side is always measured live.

Env knobs:
  SLIM_BENCH_SMALL=1   old ml100k workload (quick smoke, live CPU baseline)
  SLIM_BENCH_LARGE=1   50k x 10k synthetic (mid-size, live CPU baseline)
  SLIM_BENCH_CPU=1     force remeasuring the cached ML-20M baseline
  SLIM_BENCH_REPS=n    timed TPU repeats (default 2)
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_TEST_DIR = "/root/reference/test"
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_baseline.json")

L1R, L2R = 1.0, 1.0
OPT_TOL = 1e-7
MAXNITERS = 10000


def load_workload():
    from slim_tpu.io.readers import read_matrix
    from slim_tpu.types import CSR

    rng = np.random.default_rng(0)
    if os.environ.get("SLIM_BENCH_SMALL") == "1":
        path = os.path.join(REFERENCE_TEST_DIR, "ml100k.cluto")
        if os.path.exists(path):
            return read_matrix(path, fmt="cluto"), "ml100k", False
        nrows, ncols, nnz = 943, 1682, 100000
        users = rng.integers(0, nrows, nnz)
        items = (rng.zipf(1.3, nnz * 2) % ncols)[:nnz]
        vals = rng.integers(1, 6, nnz).astype(np.float32)
        return (CSR.from_ijv(users, items, vals, nrows, ncols),
                "synthetic-ml100k", False)
    if os.environ.get("SLIM_BENCH_LARGE") == "1":
        nrows, ncols, nnz = 50000, 10000, 2_000_000
        users = rng.integers(0, nrows, nnz)
        items = (rng.zipf(1.25, nnz * 2) % ncols)[:nnz]
        mat = CSR.from_ijv(users, items, np.ones(nnz, np.float32),
                           nrows, ncols).binarize()
        return mat, "synthetic-50kx10k", False
    from slim_tpu.datagen import synth_ml20m

    cache = os.path.expanduser("~/.cache/slim_tpu_bench/ml20m.npz")
    try:
        z = np.load(cache)
        mat = CSR.from_arrays(int(z["nrows"]), int(z["ncols"]),
                              z["indptr"], z["indices"], None)
        return mat, "ml20m-synth", True
    except (OSError, KeyError):
        pass
    mat = synth_ml20m()
    try:
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        np.savez(cache, nrows=mat.nrows, ncols=mat.ncols,
                 indptr=mat.indptr, indices=mat.indices)
    except OSError:
        pass
    return mat, "ml20m-synth", True


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def workload_sig(train):
    return {"nrows": train.nrows, "ncols": train.infer_ncols().ncols,
            "nnz": int(train.nnz), "cpus": os.cpu_count(),
            "l1r": L1R, "l2r": L2R, "optTol": OPT_TOL}


def bench_tpu(train, repeats):
    import logging

    from slim_tpu.api import learn
    from slim_tpu.config import SlimConfig, SLIM_DBG_TIME

    # phase timings (gram/unions/solve+harvest/assembly) to stderr so a
    # recorded bench run carries its own breakdown
    logging.basicConfig(level=logging.INFO,
                        format="[bench] %(message)s", stream=sys.stderr)
    cfg = SlimConfig(l1r=L1R, l2r=L2R, optTol=OPT_TOL, maxniters=MAXNITERS,
                     block_size=int(os.environ.get("SLIM_BENCH_BLOCK", "1024")),
                     dbglvl=SLIM_DBG_TIME)
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
    """Batched top-N scoring for every training user on device.  The
    device model is built once and held across repeats (the serving
    pattern: one model, many request batches)."""
    from slim_tpu.predict import (SPARSE_PREDICT_THRESHOLD, _bucket,
                                  densify_model, predict_topn,
                                  sparsify_model_device)

    if _bucket(train.infer_ncols().ncols) <= SPARSE_PREDICT_THRESHOLD:
        W = densify_model(model)
    else:
        W = sparsify_model_device(model)   # resident (Widx, Wval) tuple
    predict_topn(model, train, nrcmds=10, W_dev=W)  # warm (compile)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        predict_topn(model, train, nrcmds=10, W_dev=W)
        best = min(best, time.perf_counter() - t0)
    return train.nrows / best


def bench_cpu(train, name, is_ml20m):
    """Native all-core baseline; cached for the ML-20M workload."""
    from slim_tpu import native

    if not native.available():
        return None, None, None
    sig = workload_sig(train)
    if is_ml20m and os.environ.get("SLIM_BENCH_CPU") != "1":
        try:
            with open(BASELINE_CACHE) as fh:
                cache = json.load(fh)
            if cache.get("sig") == sig:
                log(f"[bench] using cached native baseline "
                    f"({cache['cols_per_s']:.1f} cols/s, "
                    f"measured {cache.get('date')})")
                return cache["cols_per_s"], cache["obj"], cache
        except (OSError, ValueError, KeyError):
            pass
    log("[bench] running native CPU baseline (all cores)...")
    t0 = time.perf_counter()
    model, err, obj = native.cd_learn(
        train, l1r=L1R, l2r=L2R, optTol=OPT_TOL, maxniters=MAXNITERS,
        nthreads=0)
    dt = time.perf_counter() - t0
    cols_per_s = train.infer_ncols().ncols / dt
    rec = {"sig": sig, "cols_per_s": cols_per_s, "obj": obj,
           "learn_s": dt, "date": time.strftime("%Y-%m-%d")}
    if is_ml20m:
        try:
            with open(BASELINE_CACHE, "w") as fh:
                json.dump(rec, fh)
        except OSError:
            pass
    return cols_per_s, obj, rec


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


def workload_name():
    """The workload name main() will report, derivable WITHOUT importing
    jax (the device-down marker must carry the same metric name a
    successful run of the same command would)."""
    if os.environ.get("SLIM_BENCH_SMALL") == "1":
        return ("ml100k" if os.path.exists(
            os.path.join(REFERENCE_TEST_DIR, "ml100k.cluto"))
            else "synthetic-ml100k")
    if os.environ.get("SLIM_BENCH_LARGE") == "1":
        return "synthetic-50kx10k"
    return "ml20m-synth"


def wait_for_device(max_wait_s):
    """Bounded device-alive probe.  This machine's known failure mode is a
    TPU-relay outage that blackholes every process touching the backend
    (``import jax`` itself hangs), so the probe MUST run in a subprocess
    under a timeout -- probing in-process would hang the bench forever.
    Retries until the device answers or the budget runs out.  Returns
    (alive, error).  A probe that fails FAST is not an outage (blackholed
    probes hang) -- broken env / import errors bail after 3 consecutive
    fast failures with the probe's stderr instead of burning the whole
    budget.  Skipped when JAX is pinned to CPU.

    Round-4 postmortem hardening (BENCH_r04 was rc=124/parsed-null): the
    deadline is now checked BEFORE each probe and each probe's subprocess
    timeout is capped to the remaining budget, so the loop can never
    overshoot ``max_wait_s`` by more than a few seconds -- previously a
    probe started at "1 min left" could run 60s sleep + 120s probe past
    the driver's own timeout and die marker-less."""
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return True, None
    probe = [sys.executable, "-c",
             "import jax, jax.numpy as jnp; "
             "print(float(jnp.sum(jnp.ones((8, 8)))))"]
    deadline = time.monotonic() + max_wait_s
    attempt = fast_failures = 0
    while True:
        remaining = deadline - time.monotonic()
        if remaining <= 1:
            return False, (f"TPU backend unreachable after "
                           f"{max_wait_s:.0f}s of probing")
        attempt += 1
        t0 = time.monotonic()
        try:
            r = subprocess.run(probe, capture_output=True,
                               timeout=min(120, remaining))
            if r.returncode == 0:
                if attempt > 1:
                    log(f"[bench] device answered on probe {attempt}")
                return True, None
            if time.monotonic() - t0 < 15:
                fast_failures += 1
                tail = r.stderr.decode(errors="replace").strip()[-500:]
                if fast_failures >= 3:
                    return False, f"probe failed fast (not an outage): {tail}"
            else:
                fast_failures = 0
        except subprocess.TimeoutExpired:
            fast_failures = 0
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            return False, (f"TPU backend unreachable after "
                           f"{max_wait_s:.0f}s of probing")
        log(f"[bench] device probe {attempt} failed; retrying "
            f"({remaining / 60:.0f} min left in budget)")
        time.sleep(min(60, max(1, remaining - 1)))


def down_marker(err, provisional=False):
    rec = {
        "metric": f"{workload_name()}_cd_item_columns_per_sec",
        "value": None, "unit": "columns/sec", "vs_baseline": None,
        "device_down": True,
        "error": err,
    }
    if provisional:
        rec["provisional"] = True
    return json.dumps(rec)


def main():
    # Survive the known TPU-relay outage in EVERY death mode: print a
    # provisional device-down marker up front (a successful run supersedes
    # it -- the driver parses the last JSON line), then probe (bounded,
    # default 15 min: BENCH_r04 showed the driver's own budget is ~30 min,
    # so the probe must leave headroom for the workload or at least for a
    # clean final marker), and on a dead device emit the final marker.
    print(down_marker(
        "provisional marker printed at startup; the process died "
        "(driver timeout / crash / mid-run device loss) before a real "
        "result or a final device_down marker could be printed",
        provisional=True), flush=True)
    probe_s = float(os.environ.get("SLIM_BENCH_PROBE_S", "900"))
    alive, err = wait_for_device(probe_s)
    if not alive:
        print(down_marker(err), flush=True)
        return

    # persistent compile cache: repeat bench runs skip the (remote) TPU
    # compilation of the solver kernels
    from slim_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    t0 = time.perf_counter()
    train, name, is_ml20m = load_workload()
    train = train.infer_ncols()
    log(f"[bench] workload {name}: {train.nrows}x{train.ncols} "
        f"nnz={train.nnz} (gen {time.perf_counter() - t0:.1f}s)")

    reps = int(os.environ.get("SLIM_BENCH_REPS", "2"))
    tpu_cps, model, stats, tpu_s = bench_tpu(train, reps)
    users_ps = bench_predict(train, model)
    log(f"[bench] predict {users_ps:.0f} users/sec")
    cpu_cps, cpu_obj, cpu_rec = bench_cpu(train, name, is_ml20m)
    cpu_ups = None
    if not is_ml20m or os.environ.get("SLIM_BENCH_CPU_PREDICT") == "1":
        cpu_ups = bench_cpu_predict(train, model)
    elif cpu_rec is not None:
        cpu_ups = cpu_rec.get("predict_users_per_s")
        if cpu_ups is None:
            cpu_ups = bench_cpu_predict(train, model, repeats=1)
            cpu_rec["predict_users_per_s"] = cpu_ups
            try:
                with open(BASELINE_CACHE, "w") as fh:
                    json.dump(cpu_rec, fh)
            except OSError:
                pass
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
        "predict_vs_baseline": (round(users_ps / cpu_ups, 3)
                                if cpu_ups else None),
        "cpu_baseline_columns_per_sec": round(cpu_cps, 2) if cpu_cps else None,
        "cpu_predict_users_per_sec": round(cpu_ups, 1) if cpu_ups else None,
        "objective": stats.get("loss"),
        "cpu_objective": cpu_obj,
        "model_nnz": model.nnz,
        "ncols": train.ncols,
        "device": str(__import__("jax").devices()[0]),
        # BASELINE.md's north star is a 16-thread C baseline; this machine's
        # native baseline runs on os.cpu_count() cores.  Record the count so
        # the ratio is interpretable (see docs/RESULTS.md for the scaling
        # discussion).
        "cpu_baseline_threads": os.cpu_count(),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
