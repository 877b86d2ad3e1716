#!/bin/bash
# Pending real-TPU measurements, one command, each under timeout.
# Run when the device answers (scripts/../tests pass CPU-side already):
#   bash scripts/hw_session.sh 2>&1 | tee /tmp/hw_session.log
# ORDERED BY VALUE: if the device window is short, the early steps are the
# round's critical artifacts (headline bench, serving crossover table, 2M
# single-chip).  A wedged step can't block the rest (every step times out).
set -x
cd "$(dirname "$0")/.."

# 0. device smoke
timeout 120 python -c "import time,jax,jax.numpy as jnp; t0=time.perf_counter(); print('ALIVE', float(jnp.sum(jnp.ones((8,8)))), f'{time.perf_counter()-t0:.1f}s')" || exit 1

# 1. headline ML-20M bench (learn + predict vs cached native baseline);
#    also validates the pipelined harvest on hardware
timeout 3000 python bench.py 2>/tmp/hw_bench.err; tail -5 /tmp/hw_bench.err

# 2. serving crossover table: device-vs-native users/s at 1.7k / 27k /
#    262k / 2M items (VERDICT r2 item 2).  Dense device path at the small
#    points (the device's best there), sparse scan at 262k, COO at 2M.
SLIM_PREDICT_BENCH_DENSE=1 SLIM_BENCH_REPS=2 timeout 1200 python scripts/predict_large_bench.py 1700 100000 2>/tmp/hw_predict1p7k.err; tail -3 /tmp/hw_predict1p7k.err
SLIM_PREDICT_BENCH_DENSE=1 SLIM_BENCH_REPS=2 timeout 1200 python scripts/predict_large_bench.py 27000 100000 2>/tmp/hw_predict27k.err; tail -3 /tmp/hw_predict27k.err
timeout 2400 python scripts/predict_large_bench.py 262144 100000 2>/tmp/hw_predict.err; tail -3 /tmp/hw_predict.err
timeout 2400 python scripts/predict_large_bench.py 2000000 20000 2>/tmp/hw_predict2m.err; tail -3 /tmp/hw_predict2m.err

# 3. 2M-item single-chip demonstration (VERDICT r2 item 8): the G-free
#    blockwise mode on the REAL chip with a 1-device mesh -- proves the
#    memory-bounded screen holds on actual TPU HBM, not just virtual CPU
timeout 2400 python scripts/amazon2m_dryrun.py 2>/tmp/hw_2m_chip.err; tail -3 /tmp/hw_2m_chip.err

# 4. v3 vs v4 transposed-kernel A/B at the ML-20M head-block shape
#    (one config at a time per the verify skill's device discipline)
SLIM_AB_V3=1 timeout 2400 python scripts/kernel_ab.py 2>/tmp/hw_v3.err; tail -3 /tmp/hw_v3.err
SLIM_AB_V4=1 timeout 2400 python scripts/kernel_ab.py 2>/tmp/hw_v4.err; tail -3 /tmp/hw_v4.err

# 5. block-size A/B at ML-20M (B=1024 union/harvest granularity)
SLIM_BENCH_BLOCK=1024 SLIM_COMPACT_BMAX=1024 SLIM_BENCH_REPS=1 \
  timeout 2400 python bench.py 2>/tmp/hw_b1024.err

# 6. harvest-pipeline A/B (same bench, pipeline off)
SLIM_HARVEST_CHUNK=0 SLIM_BENCH_REPS=1 timeout 1800 python bench.py 2>/tmp/hw_bench_nopipe.err

# 7. ADMM on the MXU at its native regime
timeout 1800 python scripts/admm_bench.py 2>/tmp/hw_admm.err; tail -3 /tmp/hw_admm.err

# 8. serving A/Bs: single-pass top-k at 262k; dense-row scan at 2M; bf16
#    model values at 2M
SLIM_TOPK_CHUNK=0 SLIM_BENCH_REPS=1 timeout 1800 python scripts/predict_large_bench.py 262144 100000 2>/tmp/hw_predict_nochunk.err
SLIM_PREDICT_COO_NPAD=0 SLIM_BENCH_REPS=1 timeout 2400 python scripts/predict_large_bench.py 2000000 20000 2>/tmp/hw_predict2m_dense.err
SLIM_PREDICT_WVAL_BF16=1 SLIM_BENCH_REPS=1 timeout 2400 python scripts/predict_large_bench.py 2000000 20000 2>/tmp/hw_predict2m_bf16.err

# preserve the session log inside the repo (the watcher tees to /tmp only)
cp /tmp/hw_session.log /root/repo/hw_session_latest.log 2>/dev/null || true
for f in /tmp/hw_bench.err /tmp/hw_predict1p7k.err /tmp/hw_predict27k.err \
         /tmp/hw_predict.err /tmp/hw_predict2m.err /tmp/hw_2m_chip.err \
         /tmp/hw_v3.err /tmp/hw_v4.err /tmp/hw_admm.err; do
  [ -f "$f" ] && { echo "===== $f ====="; tail -20 "$f"; }
done >> /root/repo/hw_session_latest.log 2>/dev/null || true
