"""Probe: can axon-PJRT TPU executables be serialized to disk and
reloaded in a fresh process, skipping the (minutes-long, per-process)
Mosaic remote compile?

Run 1 (no cache file): lower+compile+serialize a small pallas_large_v3
sweep, save to /tmp/exec_probe.bin, time it, run it.
Run 2 (cache file present): deserialize_and_load, time it, run it,
compare results.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exec_cache_probe.py
"""
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from slim_tpu.ops import pallas_cd as pc

PATH = "/tmp/exec_probe.bin"
npad, B = 2048, 64

rng = np.random.default_rng(0)
G = jnp.asarray(rng.standard_normal((npad, npad)).astype(np.float32) * 0.01
                + 5.0 * np.eye(npad, dtype=np.float32))
gj = jnp.asarray(rng.standard_normal((B, npad)).astype(np.float32))
x = jnp.zeros((B, npad), jnp.float32)
q = jnp.zeros((B, npad), jnp.float32)
act = np.zeros((B, npad), np.int8)
act[:, : npad // 2] = 1
act_i8 = jnp.asarray(act)
live = jnp.ones((B, 1), jnp.float32)
diag2d = jnp.full((1, npad), 5.0, jnp.float32)
regs = jnp.stack([jnp.full((B,), 0.1, jnp.float32),
                  jnp.full((B,), 1.0, jnp.float32),
                  jnp.full((B,), 1e9, jnp.float32),
                  jnp.zeros((B,), jnp.float32),
                  jnp.full((B,), 1e-12, jnp.float32)], axis=1)
ngroups = npad // pc.GROUP
perm = jnp.arange(ngroups, dtype=jnp.int32)
has = jnp.ones((ngroups,), jnp.int32)
args = (G, gj, act_i8, x, q, live, diag2d, regs, perm, has)

from jax.experimental import serialize_executable as se

if not os.path.exists(PATH):
    t0 = time.perf_counter()
    lowered = jax.jit(
        lambda *a: pc.pallas_cd_sweep_large_v3(*a)).lower(*args)
    comp = lowered.compile()
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    blob = se.serialize(comp)
    with open(PATH, "wb") as fh:
        pickle.dump(blob, fh)
    print(f"compile {t_compile:.1f}s  serialize "
          f"{time.perf_counter()-t0:.1f}s  bytes "
          f"{os.path.getsize(PATH)}", flush=True)
    out = comp(*args)
else:
    t0 = time.perf_counter()
    with open(PATH, "rb") as fh:
        blob = pickle.load(fh)
    comp = se.deserialize_and_load(*blob)
    print(f"deserialize_and_load {time.perf_counter()-t0:.1f}s", flush=True)
    out = comp(*args)

xs = float(jnp.sum(out[0]))
print(f"x-sum {xs:.6f}  dltx {float(out[4][0,0]):.3e}", flush=True)
