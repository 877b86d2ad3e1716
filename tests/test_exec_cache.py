"""Persistent executable cache (ops/exec_cache.py).

The cache exists for the TPU Mosaic path (per-process recompiles), but
the serialize/deserialize machinery is backend-generic, so correctness
is validated here on the CPU backend: store -> fresh load -> identical
results, python-scalar dynamic args, key separation by shape/static,
and corrupt-file recovery.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slim_tpu.ops import exec_cache


@functools.partial(jax.jit, static_argnames=("flip",))
def _toy(a, b, seed, flip=False):
    out = a @ a.T + b * 2.0 + jnp.float32(seed)
    return -out if flip else out


@pytest.fixture()
def fresh_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("SLIM_TPU_CACHE_DIR", str(tmp_path))
    monkeypatch.setenv("SLIM_EXEC_CACHE", "1")
    exec_cache._memo.clear()
    yield tmp_path
    exec_cache._memo.clear()


def _files(tmp_path):
    d = os.path.join(str(tmp_path), "exec")
    return sorted(os.listdir(d)) if os.path.isdir(d) else []


def test_store_load_roundtrip(fresh_cache):
    a = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    b = jnp.ones((3, 3), jnp.float32)

    r1 = exec_cache.call(_toy, "toy", (a, b, 7), {"flip": False})
    assert len(_files(fresh_cache)) == 1

    # fresh process simulation: drop the in-memory memo, load from disk
    exec_cache._memo.clear()
    r2 = exec_cache.call(_toy, "toy", (a, b, 7), {"flip": False})
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    assert len(_files(fresh_cache)) == 1  # no second store

    # python-scalar dynamic args are input buffers, not key material:
    # a different seed reuses the executable and changes the result
    r3 = exec_cache.call(_toy, "toy", (a, b, 9), {"flip": False})
    np.testing.assert_allclose(np.asarray(r3) - np.asarray(r1), 2.0)
    assert len(_files(fresh_cache)) == 1


def test_key_separation(fresh_cache):
    a = jnp.ones((2, 2), jnp.float32)
    b = jnp.ones((2, 2), jnp.float32)
    exec_cache.call(_toy, "toy", (a, b, 0), {"flip": False})
    exec_cache.call(_toy, "toy", (a, b, 0), {"flip": True})     # static
    a2 = jnp.ones((4, 2), jnp.float32)
    b2 = jnp.ones((4, 4), jnp.float32)
    exec_cache.call(_toy, "toy", (a2, b2, 0), {"flip": False})  # shape
    assert len(_files(fresh_cache)) == 3


def test_corrupt_file_recovers(fresh_cache):
    a = jnp.ones((2, 2), jnp.float32)
    b = jnp.ones((2, 2), jnp.float32)
    r1 = exec_cache.call(_toy, "toy", (a, b, 3), {"flip": False})
    path = os.path.join(str(fresh_cache), "exec", _files(fresh_cache)[0])
    with open(path, "wb") as fh:
        fh.write(b"garbage")
    exec_cache._memo.clear()
    r2 = exec_cache.call(_toy, "toy", (a, b, 3), {"flip": False})
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_disabled_bypasses(fresh_cache, monkeypatch):
    monkeypatch.setenv("SLIM_EXEC_CACHE", "0")
    a = jnp.ones((2, 2), jnp.float32)
    b = jnp.ones((2, 2), jnp.float32)
    exec_cache.call(_toy, "toy", (a, b, 1), {"flip": False})
    assert _files(fresh_cache) == []


def test_solver_parity_through_cache(fresh_cache):
    """cd_solve_block_ids via exec_cache matches the plain jit path."""
    from slim_tpu.ops.cd_kernel import cd_solve_block_ids

    rng = np.random.default_rng(0)
    npad, B, n = 256, 32, 200
    A = (rng.random((300, n)) < 0.05).astype(np.float32)
    Gh = np.zeros((npad, npad), np.float32)
    Gh[:n, :n] = A.T @ A
    G = jnp.asarray(Gh)
    Jpad = np.full(B, npad - 1, np.int32)
    Jpad[:B] = np.arange(B, dtype=np.int32)
    caps = np.full(B, 200, np.int32)
    args = (G, jnp.asarray(Jpad), jnp.asarray(caps),
            jnp.zeros((B, npad), jnp.float32), n, 0.5, 1.0, 1e-7, 42)
    statics = dict(shuffle=True, fslim_nnbrs=0, simtype="cos", impl="xla")

    ref = cd_solve_block_ids(*args, **statics)
    out = exec_cache.call(cd_solve_block_ids, "ids", args, statics)
    exec_cache._memo.clear()
    out2 = exec_cache.call(cd_solve_block_ids, "ids", args, statics)
    for r, o, o2 in zip(ref, out, out2):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(o))
        np.testing.assert_array_equal(np.asarray(r), np.asarray(o2))
