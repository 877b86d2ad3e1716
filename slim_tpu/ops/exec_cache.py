"""Persistent compiled-executable cache for the Pallas solve kernels.

JAX's persistent compilation cache covers XLA programs across processes,
but on this remote-compile TPU toolchain the Mosaic (Pallas) kernel
compiles recur PER PROCESS: a cold ML-20M learn pays 200s+ re-compiling
the same bucketed block shapes that the previous process already built.

``jax.experimental.serialize_executable`` round-trips a compiled
executable through disk (measured: 14.7s compile -> 0.0s
deserialize_and_load on the axon PJRT plugin), so we cache the compiled
artifact itself, keyed by

    (entry-point name, arg avals, static kwargs, device kind + count,
     jax version, digest of the kernel source files).

The kernel-source digest invalidates the cache whenever
``ops/pallas_cd.py`` or ``ops/cd_kernel.py`` change, so stale
executables can never shadow a kernel edit.

Scope: only the TPU Pallas dispatches route through here (the driver
gates on impl); XLA programs stay on the regular jit path where the
XLA persistent cache already works.  Compile ERRORS propagate to the
caller unchanged -- the driver's failed-shape bookkeeping
(`solvers/cd._dispatch_with_fallback`) depends on seeing them --
while cache-machinery failures (corrupt file, unsupported backend)
degrade silently to a plain compile.

Reference anchor: this subsystem has no reference counterpart (the C
code compiles nothing at runtime); it exists to meet the reference's
*startup latency*, src/programs/slim_learn.c is interactive-fast.
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle
import tempfile
import threading

logger = logging.getLogger("slim_tpu")

_memo = {}            # key -> loaded Compiled (per-process)
_memo_lock = threading.Lock()
_src_digest_cache = None


def _enabled() -> bool:
    return os.environ.get("SLIM_EXEC_CACHE", "1") != "0"


def cache_dir() -> str:
    root = os.environ.get(
        "SLIM_TPU_CACHE_DIR", os.path.expanduser("~/.cache/slim_tpu_jax"))
    return os.path.join(root, "exec")


def _source_digest() -> str:
    """Digest of the kernel sources; any edit invalidates every entry."""
    global _src_digest_cache
    if _src_digest_cache is None:
        h = hashlib.sha256()
        here = os.path.dirname(os.path.abspath(__file__))
        # every module whose code is traced INTO a cached executable:
        # predict.py was missing originally, and a fix to its packing
        # logic kept silently loading the stale pre-fix program
        for path in ("pallas_cd.py", "cd_kernel.py", "pallas_pack.py",
                     "pallas_gram.py", "../predict.py", "../solvers/cd.py"):
            try:
                with open(os.path.join(here, path), "rb") as fh:
                    h.update(fh.read())
            except OSError:
                h.update(path.encode())
        _src_digest_cache = h.hexdigest()[:16]
    return _src_digest_cache


def _arg_sig(a):
    """Shape/dtype signature of one dynamic argument.

    Python scalars are keyed by type only (jit weak-types them; the
    value is an input buffer, not part of the executable)."""
    if isinstance(a, bool):
        return ("pybool",)
    if isinstance(a, int):
        return ("pyint",)
    if isinstance(a, float):
        return ("pyfloat",)
    import numpy as np

    if hasattr(a, "shape") and hasattr(a, "dtype"):
        weak = bool(getattr(a, "weak_type", False))
        return ("arr", tuple(a.shape), np.dtype(a.dtype).str, weak)
    return ("other", repr(type(a)))


_KNOB_ENVS = (
    # env knobs read at TRACE time inside the kernel selection: two
    # processes with the same arg shapes but different knob values
    # compile different programs, so the knobs must key the cache --
    # otherwise an A/B flip silently loads the other setting's
    # executable from disk
    "SLIM_PALLAS_V3", "SLIM_PALLAS_V4", "SLIM_PALLAS_KFLUSH",
    "SLIM_PALLAS_PANEL", "SLIM_PALLAS_GROUP", "SLIM_PALLAS_V4_GROUP",
    "SLIM_PALLAS_MAXB", "SLIM_PALLAS_QREFRESH", "SLIM_EXACT_OBJ",
    "SLIM_GRAM_INT8", "SLIM_PALLAS_SS", "SLIM_PALLAS_HIPREC",
    "SLIM_PALLAS_GBF16", "SLIM_PALLAS_GTILE", "SLIM_PALLAS_PANSKIP")


def _knob_sig() -> str:
    # NB: the v4 shape denylist no longer keys the cache.  The driver
    # resolves the variant at dispatch time and passes it as an explicit
    # static (solvers.cd._inject_variant), so the denylist's effect is
    # already in ``statics`` -- and keying on the global set would
    # invalidate EVERY cached executable whenever one new shape fails
    # (a full recompile storm in an already-degraded session).
    return ";".join(f"{k}={os.environ.get(k, '')}" for k in _KNOB_ENVS)


def _make_key(name: str, args, statics: dict) -> str:
    import jax

    devs = jax.devices()
    parts = [
        name,
        _source_digest(),
        _knob_sig(),
        jax.__version__,
        devs[0].device_kind,
        str(len(devs)),
        repr(sorted(statics.items())),
        repr([_arg_sig(a) for a in args]),
    ]
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:32]


def call(jfn, name: str, args: tuple, statics: dict):
    """Call a jitted function through the persistent executable cache.

    ``args`` are the dynamic (positional) arguments, ``statics`` the
    static keyword arguments.  Equivalent to ``jfn(*args, **statics)``
    but a fresh process re-loads the compiled executable from disk
    instead of re-compiling it.  Compile errors propagate unchanged.
    """
    if not _enabled():
        return jfn(*args, **statics)
    try:
        key = _make_key(name, args, statics)
    except Exception as e:  # pragma: no cover - key machinery
        logger.debug("exec cache key failed (%s); direct dispatch", e)
        return jfn(*args, **statics)

    comp = _memo.get(key)
    if comp is not None:
        return comp(*args)

    path = os.path.join(cache_dir(), key + ".bin")
    if os.path.exists(path):
        try:
            from jax.experimental import serialize_executable as se

            with open(path, "rb") as fh:
                blob = pickle.load(fh)
            comp = se.deserialize_and_load(*blob)
            with _memo_lock:
                _memo[key] = comp
            return comp(*args)
        except Exception as e:
            logger.warning("exec cache load failed for %s (%s); "
                           "recompiling", name, str(e)[:120])
            try:
                os.unlink(path)
            except OSError:
                pass

    # Compile.  Errors here must propagate (the driver records failed
    # Pallas shapes and falls back to the XLA kernel).
    comp = jfn.lower(*args, **statics).compile()

    try:
        from jax.experimental import serialize_executable as se

        blob = se.serialize(comp)
        os.makedirs(cache_dir(), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=cache_dir(), suffix=".tmp")
        with os.fdopen(fd, "wb") as fh:
            pickle.dump(blob, fh)
        os.replace(tmp, path)
    except Exception as e:  # pragma: no cover - serialize unsupported
        logger.debug("exec cache store failed for %s: %s", name, e)

    with _memo_lock:
        _memo[key] = comp
    return comp(*args)
