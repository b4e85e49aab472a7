"""Interface-keyed AOT executable cache for the streaming engine.

jax's persistent compilation cache keys programs by their serialized
HLO — but Mosaic (Pallas/TPU) kernel payloads are MLIR-context-
dependent: the SAME program lowered after other Pallas lowerings
serializes different custom-call bytes (measured: byte-identical module
text, 32728- vs 32809-byte custom-call body — see
`ops.table._use_pair_merge`), so Pallas-bearing programs miss the
persistent cache whenever a process's lowering history differs and
silently recompile (~56 s each through a remote-compile tunnel).

This cache sidesteps lowering entirely: compiled executables are
serialized with ``jax.experimental.serialize_executable`` under a key
WE derive from the program's INTERFACE — the engine's run-parameter
signature, the program-family key, the device topology, the jax
version and a hash of the compute-path sources — so a fresh process
deserializes and runs without ever lowering or hashing HLO. Loads are
milliseconds of host work plus the device executable load (vs seconds
of lowering + the same load on the persistent-cache path), and the key
is stable by construction across processes and lowering histories.

Reference bar: the C++ binary has zero per-run program cost
(/root/reference/src/kmtricks.cpp:32-126); this is the TPU-native
equivalent for the engine's program families.

Gating: TPU backend + single process by default; ``KMTRICKS_TPU_EXE_CACHE=0``
disables, ``=1`` forces on (CPU tests). Any change to the compute-path
sources, the jax/jaxlib versions, or the device kind changes the key,
so stale executables are never loaded — they are just garbage on disk
(bounded by the directory, safe to delete any time).
"""
from __future__ import annotations

import hashlib
import logging
import os
import pickle
import threading
from functools import lru_cache

log = logging.getLogger("kmtricks")

_mem: dict = {}
_lock = threading.Lock()

# bump to invalidate every cached executable (layout/ABI of the stored
# pickle or of the call conventions the engine relies on)
_FORMAT_VERSION = 1


def enabled() -> bool:
    env = os.environ.get("KMTRICKS_TPU_EXE_CACHE", "")
    if env == "0":
        return False
    if env == "1":
        return True
    try:
        import jax
        return (jax.default_backend() == "tpu"
                and jax.process_count() == 1)
    except Exception:  # noqa: BLE001 - cache is best-effort
        return False


def cache_dir() -> str:
    d = os.environ.get("KMTRICKS_TPU_EXE_CACHE_DIR")
    if not d:
        d = os.path.join(os.path.expanduser("~"), ".cache",
                         "kmtricks_tpu", "exe")
    return d


@lru_cache(maxsize=1)
def _source_hash() -> str:
    """Hash of every compute-path source file that shapes a program:
    a code edit must never serve yesterday's executable."""
    import jax

    import kmtricks_tpu
    h = hashlib.sha256()
    pkg = os.path.dirname(os.path.abspath(kmtricks_tpu.__file__))
    files = []
    for sub in ("ops", "parallel", "core", "runtime"):
        root = os.path.join(pkg, sub)
        for dirpath, _dirs, names in os.walk(root):
            files.extend(os.path.join(dirpath, n) for n in names
                         if n.endswith(".py"))
    for f in sorted(files):
        h.update(f.encode())
        with open(f, "rb") as fh:
            h.update(fh.read())
    h.update(f"{jax.__version__}|{_FORMAT_VERSION}".encode())
    return h.hexdigest()[:16]


def exe_key(parts) -> str:
    """Stable cache key from the program interface description.

    ``parts`` must repr deterministically (tuples of ints/strs — the
    engine passes its ``_sig_base`` + family key + tail parameters).
    The device kind and count are appended: a serialized executable
    only loads on the topology it was built for.
    """
    import jax
    dev = jax.devices()[0]
    topo = (getattr(dev, "device_kind", "?"), len(jax.devices()),
            jax.process_count())
    raw = repr((parts, topo, _source_hash()))
    return hashlib.sha256(raw.encode()).hexdigest()[:32]


def _path(key: str) -> str:
    return os.path.join(cache_dir(), f"{key}.jaxexe")


def have(key: str) -> bool:
    """Cheap existence check (no load): memory entry or disk file."""
    return key in _mem or os.path.exists(_path(key))


def cached(key: str):
    """Memory-resident loaded executable, or None. Call sites use this
    (no disk I/O): entries appear when ``get`` loads from disk."""
    return _mem.get(key)


def get(key: str):
    """Loaded executable for ``key`` from memory or disk, else None."""
    with _lock:
        hit = _mem.get(key)
    if hit is not None:
        return hit
    p = _path(key)
    if not os.path.exists(p):
        return None
    try:
        from jax.experimental import serialize_executable as se
        with open(p, "rb") as fh:
            payload, in_tree, out_tree = pickle.loads(fh.read())
        loaded = se.deserialize_and_load(payload, in_tree, out_tree)
    except Exception as e:  # noqa: BLE001 - stale/corrupt entry: drop it
        log.warning("exe-cache: dropping unreadable entry %s (%s)",
                    key, type(e).__name__)
        try:
            os.unlink(p)
        except OSError:
            pass
        return None
    with _lock:
        _mem[key] = loaded
    return loaded


def put(key: str, compiled) -> None:
    """Serialize ``compiled`` (a jax Compiled) under ``key``. Atomic
    write; failures are logged and ignored (the jit path still works)."""
    p = _path(key)
    try:
        from jax.experimental import serialize_executable as se
        blob = pickle.dumps(se.serialize(compiled))
        os.makedirs(cache_dir(), exist_ok=True)
        tmp = f"{p}.tmp.{os.getpid()}"
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, p)
    except Exception as e:  # noqa: BLE001 - cache is best-effort
        log.warning("exe-cache: store failed for %s (%s)", key,
                    type(e).__name__)
