"""Interface-keyed AOT executable cache (runtime/exe_cache.py).

VERDICT r4 item 6 asked for jax AOT serialization to cut the cross-
process load cost of big programs; NOTES.md documents WHY jax's own
persistent cache cannot serve Pallas-bearing programs (Mosaic payloads
are lowering-history-dependent, so the HLO-derived key is unstable).
The exe cache keys on the program INTERFACE instead and stores
serialized executables, so a fresh process loads without lowering."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture()
def exe_env(tmp_path, monkeypatch):
    from kmtricks_tpu.runtime import exe_cache
    monkeypatch.setenv("KMTRICKS_TPU_EXE_CACHE", "1")
    monkeypatch.setenv("KMTRICKS_TPU_EXE_CACHE_DIR", str(tmp_path / "exe"))
    exe_cache._mem.clear()
    yield exe_cache
    exe_cache._mem.clear()


def test_roundtrip_and_corruption(exe_env):
    # mirror the engine's program shape: explicitly meshed over every
    # device (a single-device program deserialized into a multi-device
    # process binds to the full device set and rejects its args)
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    ec = exe_env
    assert ec.enabled()
    mesh = Mesh(np.array(jax.devices()), ("d",))
    sh = NamedSharding(mesh, P("d"))
    fn = jax.jit(jax.shard_map(
        lambda x: (x * 2, jax.lax.psum(jnp.sum(x), "d").reshape(1)),
        mesh=mesh, in_specs=P("d"), out_specs=(P("d"), P("d")),
        check_vma=False))
    n = 2 * len(jax.devices())
    comp = fn.lower(
        jax.ShapeDtypeStruct((n,), jnp.float32, sharding=sh)).compile()
    key = ec.exe_key(("unit", "roundtrip", 16))
    assert not ec.have(key)
    assert ec.get(key) is None
    ec.put(key, comp)
    assert ec.have(key)
    ec._mem.clear()            # simulate a fresh process
    loaded = ec.get(key)
    assert loaded is not None
    a, s = loaded(np.arange(n, dtype=np.float32))
    assert float(np.sum(np.asarray(s))) == float(
        np.arange(n).sum() * len(jax.devices()))
    assert ec.cached(key) is loaded   # memory-resident after get
    # corrupt entry: dropped (returns None, file unlinked), never raises
    ec._mem.clear()
    with open(ec._path(key), "wb") as f:
        f.write(b"garbage")
    assert ec.get(key) is None
    assert not ec.have(key)


def test_key_is_interface_stable_and_sensitive(exe_env):
    ec = exe_env
    base = (("sig", 31, 10, 8), ("tail", 2), ("chunk", 4096, 1 << 14))
    assert ec.exe_key(base) == ec.exe_key(base)
    assert ec.exe_key(base) != ec.exe_key(
        (("sig", 31, 10, 8), ("tail", 2), ("chunk", 4096, 1 << 15)))
    assert ec.exe_key(base) != ec.exe_key(
        (("sig", 33, 10, 8), ("tail", 2), ("chunk", 4096, 1 << 14)))


def test_stream_engine_exe_cache_cold_parity(tmp_path, monkeypatch, capfd):
    """A 'fresh process' (cleared warm-sig set + cleared exe memory)
    re-running the same collection must LOAD every prefetched family
    from the exe cache — no lowering, no compile — and produce byte-
    identical matrices. This is the cold-start path a CLI user hits on
    every invocation after the first."""
    from kmtricks_tpu.runtime import exe_cache
    from kmtricks_tpu.runtime import stream_engine as _se
    from kmtricks_tpu.runtime.pipeline import (
        PipelineOptions, resolve_soft_min, stage_config, stage_repart)
    from kmtricks_tpu.runtime.stream_engine import stage_mesh_stream

    monkeypatch.setenv("KMTRICKS_TPU_EXE_CACHE", "1")
    monkeypatch.setenv("KMTRICKS_TPU_EXE_CACHE_DIR", str(tmp_path / "exe"))
    monkeypatch.setenv("KMTRICKS_STREAM_TRACE", "1")
    monkeypatch.setenv("KMTRICKS_STREAM_PAIR_CAP", str(1 << 16))
    monkeypatch.setenv("KMTRICKS_STREAM_CHUNK_WINDOWS", "401408")
    exe_cache._mem.clear()

    rng = np.random.default_rng(23)
    lines = []
    for s in range(3):
        p = tmp_path / f"S{s}.fasta"
        reads = ["".join(rng.choice(list("ACGT"), size=72))
                 for _ in range(3000)]
        with open(p, "w") as f:
            for i, r in enumerate(reads):
                f.write(f">r{i}\n{r}\n")
        lines.append(f"S{s} : {p}")
    fof = tmp_path / "t.fof"
    fof.write_text("\n".join(lines) + "\n")

    def run(run_dir):
        opts = PipelineOptions(
            fof=str(fof), run_dir=str(run_dir), kmer_size=31, hard_min=1,
            soft_min="1", share_min=0, mode="kmer:count:bin",
            static_repart=True, nb_partitions=8, threads=2)
        kmdir, config = stage_config(opts)
        repart = stage_repart(kmdir, config, opts)
        amin = resolve_soft_min(opts.soft_min, kmdir, len(kmdir.fof))
        stage_mesh_stream(kmdir, config, opts, repart, amin,
                          chunk_windows=401_408, use_stream=True)
        return [open(kmdir.get_matrix_path(p, "count", "bin", "kmer",
                                           False), "rb").read()
                for p in range(8)]

    _se._warmed_sigs.clear()
    m1 = run(tmp_path / "run1")
    out1 = capfd.readouterr().out
    assert "compile-prefetch fire" in out1
    assert len(list((tmp_path / "exe").glob("*.jaxexe"))) >= 3

    # fresh-process simulation: nothing warm in-process, exe memory
    # empty — every family must come off disk
    _se._warmed_sigs.clear()
    exe_cache._mem.clear()
    m2 = run(tmp_path / "run2")
    out2 = capfd.readouterr().out
    assert "exe-cache load fire" in out2
    assert "exe-cache ready" in out2
    assert "compile-prefetch fire" not in out2, out2
    assert "fell back to jit" not in out2
    for a, b in zip(m1, m2):
        assert a == b
