"""Run configuration: estimation + persisted parameters.

Plays the role of GATB's ConfigurationAlgorithm + kmtricks' options dump
(thirdparty/gatb-core-stripped/.../ConfigurationAlgorithm.cpp:304-466,
include/kmtricks/cmd/all.hpp): estimates input volume by sampling the banks,
derives the partition count, and persists everything into the run directory
(``config/config.json`` here — the reference uses a GATB Storage dir; our
format is JSON but carries the same fields, and the repartition/hash.info
artifacts remain byte-compatible).

Partition-count rule (ConfigurationAlgorithm.cpp:398-425 semantics, made
deterministic): enough partitions that one partition's (key, sample, count)
stream fits the per-chip memory budget, never below 4 (task.hpp:112-117
enforces >= 4), rounded up to a multiple of 4.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import asdict, dataclass, field

from kmtricks_tpu.io import sequences as seqio
from kmtricks_tpu.io.fof import Fof


@dataclass
class Config:
    kmer_size: int = 31
    minim_size: int = 10
    nb_partitions: int = 4
    bloom_size: int = 10_000_000
    minim_type: int = 0
    repart_type: int = 0
    max_memory_mb: int = 8192
    # estimation results
    seq_number: int = 0
    seq_total_size: int = 0
    seq_max_size: int = 0
    kmers_estimated: int = 0
    # run parameters recorded for downstream modules
    mode: str = "kmer:count:bin"
    hard_min: int = 2
    count_bytes: int = 4
    # minimizer scheme for superk/count routing: "canonical" (the
    # reference binary's actual behavior + its committed fixtures) or
    # "forward" (the intent of its dead NONCANONICAL define)
    mmer_scheme: str = "canonical"
    extra: dict = field(default_factory=dict)

    @property
    def kmer_slots(self) -> int:
        return (self.kmer_size + 31) // 32

    def save(self, config_dir: str) -> None:
        os.makedirs(config_dir, exist_ok=True)
        with open(os.path.join(config_dir, "config.json"), "w") as f:
            json.dump(asdict(self), f, indent=2)

    @classmethod
    def load(cls, config_dir: str) -> "Config":
        with open(os.path.join(config_dir, "config.json")) as f:
            d = json.load(f)
        return cls(**d)


_GATB_CONFIG = "<QQQQQI QQQ Q QQQQ QQ II HH I".replace(" ", "")


def load_gatb_config(run_dir: str, mode: str = "kmer:count:bin",
                     hard_min: int = 2) -> Config:
    """Read a reference-produced run directory's GATB configuration
    (``config_gatb/gatb.config`` — Configuration::save field order,
    Configuration.cpp; GATB STORAGE_FILE collections are raw files named
    ``<group>.<stream>`` in ``<storage>_gatb/``, StorageFile.hpp:161-260)."""
    import struct

    path = os.path.join(run_dir, "config_gatb", "gatb.config")
    with open(path, "rb") as f:
        vals = struct.unpack(_GATB_CONFIG,
                             f.read(struct.calcsize(_GATB_CONFIG)))
    (kmer_size, minim_size, repart_type, minim_type, _max_disk, max_memory,
     _nb_cores, _nb_par, _ab_user, _cores_per_part, seq_nb, seq_total,
     seq_max, _avail, _volume, kmers_nb, _nb_passes, nb_partitions,
     _bits_per_kmer, _nb_banks, _cached) = vals
    return Config(
        kmer_size=int(kmer_size), minim_size=int(minim_size),
        nb_partitions=int(nb_partitions), minim_type=int(minim_type),
        repart_type=int(repart_type), max_memory_mb=int(max_memory),
        seq_number=int(seq_nb), seq_total_size=int(seq_total),
        seq_max_size=int(seq_max), kmers_estimated=int(kmers_nb),
        mode=mode, hard_min=hard_min)


def _span(k: int) -> int:
    from kmtricks_tpu.runtime.superk import span_for_k
    return span_for_k(k)


def save_gatb_config(config: Config, run_dir: str) -> None:
    """Write the GATB-compatible config twin (so reference module binaries
    can consume our run directories). Field values byte-verified against
    an executed Configuration::save (tests/test_ref_exec_golden.py)."""
    import struct

    d = os.path.join(run_dir, "config_gatb")
    os.makedirs(d, exist_ok=True)
    plan = (config.extra or {}).get("gatb_plan", {})
    with open(os.path.join(d, "gatb.config"), "wb") as f:
        f.write(struct.pack(
            _GATB_CONFIG, config.kmer_size, config.minim_size,
            config.repart_type, config.minim_type,
            plan.get("max_disk_mb", 0), config.max_memory_mb,
            # nbCores=1; one user abundance range (-abundance-min) —
            # _abundanceUserNb is 1 in an executed Configuration::save
            1, plan.get("nb_parallel", 1), 1,
            plan.get("cores_per_partition", 1), config.seq_number,
            config.seq_total_size, config.seq_max_size,
            plan.get("available_space", 0), plan.get("volume", 0),
            config.kmers_estimated, plan.get("nb_passes", 1),
            config.nb_partitions, 2 * _span(config.kmer_size),
            plan.get("nb_banks", 1),
            plan.get("nb_cached_items_per_core_per_part", 0)))


def estimate_banks(fof: Fof) -> seqio.BankEstimate:
    seqs = bases = mx = 0
    for entry in fof:
        e = seqio.estimate(entry.paths)
        seqs += e.sequences
        bases += e.total_bases
        mx = max(mx, e.max_size)
    return seqio.BankEstimate(seqs, bases, mx)


def gatb_partition_plan(kmers_nb: int, kmer_size: int, max_memory_mb: int,
                        max_disk_mb: int = 0, nb_cores: int = 1,
                        nb_parallel: int = 1,
                        storage_file: bool = True) -> dict:
    """The reference's full disk/memory/open-file feedback loop
    (ConfigurationAlgorithm.cpp:304-466), reproduced exactly:

    volume = kmersNb * sizeof(Type) / MB; volume_minim = volume * 0.6;
    max_disk defaults to max(75% of available, available - 2GB);
    nb_passes = (volume/4)/max_disk + 1; then iterate
    nb_partitions = volume_minim/nb_passes * parallel / max_memory + 1
    against the open-file limit (halve parallelism, then add passes);
    round partitions up to a multiple of the parallelism; finally size the
    per-core partition write cache to a tenth of memory."""
    import resource

    from kmtricks_tpu.runtime.superk import span_for_k

    MB = 1 << 20
    # sizeof(Type) of the DISPATCHED span (strictly greater than k,
    # loop_executor.hpp): 2*span bits — NOT the packed kmer slots. At
    # k = 32 the reference uses the span-64 type (16 bytes), doubling
    # volume and halving the cached-items count vs a slot-based size
    # (verified against executed ConfigurationAlgorithm goldens).
    type_bytes = span_for_k(kmer_size) // 4
    try:
        st = os.statvfs(".")
        available_mb = st.f_bavail * st.f_frsize // 1024 // 1024
    except OSError:
        available_mb = 0
    volume = max(1, kmers_nb * type_bytes // MB)
    volume_minim = max(1, int(volume * 0.5 * 1.2))
    if max_disk_mb == 0:
        max_disk_mb = max(75 * available_mb // 100,
                          available_mb - 2000)
    if max_disk_mb == 0:
        max_disk_mb = 10000
    max_memory_mb = max(max_memory_mb, 1)
    nb_passes = (volume // 4) // max_disk_mb + 1
    try:
        max_open = resource.getrlimit(resource.RLIMIT_NOFILE)[0] // 2
    except (ValueError, OSError):
        max_open = 512
    if storage_file:
        max_open //= 3          # STORAGE_FILE opens twice (cpp:360-364)
    while True:
        volume_per_pass = volume_minim // nb_passes
        nb_partitions = (volume_per_pass * nb_parallel) // max_memory_mb + 1
        if nb_partitions >= max_open and nb_parallel > 1:
            nb_parallel //= 2
        elif nb_partitions >= max_open:
            nb_passes += 1
        else:
            break
    incpart = (nb_parallel - nb_partitions % nb_parallel) % nb_parallel
    if max_open - nb_partitions > incpart:
        nb_partitions += incpart
    cores_per_partition = max(1, nb_cores // nb_parallel)
    cached = 1 << 8
    while True:
        cached *= 2
        if cached * nb_partitions * nb_cores * type_bytes                 >= max_memory_mb * MB // 10:
            break
    return dict(volume=volume, available_space=available_mb,
                max_disk_mb=max_disk_mb, nb_passes=nb_passes,
                nb_partitions=nb_partitions, nb_parallel=nb_parallel,
                cores_per_partition=cores_per_partition,
                nb_cached_items_per_core_per_part=cached)


def configure(fof: Fof, kmer_size: int, minim_size: int = 10,
              nb_partitions: int = 0, bloom_size: int = 10_000_000,
              max_memory_mb: int = 8192, mode: str = "kmer:count:bin",
              hard_min: int = 2, minim_type: int = 0,
              repart_type: int = 0, max_disk_mb: int = 0,
              nb_cores: int = 1) -> Config:
    """Estimate inputs and fix the partition count.

    ``nb_partitions = 0`` means auto, via the reference's exact
    disk/memory/open-file feedback loop (gatb_partition_plan), then
    kmtricks' floor of 4 partitions (task.hpp:112-117).
    """
    est = estimate_banks(fof)
    seqs = max(est.sequences, 1)
    mean_len = est.total_bases // seqs
    used_len = max(mean_len, kmer_size)      # cpp:309-310
    kmers = max(1, (used_len - kmer_size + 1) * seqs)
    plan = gatb_partition_plan(kmers, kmer_size, max_memory_mb,
                               max_disk_mb=max_disk_mb, nb_cores=nb_cores)
    # Bank::open(fof.get_all()) is a composite over every input file
    plan["nb_banks"] = sum(len(e.paths) for e in fof)
    if nb_partitions <= 0:
        # ConfigTask floor of 4 (task.hpp:112-117); the reference does NOT
        # round further (executed-golden-verified)
        nb_partitions = max(4, plan["nb_partitions"])
    return Config(
        kmer_size=kmer_size, minim_size=minim_size,
        nb_partitions=nb_partitions, bloom_size=bloom_size,
        minim_type=minim_type, repart_type=repart_type,
        max_memory_mb=max_memory_mb, seq_number=est.sequences,
        seq_total_size=est.total_bases, seq_max_size=est.max_size,
        kmers_estimated=kmers, mode=mode, hard_min=hard_min,
        extra={"gatb_plan": plan})
