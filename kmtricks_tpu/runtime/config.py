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


def save_gatb_config(config: Config, run_dir: str) -> None:
    """Write the GATB-compatible config twin (so reference module binaries
    can consume our run directories)."""
    import struct

    d = os.path.join(run_dir, "config_gatb")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "gatb.config"), "wb") as f:
        f.write(struct.pack(
            _GATB_CONFIG, config.kmer_size, config.minim_size,
            config.repart_type, config.minim_type, 0, config.max_memory_mb,
            1, 1, 0, 1, config.seq_number, config.seq_total_size,
            config.seq_max_size, 0, 0, config.kmers_estimated, 1,
            config.nb_partitions, 2 * config.kmer_size, 1, 0))


def estimate_banks(fof: Fof) -> seqio.BankEstimate:
    seqs = bases = mx = 0
    for entry in fof:
        e = seqio.estimate(entry.paths)
        seqs += e.sequences
        bases += e.total_bases
        mx = max(mx, e.max_size)
    return seqio.BankEstimate(seqs, bases, mx)


def configure(fof: Fof, kmer_size: int, minim_size: int = 10,
              nb_partitions: int = 0, bloom_size: int = 10_000_000,
              max_memory_mb: int = 8192, mode: str = "kmer:count:bin",
              hard_min: int = 2, minim_type: int = 0,
              repart_type: int = 0) -> Config:
    """Estimate inputs and fix the partition count.

    ``nb_partitions = 0`` means auto: ceil(bytes_per_partition_stream /
    max_memory) over the estimated distinct-kmer volume, min 4, rounded up
    to a multiple of 4 (the reference's minimum and rounding-to-parallelism,
    task.hpp:112-117 + ConfigurationAlgorithm.cpp:420-425).
    """
    est = estimate_banks(fof)
    kmers = max(0, est.total_bases - (kmer_size - 1) * max(est.sequences, 1))
    if nb_partitions <= 0:
        slots = (kmer_size + 31) // 32
        volume_mb = kmers * (8 * slots + 8) / (1 << 20)
        nb_partitions = max(4, math.ceil(volume_mb / max(max_memory_mb, 1)))
        nb_partitions = ((nb_partitions + 3) // 4) * 4
    return Config(
        kmer_size=kmer_size, minim_size=minim_size,
        nb_partitions=nb_partitions, bloom_size=bloom_size,
        minim_type=minim_type, repart_type=repart_type,
        max_memory_mb=max_memory_mb, seq_number=est.sequences,
        seq_total_size=est.total_bases, seq_max_size=est.max_size,
        kmers_estimated=kmers, mode=mode, hard_min=hard_min)
