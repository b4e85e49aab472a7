"""Module commands: independently runnable pipeline stages.

Reference: the WITH_KM_MODULES subcommands (src/cli.cpp:384-644,
include/kmtricks/cmd.hpp:74-272) — `repart`, `superk --id`, `count --id
[--partition-id]`, `merge [--partition-id]`, `aggregate` — coordinating only
through the run directory, so independent processes/machines can split the
work (SURVEY.md §2.5 multi-node).
"""

from __future__ import annotations

import os

import numpy as np

from kmtricks_tpu.core.histogram import KHist
from kmtricks_tpu.core.repartition import Repartition
from kmtricks_tpu.host import ops as hops
from kmtricks_tpu.io import formats as F
from kmtricks_tpu.runtime.config import Config
from kmtricks_tpu.runtime.kmdir import KmDir
from kmtricks_tpu.runtime.pipeline import (
    PipelineOptions,
    resolve_soft_min,
    stage_count,
    stage_merge,
    stage_repart,
)
from kmtricks_tpu.runtime.superk import PartiInfo, iter_skp_file, stage_superk


def load_run(run_dir: str) -> tuple[KmDir, Config, Repartition | None]:
    """Open a run directory — ours (config/config.json + repartition/) or a
    reference-produced one (config_gatb/gatb.config + repartition_gatb/,
    the GATB STORAGE_FILE layout)."""
    kmdir = KmDir.init(run_dir, first=False)
    if os.path.exists(os.path.join(kmdir.config_storage, "config.json")):
        config = Config.load(kmdir.config_storage)
    else:
        from kmtricks_tpu.runtime.config import load_gatb_config
        config = load_gatb_config(run_dir)
    rep = None
    for path in (kmdir.repart_path,
                 os.path.join(run_dir, "repartition_gatb",
                              "repartition.minimRepart")):
        if os.path.exists(path):
            rep = Repartition.load(path)
            break
    return kmdir, config, rep


def module_repart(opts: PipelineOptions) -> None:
    """`kmtricks repart` — run dir init + config + repartition only."""
    from kmtricks_tpu.runtime.pipeline import stage_config

    kmdir, config = stage_config(opts)
    stage_repart(kmdir, config, opts)


def module_superk(run_dir: str, sample_id: str, opts: PipelineOptions,
                  partitions: list[int] | None = None) -> None:
    kmdir, config, rep = load_run(run_dir)
    assert rep is not None, "run `repart` first"
    stage_superk(kmdir, config, rep, kmdir.fof.get_i(sample_id), opts,
                 partitions)


def count_from_superkmers(kmdir: KmDir, config: Config, sample_id: str,
                          partition: int, hard_min: int, mode: str,
                          window_bits: int | None, count_max: int,
                          hist: KHist | None = None):
    """Count one partition from its superkmer file (the reference
    `count` module path, sorting_count.hpp KmerPartCounter semantics:
    decode -> canonical -> sort -> run-length -> hard-min)."""
    from kmtricks_tpu.core import kmer as kops
    from kmtricks_tpu.core.hashers import xxh64_words

    k = config.kmer_size
    path = os.path.join(kmdir.get_superk_path(sample_id), f"skp.{partition}")
    chunks = []
    for nbk, codes in iter_skp_file(path, k):
        fwd = kops.kmers_from_codes(codes, k)
        chunks.append(kops.canonical(fwd, k))
    if chunks:
        keys = np.concatenate(chunks)
    else:
        keys = np.zeros((0, config.kmer_slots), dtype=np.uint64)
    if mode == "hash":
        h = xxh64_words(keys)
        keys = (h % np.uint64(window_bits)
                + np.uint64(window_bits) * np.uint64(partition))
        keys = keys.reshape(-1, 1)
    order = hops.sort_rows(keys)
    uniq, cnt = hops.run_length_count(keys[order])
    if hist is not None:
        hist.inc_counts(cnt)
    solid = cnt >= hard_min
    cnt = np.minimum(cnt[solid], count_max).astype(np.uint32)
    uniq = uniq[solid]
    return (uniq if mode == "kmer" else uniq.ravel()), cnt


def count_kff_sk(kmdir: KmDir, config: Config, rep, sample_id: str,
                 opts: PipelineOptions,
                 partitions: list[int] | None = None) -> None:
    """`count --mode kff-sk`: counted superkmers as KFF minimizer sections
    (KffSkWriter parity, kff_file.hpp:136-206 — vestigial in the reference,
    functional here). Per partition: decode superkmers, count the
    partition's canonical k-mers (hard-min, saturate to the section's
    max=255/data_size=1), then emit one block per superkmer carrying its
    per-k-mer counts, grouped by literal minimizer substring."""
    from kmtricks_tpu.core import kmer as kops
    from kmtricks_tpu.io.kff import write_kff_sk_file
    # lex_view's byte order matches sort_rows' most-significant-word-first
    # row order (the former structured-dtype view compared the LEAST
    # significant word first, mis-assigning counts for k > 32)
    from kmtricks_tpu.runtime.filter import lex_view

    k, m = config.kmer_size, config.minim_size
    if not os.path.isdir(kmdir.get_superk_path(sample_id)) or not any(
            f.startswith("skp.")
            for f in os.listdir(kmdir.get_superk_path(sample_id))):
        assert rep is not None, "no superkmers and no repartition"
        stage_superk(kmdir, config, rep, kmdir.fof.get_i(sample_id), opts,
                     partitions)
    parts = partitions if partitions is not None \
        else range(config.nb_partitions)
    for p in parts:
        path = os.path.join(kmdir.get_superk_path(sample_id), f"skp.{p}")
        sks = [codes for _, codes in iter_skp_file(path, k)]
        all_kmers = [kops.canonical(kops.kmers_from_codes(c, k), k)
                     for c in sks]
        if all_kmers:
            cat = np.concatenate(all_kmers)
            order = hops.sort_rows(cat)
            uniq, cnt = hops.run_length_count(cat[order])
            cnt = np.where(cnt >= opts.hard_min, cnt, 0)
        else:
            uniq = np.zeros((0, config.kmer_slots), dtype=np.uint64)
            cnt = np.zeros(0, dtype=np.uint64)
        vkeys = lex_view(uniq)
        blocks = []
        for codes, kk in zip(sks, all_kmers):
            masked = kops.masked_mmers(codes, m)
            pos = int(np.argmin(masked))
            idx = np.searchsorted(vkeys, lex_view(kk))
            counts = cnt[np.minimum(idx, max(len(cnt) - 1, 0))] \
                if len(cnt) else np.zeros(len(kk), dtype=np.uint64)
            blocks.append((codes, pos, counts))
        write_kff_sk_file(
            kmdir.get_count_part_path(sample_id, p, False, "kff"),
            blocks, k, m)


def module_count(run_dir: str, sample_id: str, opts: PipelineOptions,
                 partitions: list[int] | None = None,
                 count_mode: str | None = None) -> None:
    """`kmtricks count --id S [--partition-id P]`.

    Counts from superkmer files when they exist (reference workflow:
    superk then count), else directly from the reads."""
    kmdir, config, rep = load_run(run_dir)
    sidx = kmdir.fof.get_i(sample_id)
    cf = count_mode or opts.mode.split(":")[0]
    if cf == "kff-sk":
        count_kff_sk(kmdir, config, rep, sample_id, opts, partitions)
        return
    skp_dir = kmdir.get_superk_path(sample_id)
    have_skp = os.path.exists(os.path.join(skp_dir, "skp.0")) or any(
        f.startswith("skp.") for f in (os.listdir(skp_dir)
                                       if os.path.isdir(skp_dir) else []))
    if not have_skp:
        assert rep is not None, "no superkmers and no repartition"
        stage_count(kmdir, config, rep, sidx, opts, partitions,
                    count_mode=cf)
        return

    from kmtricks_tpu.core.hashers import HashWindow

    hw = HashWindow.load(kmdir.hash_win) if cf != "kmer" else None
    entry = kmdir.fof.entries[sidx]
    hard_min = entry.abundance_min or opts.hard_min
    count_max = (1 << (8 * config.count_bytes)) - 1
    hist = KHist(sidx, config.kmer_size) if opts.hist else None
    parts = partitions if partitions is not None \
        else range(config.nb_partitions)
    for p in parts:
        mode = "hash" if cf in ("hash", "vector") else "kmer"
        keys, counts = count_from_superkmers(
            kmdir, config, sample_id, p, hard_min, mode,
            hw.window_size_bits if hw else None, count_max, hist)
        if cf == "kmer":
            F.write_kmer_file(
                kmdir.get_count_part_path(sample_id, p, opts.cpr, "kmer"),
                keys, counts, config.kmer_size, config.count_bytes,
                sidx, p, compressed=opts.cpr)
        elif cf == "kff":
            from kmtricks_tpu.io.kff import write_kff_file
            write_kff_file(
                kmdir.get_count_part_path(sample_id, p, False, "kff"),
                keys, counts, config.kmer_size, config.count_bytes)
        elif cf == "hash":
            F.write_hash_file(
                kmdir.get_count_part_path(sample_id, p, opts.cpr, "hash"),
                keys, counts, config.count_bytes, sidx, p,
                compressed=opts.cpr)
        elif cf == "vector":
            w = hw.window_size_bits
            vec = np.zeros(F.nbytes(w), dtype=np.uint8)
            rel = (keys - np.uint64(w) * np.uint64(p)).astype(np.int64)
            np.bitwise_or.at(vec, rel >> 3,
                             (1 << (rel & 7)).astype(np.uint8))
            F.write_bit_vector_file(
                kmdir.get_count_part_path(sample_id, p, opts.cpr, "vector"),
                vec, w, sidx, p, compressed=opts.cpr)
    if hist is not None:
        F.write_hist_file(kmdir.get_hist_path(sample_id), hist)
    if not opts.keep_tmp:
        # consumed superkmer files are deleted after counting
        # (task.hpp:436-445 Eraser postprocess, unless --keep-tmp)
        for p in parts:
            path = os.path.join(skp_dir, f"skp.{p}")
            if os.path.exists(path):
                os.remove(path)


def module_merge(run_dir: str, opts: PipelineOptions,
                 partitions: list[int] | None = None) -> None:
    kmdir, config, _ = load_run(run_dir)
    amin = resolve_soft_min(opts.soft_min, kmdir, len(kmdir.fof))
    parts = partitions if partitions is not None \
        else range(config.nb_partitions)
    for p in parts:
        stage_merge(kmdir, config, opts, p, amin)


# ---------------------------------------------------------------------------
# aggregate (cmd.hpp:440-606)
# ---------------------------------------------------------------------------

def module_aggregate(run_dir: str, *, count: str = "", matrix: str = "",
                     pa_matrix: str = "", fmt: str = "text",
                     sorted_out: bool = False, cpr_in: bool = False,
                     cpr_out: bool = False, no_count: bool = False,
                     output: str = "stdout") -> None:
    import sys
    from contextlib import nullcontext

    from kmtricks_tpu.core.kmer import kmers_to_strings

    kmdir, config, _ = load_run(run_dir)
    nb = config.nb_partitions
    k = config.kmer_size

    def out_ctx():
        # never close sys.stdout (in-process callers keep printing after)
        return (nullcontext(sys.stdout) if output == "stdout"
                else open(output, "w"))

    def emit_rows(names, counts_rows):
        with out_ctx() as out:
            for i, name in enumerate(names):
                if no_count:
                    out.write(f"{name}\n")
                else:
                    row = counts_rows[i]
                    vals = " ".join(str(int(c)) for c in np.atleast_1d(row))
                    out.write(f"{name} {vals}\n")

    if count:
        sample_id, typ = count.split(":")
        if typ == "kmer":
            ks, cs = [], []
            for p in range(nb):
                _, kk, cc = F.read_kmer_file(
                    kmdir.get_count_part_path(sample_id, p, cpr_in, "kmer"))
                ks.append(kk)
                cs.append(cc)
            keys = np.concatenate(ks)
            cnts = np.concatenate(cs)
            if sorted_out:
                order = hops.sort_rows(keys)
                keys, cnts = keys[order], cnts[order]
            if fmt == "text":
                emit_rows(kmers_to_strings(keys, k), cnts)
            else:
                F.write_kmer_file(output, keys, cnts, k, config.count_bytes,
                                  0, 0, compressed=cpr_out)
        else:
            hs, cs = [], []
            for p in range(nb):
                _, hh, cc = F.read_hash_file(
                    kmdir.get_count_part_path(sample_id, p, cpr_in, "hash"))
                hs.append(hh)
                cs.append(cc)
            hashes, cnts = np.concatenate(hs), np.concatenate(cs)
            if fmt == "text":
                emit_rows([str(int(h)) for h in hashes], cnts)
            else:
                F.write_hash_file(output, hashes, cnts, config.count_bytes,
                                  0, 0)
    elif matrix:
        rows_k, rows_c = [], []
        for p in range(nb):
            path = kmdir.get_matrix_path(p, "count", "bin", matrix, cpr_in)
            if matrix == "kmer":
                _, kk, cc = F.read_matrix_file(path, config.count_bytes)
            else:
                _, kk, cc = F.read_matrix_hash_file(path)
            rows_k.append(kk)
            rows_c.append(cc)
        keys = np.concatenate(rows_k)
        cnts = np.concatenate(rows_c)
        if sorted_out:
            order = hops.sort_rows(keys.reshape(len(keys), -1))
            keys, cnts = keys[order], cnts[order]
        if fmt == "text":
            names = (kmers_to_strings(keys, k) if matrix == "kmer"
                     else [str(int(h)) for h in keys])
            with out_ctx() as out:
                for i, name in enumerate(names):
                    if no_count:
                        out.write(f"{name}\n")
                    else:
                        out.write(name + " " + " ".join(
                            str(int(c)) for c in cnts[i]) + "\n")
        else:
            if matrix == "kmer":
                F.write_matrix_file(output, keys, cnts, k,
                                    config.count_bytes, 0, 0,
                                    compressed=cpr_out)
            else:
                F.write_matrix_hash_file(output, keys, cnts,
                                         config.count_bytes, 0, 0,
                                         compressed=cpr_out)
    elif pa_matrix:
        rows_k, rows_b = [], []
        bits = 0
        for p in range(nb):
            path = kmdir.get_matrix_path(p, "pa", "bin", pa_matrix, cpr_in)
            if pa_matrix == "kmer":
                info, kk, bb = F.read_pa_matrix_file(path)
            else:
                info, kk, bb = F.read_pa_hash_matrix_file(path)
            bits = info.bits
            rows_k.append(kk)
            rows_b.append(bb)
        keys = np.concatenate(rows_k)
        rows = np.concatenate(rows_b)
        if sorted_out:
            order = hops.sort_rows(keys.reshape(len(keys), -1))
            keys, rows = keys[order], rows[order]
        if fmt == "text":
            names = (kmers_to_strings(keys, k) if pa_matrix == "kmer"
                     else [str(int(h)) for h in keys])
            un = F.unpack_pa_bits(rows, bits)
            with out_ctx() as out:
                for i, name in enumerate(names):
                    if no_count:
                        out.write(f"{name}\n")
                    else:
                        out.write(name + " " + " ".join(
                            "1" if b else "0" for b in un[i]) + "\n")
        else:
            if pa_matrix == "kmer":
                F.write_pa_matrix_file(output, keys, rows, k, bits, 0, 0,
                                       compressed=cpr_out)
            else:
                F.write_pa_hash_matrix_file(output, keys, rows, bits, 0, 0,
                                            compressed=cpr_out)
    else:
        raise ValueError("aggregate: one of --count/--matrix/--pa-matrix "
                         "is required")
