"""`kmtricks combine` — merge the matrices of multiple compatible runs.

Reference: include/kmtricks/matrix.hpp:398-913 (MatrixMerger) + cmd.hpp:
370-437: the runs must share a byte-identical repartition (and hash window
in hash mode); the combined run dir gets copied config/repartition/
hash.info, a concatenated fof (duplicate sample ids renamed), and one
merged matrix per partition where each source occupies a column block
(rows missing from a source get zero columns).
"""

from __future__ import annotations

import os
import shutil

import numpy as np

from kmtricks_tpu.io import formats as F
from kmtricks_tpu.io.fof import Fof, FofEntry
from kmtricks_tpu.runtime.config import Config
from kmtricks_tpu.runtime.filter import lex_view
from kmtricks_tpu.runtime.kmdir import KmDir


def _mode_of(run_dir: str) -> str:
    opt_path = os.path.join(run_dir, "options.txt")
    with open(opt_path) as f:
        for line in f:
            if line.startswith("mode:"):
                return line.split(":", 1)[1].strip()
    raise IOError(f"mode not found in {opt_path}")


def module_combine(run_dirs: list[str], output: str) -> None:
    if len(run_dirs) < 2:
        raise ValueError("combine requires >= 2 runs")
    srcs = [KmDir.init(d, first=False) for d in run_dirs]
    configs = [Config.load(s.config_storage) for s in srcs]
    mode_full = _mode_of(run_dirs[0])
    cf, mode, out = mode_full.split(":")

    # sanity: byte-identical repartitions (matrix.hpp:717-733)
    ref_repart = open(srcs[0].repart_path, "rb").read()
    for s in srcs[1:]:
        if open(s.repart_path, "rb").read() != ref_repart:
            raise ValueError("combine: repartitions differ between runs")
        if _mode_of(s.root) != mode_full:
            raise ValueError("combine: modes differ between runs")
    if cf == "hash":
        ref_hw = open(srcs[0].hash_win, "rb").read()
        for s in srcs[1:]:
            if open(s.hash_win, "rb").read() != ref_hw:
                raise ValueError("combine: hash windows differ between runs")

    config = configs[0]
    # combined fof: plain concat; if ids collide, EVERY id is renamed to
    # "{id}_{run_index}" (MatrixMerger::cat_fof / cat_fof_and_rename,
    # matrix.hpp:824-871)
    entries: list[FofEntry] = []
    col_offsets = []
    total_cols = 0
    all_ids = [e.id for s in srcs for e in s.fof]
    rename = len(set(all_ids)) != len(all_ids)
    for ri, s in enumerate(srcs):
        col_offsets.append(total_cols)
        for e in s.fof:
            ident = f"{e.id}_{ri}" if rename else e.id
            entries.append(FofEntry(ident, e.paths, e.abundance_min))
        total_cols += len(s.fof)

    os.makedirs(output, exist_ok=True)
    Fof(entries).write(os.path.join(output, "combine.fof"))
    dst = KmDir.init(output, os.path.join(output, "combine.fof"), first=True)
    shutil.copytree(srcs[0].config_storage, dst.config_storage,
                    dirs_exist_ok=True)
    shutil.copytree(srcs[0].repart_storage, dst.repart_storage,
                    dirs_exist_ok=True)
    if os.path.exists(srcs[0].hash_win):
        shutil.copyfile(srcs[0].hash_win, dst.hash_win)
    with open(dst.options_path, "w") as f:
        f.write(f"mode: {mode_full}\n")

    ncols = [len(s.fof) for s in srcs]
    for p in range(config.nb_partitions):
        all_keys, per_run = [], []
        for ri, s in enumerate(srcs):
            path = s.get_matrix_path(p, mode, "bin", cf, False)
            if not os.path.exists(path):
                per_run.append(None)
                continue
            if mode == "count":
                if cf == "kmer":
                    _, kk, cc = F.read_matrix_file(path, config.count_bytes)
                else:
                    _, kk, cc = F.read_matrix_hash_file(path)
            else:
                if cf == "kmer":
                    info, kk, rows = F.read_pa_matrix_file(path)
                else:
                    info, kk, rows = F.read_pa_hash_matrix_file(path)
                cc = F.unpack_pa_bits(rows, info.bits)
            if kk.ndim == 1:      # hash keys -> one row slot (works for
                kk = kk.reshape(-1, 1)   # empty partitions too)
            per_run.append((kk, cc))
            all_keys.append(kk)
        if not all_keys:
            continue
        cat = np.concatenate(all_keys)
        # np.unique returns first-occurrence indices in sorted key order
        uview, idx = np.unique(lex_view(cat), return_index=True)
        ukeys = cat[idx]
        nrows = len(ukeys)
        if mode == "count":
            comb = np.zeros((nrows, total_cols),
                            dtype=F._count_dtype(config.count_bytes))
        else:
            comb = np.zeros((nrows, total_cols), dtype=bool)
        for ri, item in enumerate(per_run):
            if item is None:
                continue
            kk, cc = item
            pos = np.searchsorted(uview, lex_view(kk))
            comb[pos, col_offsets[ri]:col_offsets[ri] + ncols[ri]] = \
                cc[:, :ncols[ri]]

        opath = dst.get_matrix_path(p, mode, "bin", cf, False)
        okeys = ukeys if cf == "kmer" else ukeys.ravel()
        if mode == "count":
            if cf == "kmer":
                F.write_matrix_file(opath, okeys, comb, config.kmer_size,
                                    config.count_bytes, 0, p)
            else:
                F.write_matrix_hash_file(opath, okeys, comb,
                                         config.count_bytes, 0, p)
        else:
            rows = F.pack_pa_bits(comb)
            if cf == "kmer":
                F.write_pa_matrix_file(opath, okeys, rows,
                                       config.kmer_size, total_cols, 0, p)
            else:
                F.write_pa_hash_matrix_file(opath, okeys, rows,
                                            total_cols, 0, p)
