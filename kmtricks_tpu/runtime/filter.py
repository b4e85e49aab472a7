"""`kmtricks filter` — intersect an existing matrix with a new sample.

Reference: include/kmtricks/matrix.hpp:23-341 (FilterTask two-pointer walks)
+ cmd.hpp:608-724 (driver): count the key sample with the run's repartition,
then per partition produce any of
  m: matrix rows present in the key (count mode: key count appended as an
     extra column; pa mode: original bit rows)
  v: one text line per matrix row — the key's count (count mode) or 1/0
     (pa mode), 0 for absent rows -> matrices/<p>.vec
  k: key k-mers absent from the matrix -> counts/partition_<p>/<key>.kmer
Vectorized here as sorted-array intersections instead of streaming walks.
"""

from __future__ import annotations

import os
import shutil

import numpy as np

from kmtricks_tpu.io import formats as F
from kmtricks_tpu.runtime.config import Config
from kmtricks_tpu.runtime.kmdir import KmDir
from kmtricks_tpu.runtime.pipeline import PipelineOptions, stage_count
from kmtricks_tpu.core.repartition import Repartition


def lex_view(rows: np.ndarray) -> np.ndarray:
    """(N, S) little-endian u64 rows -> (N,) void keys whose byte order
    matches lexicographic row order (most-significant word first,
    big-endian bytes)."""
    rows = np.atleast_2d(rows)
    be = rows[:, ::-1].astype(">u8")
    return np.ascontiguousarray(be).view(
        np.dtype((np.void, be.shape[1] * 8))).ravel()


def module_filter(in_matrix_dir: str, key_fof: str, output: str, *,
                  hard_min: int = 2, out_types: str = "k,m,v",
                  cpr: bool = False) -> None:
    want = set(t.strip() for t in out_types.split(","))
    src = KmDir.init(in_matrix_dir, first=False)
    config = Config.load(src.config_storage)
    rep = Repartition.load(src.repart_path)

    # find input matrices (pa preferred if present — cmd.hpp:630-647)
    in_matrices, partitions, mode = [], [], "count"
    for p in range(config.nb_partitions):
        mp = src.get_matrix_path(p, "pa", "bin", "kmer", False)
        mc = src.get_matrix_path(p, "count", "bin", "kmer", False)
        if os.path.exists(mp):
            mode = "pa"
            in_matrices.append(mp)
            partitions.append(p)
        elif os.path.exists(mc):
            mode = "count"
            in_matrices.append(mc)
            partitions.append(p)
    if not in_matrices:
        raise IOError("No files found for these parameters")

    out = KmDir.init(output, key_fof, first=True)
    if len(out.fof) > 1:
        raise ValueError("Filtering with many samples is not yet "
                         "implemented. Fof must contain only one sample.")
    shutil.copytree(src.config_storage, out.config_storage,
                    dirs_exist_ok=True)
    shutil.copytree(src.repart_storage, out.repart_storage,
                    dirs_exist_ok=True)
    if os.path.exists(src.hash_win):
        shutil.copyfile(src.hash_win, out.hash_win)

    # count the key with the run's repartition
    sid = out.fof.entries[0].id
    opts = PipelineOptions(run_dir=output, kmer_size=config.kmer_size,
                           minim_size=config.minim_size, hard_min=hard_min,
                           mode="kmer:count:bin", cpr=cpr)
    out.init_parts(config.nb_partitions)
    stage_count(out, config, rep, 0, opts, partitions=partitions)

    for mp, p in zip(in_matrices, partitions):
        _, kk, kc = F.read_kmer_file(
            out.get_count_part_path(sid, p, cpr, "kmer"))
        if mode == "count":
            info, mk, mc = F.read_matrix_file(mp, config.count_bytes)
        else:
            info, mk, mrows = F.read_pa_matrix_file(mp)

        kv = lex_view(kk)
        mv = lex_view(mk)
        key_in_mat = np.isin(kv, mv)
        mat_pos_of_key = np.searchsorted(mv, kv[key_in_mat])
        mat_in_key = np.zeros(len(mv), dtype=bool)
        mat_in_key[mat_pos_of_key] = True
        key_count_of_row = np.zeros(len(mv), dtype=np.uint32)
        key_count_of_row[mat_pos_of_key] = kc[key_in_mat]

        if "v" in want:
            with open(f"{out.matrix_storage}/{p}.vec", "w") as f:
                if mode == "count":
                    f.write("".join(f"{int(c)}\n"
                                    for c in key_count_of_row))
                else:
                    f.write("".join("1\n" if b else "0\n"
                                    for b in mat_in_key))
        if "m" in want:
            omp = out.get_matrix_path(p, mode, "bin", "kmer", cpr)
            if mode == "count":
                newc = np.hstack([mc[mat_in_key],
                                  key_count_of_row[mat_in_key][:, None]])
                F.write_matrix_file(omp, mk[mat_in_key], newc,
                                    config.kmer_size, config.count_bytes,
                                    info.id, p, compressed=cpr,
                                    header_count_slots=info.count_slots)
            else:
                F.write_pa_matrix_file(omp, mk[mat_in_key],
                                       mrows[mat_in_key],
                                       config.kmer_size, info.bits,
                                       info.id, p, compressed=cpr)
        # key k-mers absent from the matrix replace the counted partition
        # (cmd.hpp:713-723); without 'k' the counted files are removed
        kpath = out.get_count_part_path(sid, p, cpr, "kmer")
        if "k" in want:
            F.write_kmer_file(kpath, kk[~key_in_mat], kc[~key_in_mat],
                              config.kmer_size, config.count_bytes, 0, p,
                              compressed=cpr)
        else:
            os.remove(kpath)
