"""Execute GATB's ConfigurationAlgorithm + Repartitor and capture goldens.

Verifies, against the reference's OWN executed code:
  * the ConfigurationAlgorithm plan (estimates, volume, kmersNb,
    nb_passes, nb_partitions, cached-items) for given banks/params —
    the semantics our runtime/config.py:gatb_partition_plan mirrors;
  * the GATB Storage bytes of Configuration::save — our
    config_gatb/gatb.config twin;
  * Repartitor::computeDistrib (greedy LPT over per-minimizer kx-mer
    tallies, PartiInfo.cpp:48-106) — our core/repartition.from_bin_sizes;
  * the Storage bytes of Repartitor::save — our repartition file writer.

Run from the repo root (builds gatb via scripts/gen_gatb_golden.py's
ensure_gatb):

    python scripts/gen_gatb_config_golden.py

Fixtures (committed to tests/data_ref_exec/):
  config_golden.tsv      one row per case: params + every computed field
                         + hex of the saved config file (available-space
                         field normalized to zero — machine-dependent)
  repart_golden.tsv      nbpart, m, seed + the full table + file hex
"""

import os
import random
import struct
import subprocess
import tempfile

from gen_gatb_golden import REF, BUILD, ensure_gatb  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "tests", "data_ref_exec")

DRIVER = r"""
#include <gatb/gatb_core.hpp>
#include <gatb/kmer/impl/ConfigurationAlgorithm.hpp>
#include <cstdio>
#include <cstdlib>
#include <iostream>
#include <sstream>
#include <string>

using namespace gatb::core;
using namespace gatb::core::kmer::impl;
using namespace gatb::core::tools::misc::impl;
using namespace gatb::core::tools::storage::impl;

template<size_t span>
void config_run(int argc, char** argv) {
  int k = atoi(argv[2]);
  int m = atoi(argv[3]);
  int minim_type = atoi(argv[4]);
  int repart_type = atoi(argv[5]);
  int amin = atoi(argv[6]);
  int nb_parts = atoi(argv[7]);
  int max_memory = atoi(argv[8]);
  const char* files = argv[9];
  const char* outdir = argv[10];

  // get_config_properties (kmtricks gatb_utils.hpp:61-84), verbatim
  IProperties* props = new Properties();
  props->add(0, "-kmer-size", "%d", k);
  props->add(0, "-minimizer-size", "%d", m);
  props->add(0, "-minimizer-type", "%d", minim_type);
  props->add(0, "-repartition-type", "%d", repart_type);
  props->add(0, "-abundance-min", "%d", amin);
  props->add(0, "-abundance-max", "%d", 4294967295);
  props->add(0, "-solidity-kind", "sum");
  props->add(0, "-max-disk", "%d", 0);
  props->add(0, "-max-memory", "%d", max_memory);
  props->add(0, "-nb-cores", "%d", 1);
  props->add(0, "-storage-type", "0");
  props->add(0, "nb_partitions", "%d", nb_parts);

  bank::IBank* bank = bank::impl::Bank::open(files);
  LOCAL(bank);
  ConfigurationAlgorithm<span> alg(bank, props);
  alg.execute();
  Configuration config = alg.getConfiguration();

  // ConfigTask overrides (kmtricks task.hpp:112-115)
  if (nb_parts != 0) config._nb_partitions = nb_parts;
  if (config._nb_partitions < 4) config._nb_partitions = 4;

  std::printf("estimateSeqNb=%llu estimateSeqTotalSize=%llu "
              "estimateSeqMaxSize=%llu volume=%llu kmersNb=%llu "
              "nb_passes=%u nb_partitions=%u nb_bits_per_kmer=%u "
              "nb_banks=%u nb_cached=%u available_space=%llu\n",
              (unsigned long long)config._estimateSeqNb,
              (unsigned long long)config._estimateSeqTotalSize,
              (unsigned long long)config._estimateSeqMaxSize,
              (unsigned long long)config._volume,
              (unsigned long long)config._kmersNb,
              config._nb_passes, config._nb_partitions,
              config._nb_bits_per_kmer, config._nb_banks,
              config._nb_cached_items_per_core_per_part,
              (unsigned long long)config._available_space);

  Storage* st = StorageFactory(STORAGE_FILE).create(
      std::string(outdir) + "/config_gatb", true, false);
  LOCAL(st);
  config.save(st->getGroup("gatb"));
}

int main(int argc, char** argv) {
  std::string mode = argv[1];
  if (mode == "estimate") {
    // BankFasta::estimate, as ConfigurationAlgorithm consumes it
    bank::IBank* bank = bank::impl::Bank::open(argv[2]);
    LOCAL(bank);
    u_int64_t number = 0, totalSize = 0, maxSize = 0;
    bank->estimate(number, totalSize, maxSize);
    std::printf("%llu %llu %llu\n", (unsigned long long)number,
                (unsigned long long)totalSize,
                (unsigned long long)maxSize);
    return 0;
  }
  if (mode == "config") {
    int k = atoi(argv[2]);
    if (k < 32) config_run<32>(argc, argv);
    else if (k < 64) config_run<64>(argc, argv);
    else if (k < 96) config_run<96>(argc, argv);
    else config_run<128>(argc, argv);
    return 0;
  }
  // repart: argv[2]=nbpart argv[3]=m argv[4]=outdir; stdin "minim count"
  int nbpart = atoi(argv[2]);
  int m = atoi(argv[3]);
  const char* outdir = argv[4];
  PartiInfo<5> pinfo(nbpart, m);
  std::string line;
  while (std::getline(std::cin, line)) {
    std::istringstream iss(line);
    unsigned long long minim, count;
    iss >> minim >> count;
    pinfo.incKxmer_per_minimBin((int)minim, count);
  }
  Repartitor rep(nbpart, m);
  rep.computeDistrib(pinfo);
  Storage* st = StorageFactory(STORAGE_FILE).create(
      std::string(outdir) + "/repart_gatb", true, false);
  LOCAL(st);
  rep.save(st->getGroup(""));
  // dump the table
  for (unsigned long long v = 0; v < (1ULL << (2 * m)); v++)
    std::printf("%u ", rep(v));   // operator(): minim -> partition
  std::printf("\n");
  return 0;
}
"""


def build_driver() -> str:
    lib = ensure_gatb()
    tmp = tempfile.mkdtemp()
    exe = os.path.join(tmp, "gatb_config_golden")
    src = exe + ".cpp"
    with open(src, "w") as f:
        f.write(DRIVER)
    subprocess.run(
        ["g++", "-O2", "-std=c++17", f"-I{REF}/src", f"-I{BUILD}/include",
         f"-I{REF}/thirdparty", src, lib, "-o", exe,
         "-lz", "-lpthread", "-ldl"],
        check=True)
    return exe


def _find_storage_file(root):
    hits = []
    for d, _, fs in os.walk(root):
        for f in fs:
            hits.append(os.path.join(d, f))
    assert len(hits) == 1, hits
    return hits[0]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    exe = build_driver()
    rng = random.Random(20260818)
    tmp = tempfile.mkdtemp()

    # --- config cases: synthetic small banks (fully readable -> exact
    # estimates on both sides) over a parameter grid
    rows = []
    for case in range(10):
        k = rng.choice([21, 31, 32, 47, 63, 65, 111])
        m = rng.choice([8, 10])
        amin = rng.choice([1, 2])
        nb_parts = rng.choice([0, 4, 7, 16])
        max_memory = rng.choice([100, 2000, 8000])
        nfiles = rng.randint(1, 3)
        files = []
        for i in range(nfiles):
            p = os.path.join(tmp, f"c{case}_{i}.fasta")
            with open(p, "w") as f:
                for r in range(rng.randint(3, 30)):
                    L = rng.randint(k, k + 300)
                    f.write(f">r{r}\n" + "".join(
                        rng.choice("ACGT") for _ in range(L)) + "\n")
            files.append(p)
        outdir = os.path.join(tmp, f"out{case}")
        os.makedirs(outdir)
        got = subprocess.run(
            [exe, "config", str(k), str(m), "0", "0", str(amin),
             str(nb_parts), str(max_memory), ",".join(files), outdir],
            capture_output=True, text=True, check=True).stdout.strip()
        blob = open(_find_storage_file(outdir), "rb").read()
        rel = [os.path.basename(f) for f in files]
        sizes = [os.path.getsize(f) for f in files]
        rows.append("\t".join([
            str(k), str(m), str(amin), str(nb_parts), str(max_memory),
            ",".join(rel), ",".join(map(str, sizes)), got, blob.hex()]))
        # keep the bank files for the test to re-run our configure on
        for f in files:
            os.rename(f, os.path.join(OUT, os.path.basename(f)))
    with open(os.path.join(OUT, "config_golden.tsv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"config_golden.tsv: {len(rows)} cases")

    # --- repart cases: synthetic per-minimizer kx-mer tallies
    rows = []
    for case in range(8):
        m = rng.choice([4, 5, 6])
        nbpart = rng.choice([3, 4, 8, 13])
        nm = 4 ** m
        counts = {}
        for _ in range(rng.randint(nm // 4, nm)):
            counts[rng.randrange(nm)] = rng.randint(0, 100000)
        stdin = "".join(f"{mm} {c}\n" for mm, c in sorted(counts.items()))
        outdir = os.path.join(tmp, f"rep{case}")
        os.makedirs(outdir)
        got = subprocess.run([exe, "repart", str(nbpart), str(m), outdir],
                             input=stdin, capture_output=True, text=True,
                             check=True).stdout.strip()
        blob = open(_find_storage_file(outdir), "rb").read()
        counts_s = ",".join(f"{mm}:{c}" for mm, c in sorted(counts.items()))
        rows.append("\t".join([str(nbpart), str(m), counts_s,
                               got.replace(" ", ","), blob.hex()]))
    with open(os.path.join(OUT, "repart_golden.tsv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"repart_golden.tsv: {len(rows)} cases")

    # --- estimate cases: banks AROUND and ABOVE the 50000-sequence
    # threshold, plain and gz, fasta (multi-line) and fastq — committed
    # gz so the byte streams are reproducible
    import gzip as _gzip
    rows = []
    specs = [("fa_small", "fasta", 300, 80, False, 1),
             ("fa_multiline", "fasta", 2000, 400, False, 60),
             ("fa_big", "fasta", 60050, 90, False, 1),
             ("fq_big", "fastq", 55000, 100, False, 1),
             ("fa_big_gz", "fasta", 60050, 90, True, 1),
             ("fq_gz", "fastq", 20000, 120, True, 1)]
    for name, fmt, nreads, rl, gz, wrap in specs:
        fn = name + (".fasta" if fmt == "fasta" else ".fastq") + \
            (".gz" if gz else "")
        path = os.path.join(OUT, fn)
        out = []
        for r in range(nreads):
            L = rl + (r % 23)
            seq = "".join(rng.choice("ACGT") for _ in range(L))
            if fmt == "fasta":
                body = "\n".join(seq[i:i + wrap] for i in
                                 range(0, len(seq), wrap)) if wrap > 1 \
                    else seq
                out.append(f">r{r}\n{body}\n")
            else:
                out.append(f"@r{r}\n{seq}\n+\n{'I' * L}\n")
        raw = "".join(out).encode()
        if gz:
            with open(path, "wb") as f:
                f.write(_gzip.compress(raw))
        else:
            with open(path, "wb") as f:
                f.write(raw)
        got = subprocess.run([exe, "estimate", path], capture_output=True,
                             text=True, check=True).stdout.split()
        rows.append("\t".join([fn, fmt, str(nreads)] + got))
        print(f"estimate {fn}: {got}")
    with open(os.path.join(OUT, "estimate_golden.tsv"), "w") as f:
        f.write("\n".join(rows) + "\n")


if __name__ == "__main__":
    main()
