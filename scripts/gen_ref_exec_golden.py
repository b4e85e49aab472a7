"""Generate golden fixtures by EXECUTING the reference's own header code.

The reference tree vendors only a few compilable third-party libs, but its
core headers kmer.hpp / minimizer.hpp are fully standalone and
bitmatrix.hpp compiles on x86 — so the strongest possible contract check
is to compile the reference's own classes, run them on random inputs, and
commit the outputs as fixtures (tests/data_ref_exec/) that our
implementations must reproduce byte for byte. This is how the bfc
bit-order bug was found (pack_v via the vendored bitpacker — see
test_units.py:test_pack_counting_bf_reference_golden).

Needs /root/reference mounted and g++. Run from the repo root:

    python scripts/gen_ref_exec_golden.py

Fixtures written (committed to git; tests skip nothing at run time):
  kmer_golden.tsv      k, m, seq, fwd words, canonical words, revcomp
                       string, minimizer value  (Kmer<32/64/96/128>)
  minim_valid_m{4,6,8}.bin  bitmask (LSB-first) of is_valid_minimizer
                       over all 4^m m-mer values
  bitmatrix_golden.bin random bit matrices + their reference transposes
"""

import os
import random
import subprocess
import sys
import tempfile

REF = "/root/reference"
HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "tests", "data_ref_exec")

KMER_DRIVER = r"""
#include <kmtricks/kmer.hpp>
#include <cstdio>
#include <cstdint>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>

template<size_t MK>
void emit(const std::string& seq, int m) {
  km::Kmer<MK> kk(seq);
  const int k = (int)seq.size();
  const int nw = (k + 31) / 32;
  auto canon = kk.canonical();
  auto rc = kk.rev_comp();
  std::printf("%d\t%d\t%s\t", k, m, seq.c_str());
  for (int i = 0; i < nw; i++)
    std::printf("%016llx%c", (unsigned long long)kk.get_data64()[i],
                i + 1 < nw ? ',' : '\t');
  for (int i = 0; i < nw; i++)
    std::printf("%016llx%c", (unsigned long long)canon.get_data64()[i],
                i + 1 < nw ? ',' : '\t');
  std::printf("%s\t%u\n", rc.to_string().c_str(),
              (unsigned)kk.minimizer((uint8_t)m).value());
}

int main(int argc, char** argv) {
  // mode 1: m-mer validity bitmasks
  if (argc > 1 && std::string(argv[1]) == "valid") {
    int m = std::atoi(argv[2]);
    size_t n = (size_t)1 << (2 * m);
    std::string mask((n + 7) / 8, '\0');
    for (size_t v = 0; v < n; v++)
      if (km::is_valid_minimizer((uint32_t)v, (uint8_t)m))
        mask[v >> 3] |= (char)(1 << (v & 7));
    fwrite(mask.data(), 1, mask.size(), stdout);
    return 0;
  }
  // mode 2 (default): "m seq" lines on stdin -> golden TSV on stdout
  std::string line;
  while (std::getline(std::cin, line)) {
    std::istringstream iss(line);
    int m; std::string seq;
    iss >> m >> seq;
    size_t k = seq.size();
    if (k <= 32) emit<32>(seq, m);
    else if (k <= 64) emit<64>(seq, m);
    else if (k <= 96) emit<96>(seq, m);
    else emit<128>(seq, m);
  }
  return 0;
}
"""

BITMATRIX_DRIVER = r"""
#include <kmtricks/bitmatrix.hpp>
#include <cstdio>
#include <cstdlib>
#include <cstring>

// stdin: [u32 n][u32 nbytes] then n*nbytes matrix bytes (n rows, bit
// matrix n x 8*nbytes); stdout: the reference transpose's raw bytes
// (8*nbytes rows x n/8 bytes).
int main() {
  uint32_t n, nbytes;
  if (fread(&n, 4, 1, stdin) != 1 || fread(&nbytes, 4, 1, stdin) != 1)
    return 1;
  km::BitMatrix mat(n, nbytes, true);
  if (fread(mat.matrix, 1, (size_t)n * nbytes, stdin) != (size_t)n * nbytes)
    return 1;
  km::BitMatrix* t = mat.transpose();
  // transposed raw bytes: (8*nbytes) rows x (n/8) bytes = n*nbytes total
  fwrite(t->matrix, 1, (size_t)n * nbytes, stdout);
  delete t;
  return 0;
}
"""


def compile_driver(src: str, out: str) -> None:
    srcp = out + ".cpp"
    with open(srcp, "w") as f:
        f.write(src)
    subprocess.run(
        ["g++", "-O2", "-std=c++17", f"-I{REF}/include",
         f"-I{REF}/thirdparty/sse2neon", srcp, "-o", out],
        check=True)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rng = random.Random(20260818)
    tmp = tempfile.mkdtemp()

    kmer_bin = os.path.join(tmp, "kmer_golden")
    compile_driver(KMER_DRIVER, kmer_bin)

    cases = []
    for k in (11, 20, 31, 32, 33, 45, 63, 64, 65, 96, 97, 127, 128):
        for m in (4, 8, 10):
            if m > k:
                continue
            for _ in range(24):
                cases.append((m, "".join(rng.choice("ACGT")
                                         for _ in range(k))))
            # adversarial: homopolymers (every m-mer invalid at m>=3),
            # AT repeats, palindromic-ish
            cases.append((m, "A" * k))
            cases.append((m, "AT" * (k // 2) + "A" * (k % 2)))
            cases.append((m, "AC" * (k // 2) + "G" * (k % 2)))
    stdin = "".join(f"{m} {s}\n" for m, s in cases)
    got = subprocess.run([kmer_bin], input=stdin, capture_output=True,
                         text=True, check=True).stdout
    with open(os.path.join(OUT, "kmer_golden.tsv"), "w") as f:
        f.write(got)
    print(f"kmer_golden.tsv: {len(got.splitlines())} rows")

    for m in (4, 6, 8):
        mask = subprocess.run([kmer_bin, "valid", str(m)],
                              capture_output=True, check=True).stdout
        with open(os.path.join(OUT, f"minim_valid_m{m}.bin"), "wb") as f:
            f.write(mask)
        print(f"minim_valid_m{m}.bin: {len(mask)} bytes")

    bm_bin = os.path.join(tmp, "bitmatrix_golden")
    compile_driver(BITMATRIX_DRIVER, bm_bin)
    import struct
    blob = bytearray()
    for n, nbytes in ((64, 8), (256, 4), (2048, 16), (8, 1)):
        data = bytes(rng.getrandbits(8) for _ in range(n * nbytes))
        t = subprocess.run(
            [bm_bin], input=struct.pack("<II", n, nbytes) + data,
            capture_output=True, check=True).stdout
        blob += struct.pack("<III", n, nbytes, len(t)) + data + t
    with open(os.path.join(OUT, "bitmatrix_golden.bin"), "wb") as f:
        f.write(blob)
    print(f"bitmatrix_golden.bin: {len(blob)} bytes")


if __name__ == "__main__":
    main()
