"""Measured-and-retired Pallas experiments, kept as tested records.

These kernels are correct but LOST their on-chip benchmarks against the
XLA paths they were meant to replace (see NOTES.md):

- pallas_encode / pallas_encode_pack: fused encode(+hash+pack) kernels —
  measured a TIE vs the jnp encode (XLA already fuses this dataflow to
  VPU issue limits).
- ops/pallas_sort.py's FULL-sort path (sort_u32, default off behind
  KMTRICKS_TPU_SORT=pallas) measured 16.2 ms vs 10.8 ms lax.sort at
  4.19M; it stays in ops/ because its merge-path levels ARE the
  production routed-run merge (merge_sorted_runs_words).

Nothing in the production import graph references this package.
"""
