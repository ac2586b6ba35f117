"""Benchmark: canonical k-mer counting throughput on one chip.

Prints ONE JSON line:
  {"metric": "kmers_per_sec_per_chip", "value": N, "unit": "kmer/s",
   "vs_baseline": N}

Baseline: the reference counts 131,779,117 k-mer events from 1M
150bp reads in 22.5 s wall (including its full sPCR pass) on an
aarch64 12-core at 8 threads — 5.857e6 kmer/s
(BASELINE.md, benchmarks/benchmark_results/cnidaria_*:23,110-112).
This bench measures the core count loop (encode + aggregate +
table insert + final spectrum) at k=21 on synthetic 150bp reads
drawn from a random genome at ~7x coverage.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

BASELINE_KMERS_PER_SEC = 131_779_117 / 22.5


def make_reads_codes(n_reads: int, read_len: int, genome_mbp: float, seed: int = 0):
    """Reads as uint8 code batches sliced straight out of a code genome."""
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, size=int(genome_mbp * 1e6), dtype=np.uint8)
    starts = rng.integers(0, len(genome) - read_len, size=n_reads)
    idx = starts[:, None] + np.arange(read_len)[None, :]
    return genome[idx]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--reads", type=int, default=1_000_000)
    parser.add_argument("--read-len", type=int, default=150)
    parser.add_argument("--k", type=int, default=21)
    parser.add_argument("--genome-mbp", type=float, default=20.0)
    parser.add_argument("--batch", type=int, default=1 << 18)
    parser.add_argument("--capacity", type=int, default=1 << 26)
    parser.add_argument("--backend", choices=["sorted", "hash"],
                        default="sorted")
    parser.add_argument("--quick", action="store_true",
                        help="small shapes for smoke testing")
    args = parser.parse_args()

    if args.quick:
        args.reads, args.batch = 50_000, 1 << 14
        args.capacity, args.genome_mbp = 1 << 22, 2.0

    import jax
    import jax.numpy as jnp

    from sharkmer_tpu.ops.encoding import canonical_kmers
    from sharkmer_tpu.ops.hashtable import (
        KmerTable,
        _histogram_kernel,
        _insert_kernel,
    )

    k = args.k
    if args.backend == "sorted":
        return run_sorted(args)
    codes_all = make_reads_codes(args.reads, args.read_len, args.genome_mbp)
    n_batches = -(-args.reads // args.batch)

    # pad the read count so every batch compiles to one shape
    pad = n_batches * args.batch - args.reads
    if pad:
        codes_all = np.concatenate(
            [codes_all, np.full((pad, args.read_len), 5, np.uint8)]
        )

    @jax.jit
    def step(keys, counts, n_acc, codes):
        kmers, valid = canonical_kmers(codes, k)
        keys, counts = _insert_kernel(
            keys, counts, kmers.reshape(-1),
            jnp.ones((kmers.size,), jnp.uint32),
        )
        return keys, counts, n_acc + jnp.sum(valid, dtype=jnp.uint64)

    table = KmerTable.create(k, capacity=args.capacity)
    keys, counts = table.keys, table.counts
    n_acc = jnp.zeros((), jnp.uint64)

    # warmup / compile on the first batch shape
    codes0 = jnp.asarray(codes_all[: args.batch])
    keys, counts, n_acc = step(keys, counts, n_acc, codes0)
    _ = int(n_acc)
    # reset table state after warmup so timing includes identical work
    table = KmerTable.create(k, capacity=args.capacity)
    keys, counts = table.keys, table.counts
    n_acc = jnp.zeros((), jnp.uint64)

    t0 = time.perf_counter()
    for b in range(n_batches):
        codes = jnp.asarray(codes_all[b * args.batch : (b + 1) * args.batch])
        keys, counts, n_acc = step(keys, counts, n_acc, codes)
    histo = _histogram_kernel(counts, 10_000)
    total_kmers = int(n_acc)  # forces the whole chain to completion
    n_unique = int(jnp.sum(histo))
    elapsed = time.perf_counter() - t0
    assert n_unique > 0

    kmers_per_sec = total_kmers / elapsed
    print(json.dumps({
        "metric": "kmers_per_sec_per_chip",
        "value": round(kmers_per_sec),
        "unit": "kmer/s",
        "vs_baseline": round(kmers_per_sec / BASELINE_KMERS_PER_SEC, 3),
    }))


def run_sorted(args):
    """Sorted-run backend benchmark through the production store
    (SortedKmerStore): encode + sort/RLE aggregation + LSM merges +
    final spectrum. Warmup pass compiles every shape, then the timed
    pass reruns the identical sequence on a fresh store."""
    import jax
    import jax.numpy as jnp

    from sharkmer_tpu.ops.encoding import canonical_kmers
    from sharkmer_tpu.ops.sorted_store import SortedKmerStore

    k = args.k
    codes_all = make_reads_codes(args.reads, args.read_len, args.genome_mbp)
    n_batches = -(-args.reads // args.batch)
    pad = n_batches * args.batch - args.reads
    if pad:
        codes_all = np.concatenate(
            [codes_all, np.full((pad, args.read_len), 5, np.uint8)]
        )

    batches = [
        jnp.asarray(codes_all[b * args.batch : (b + 1) * args.batch])
        for b in range(n_batches)
    ]
    kmers_per_batch = args.batch * (args.read_len - k + 1)

    def one_pass():
        store = SortedKmerStore.create(k)
        for codes in batches:
            store.ingest_codes(codes)
        store.flush()
        histo = store.histogram(10_000)
        return int(np.sum(histo))

    n_unique = one_pass()  # warmup: compiles every shape in the sequence
    t0 = time.perf_counter()
    n_unique = one_pass()
    elapsed = time.perf_counter() - t0
    total_kmers = n_batches * kmers_per_batch
    assert n_unique > 0

    kmers_per_sec = total_kmers / elapsed
    print(json.dumps({
        "metric": "kmers_per_sec_per_chip",
        "value": round(kmers_per_sec),
        "unit": "kmer/s",
        "vs_baseline": round(kmers_per_sec / BASELINE_KMERS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
