"""Benchmark: k-mer counting throughput AND sPCR wall time on one chip.

Prints ONE JSON line:
  {"metric": "kmers_per_sec_per_chip", "value": N, "unit": "kmer/s",
   "vs_baseline": N, "spcr_wall_s": S, "spcr_genes_ok": G,
   "mirror_export_s": M, "e2e_wall_s": E, "e2e_vs_baseline": R}

Baseline: the reference counts 131,779,117 k-mer events from 1M
150bp reads in 22.5 s wall INCLUDING its full 7-gene cnidaria sPCR
pass, on an aarch64 12-core at 8 threads — 5.857e6 kmer/s
(BASELINE.md, benchmarks/benchmark_results/cnidaria_*:23,110-112).

The default (sorted backend) run reproduces that workload shape:
1M synthetic 150bp reads at ~7.5x coverage over a genome with the
cnidaria panel's 7 amplicons embedded, k=21. "value" times the core
count loop (encode + drain + merges + final spectrum); spcr_wall_s
times the full 7-gene panel through run_pcr against the built table
(host-mirror mode — the deployment default); mirror_export_s is the
device->host full-table transfer that mode pays once; e2e_wall_s is
count + sPCR, the honest end-to-end figure vs the reference's 22.5 s
(e2e_vs_baseline = 22.5 / e2e_wall_s).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

_T0 = time.perf_counter()


def _stage(msg: str) -> None:
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)

BASELINE_KMERS_PER_SEC = 131_779_117 / 22.5
BASELINE_E2E_WALL_S = 22.5  # reference: 1M-read cnidaria run, count+sPCR


def make_genome_codes(genome_mbp: float, seed: int = 0,
                      panel: str | None = None) -> np.ndarray:
    """uint8-code genome; optionally embeds one exact amplicon per
    primer pair of ``panel`` (IUPAC positions realized concretely)."""
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, size=int(genome_mbp * 1e6), dtype=np.uint8)
    if panel is None:
        return genome
    from sharkmer_tpu.ops.encoding import ascii_to_codes
    from sharkmer_tpu.pcr.panels import get_panel
    from sharkmer_tpu.pcr.params import IUPAC

    rc = str.maketrans("ACGT", "TGCA")
    pos = 1000
    for p in get_panel(panel):
        fwd = "".join(
            c if c in "ACGT" else rng.choice(list(IUPAC[c]))
            for c in p.forward_seq
        )
        rev = "".join(
            c if c in "ACGT" else rng.choice(list(IUPAC[c]))
            for c in p.reverse_seq
        )
        total = p.expected_length or (p.min_length + p.max_length) // 2
        insert = "".join(
            rng.choice(list("ACGT"), size=total - len(fwd) - len(rev))
        )
        amp = fwd + insert + rev.translate(rc)[::-1]
        # panel targets are high-copy genes (rRNA repeats, mito): embed
        # 8 copies so amplicon k-mers sit well above min_count at ~7.5x
        # genome-wide coverage, like real data
        codes = ascii_to_codes(amp)
        for _ in range(8):
            genome[pos : pos + len(codes)] = codes
            pos += len(codes) + 2000
    return genome


def make_reads_codes(n_reads: int, read_len: int, genome_mbp: float,
                     seed: int = 0, panel: str | None = None,
                     error_rate: float = 0.0):
    """Reads as uint8 code batches sliced straight out of a code genome.

    ``error_rate`` injects uniform random substitution errors per base
    (Illumina-like ~0.3-1%), the workload shape the reference's real
    ENA benchmarks have: error k-mers inflate the unique-key load ~5x
    and create the tips/bubbles the pruning machinery exists for."""
    rng = np.random.default_rng(seed)
    genome = make_genome_codes(genome_mbp, seed, panel)
    starts = rng.integers(0, len(genome) - read_len, size=n_reads)
    idx = starts[:, None] + np.arange(read_len)[None, :]
    reads = genome[idx]
    if error_rate > 0.0:
        err = rng.random(reads.shape) < error_rate
        # substitute with a DIFFERENT base: add 1..3 mod 4
        shift = rng.integers(1, 4, size=reads.shape, dtype=np.uint8)
        reads = np.where(err, (reads + shift) % 4, reads).astype(np.uint8)
    return reads


def build_parser() -> argparse.ArgumentParser:
    """Shared by profile_spcr.py so profiles track bench defaults."""
    parser = argparse.ArgumentParser()
    parser.add_argument("--reads", type=int, default=1_000_000)
    parser.add_argument("--read-len", type=int, default=150)
    parser.add_argument("--k", type=int, default=21)
    parser.add_argument("--genome-mbp", type=float, default=20.0)
    parser.add_argument("--batch", type=int, default=1 << 18)
    parser.add_argument("--capacity", type=int, default=1 << 26)
    parser.add_argument("--backend", choices=["sorted", "hash"],
                        default="sorted")
    parser.add_argument("--panel", default="cnidaria",
                        help="panel whose amplicons are embedded + amplified")
    parser.add_argument("--threads", type=int, default=4,
                        help="gene-level sPCR thread pool")
    parser.add_argument("--error-rate", type=float, default=0.0,
                        help="per-base sequencing-error rate for the reads")
    parser.add_argument("--mirror", choices=["auto", "full", "device"],
                        default="auto",
                        help="sPCR lookup strategy (auto = device "
                             "reach-prefetch, full = host mirror export)")
    parser.add_argument("--quick", action="store_true",
                        help="small shapes for smoke testing")
    return parser


def main():
    args = build_parser().parse_args()
    if args.quick:
        args.reads, args.batch = 50_000, 1 << 14
        args.capacity, args.genome_mbp = 1 << 22, 1.0
    return run_bench(args)


def run_bench(args):
    """Benchmark through the production store (sorted backend default,
    open-addressing hash backend with --backend hash): encode +
    aggregation + merges + final spectrum, then the full cnidaria sPCR
    panel against the built table. Warmup pass compiles every count
    shape, then the timed pass reruns the identical sequence on a
    fresh store."""
    import tempfile

    import jax.numpy as jnp

    if args.backend == "sorted":
        from sharkmer_tpu.ops.sorted_store import SortedKmerStore

        def make_store():
            return SortedKmerStore.create(args.k)
    else:
        from sharkmer_tpu.ops.hashtable import KmerTable

        def make_store():
            return KmerTable.create(args.k, capacity=args.capacity)

    k = args.k
    codes_all = make_reads_codes(
        args.reads, args.read_len, args.genome_mbp, panel=args.panel,
        error_rate=args.error_rate,
    )
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

    from sharkmer_tpu.pcr.counts import FilteredTable

    def one_pass():
        store = make_store()
        for codes in batches:
            # SortedKmerStore mutates and returns self; KmerTable is
            # functional and returns the updated table — rebind for both
            store = store.ingest_codes(codes)
        if hasattr(store, "flush"):
            store.flush()
        histo = store.histogram(10_000)
        return store, int(np.sum(histo))

    # warmup: compiles every kernel shape the timed passes will hit —
    # the count sequence AND the sPCR-prep (index/export) kernels
    _stage("warmup: count pass (compiles)")
    warm_store, _ = one_pass()
    _stage(f"warmup: sPCR prep, mode={args.mirror} (compiles)")
    FilteredTable(warm_store, min_count=2, mode=args.mirror).warm_caches()
    del warm_store
    _stage("timed: count pass")
    t0 = time.perf_counter()
    store, n_unique = one_pass()
    count_wall = time.perf_counter() - t0
    total_kmers = n_batches * kmers_per_batch
    assert n_unique > 0

    # ---- sPCR stage (the reference's 22.5 s includes this) ----------------
    from sharkmer_tpu.pcr.panels import get_panel
    from sharkmer_tpu.stats import run_pcr

    panel_params = get_panel(args.panel)
    _stage(f"timed: sPCR prep (mode={args.mirror})")
    t0 = time.perf_counter()
    filtered = FilteredTable(store, min_count=2, mode=args.mirror)
    # one-time device index build (auto) or full device->host export
    # (full); reported as mirror_export_s for round-over-round
    # comparability
    filtered.warm_caches()
    mirror_export_s = time.perf_counter() - t0

    # same dynamic node budget the CLI resolves (graph.rs:40-52)
    from sharkmer_tpu.pcr.graph import compute_node_budget

    max_nodes = compute_node_budget(args.reads * args.read_len)
    with tempfile.TemporaryDirectory() as outdir:
        _stage(f"timed: sPCR panel (node budget {max_nodes})")
        t0 = time.perf_counter()
        results = run_pcr(
            filtered, panel_params, "bench", outdir + "/",
            max_nodes=max_nodes, threads=args.threads,
        )
        spcr_wall = time.perf_counter() - t0
    genes_ok = sum(1 for r in results if r.status == "success")

    kmers_per_sec = total_kmers / count_wall
    e2e_wall = count_wall + mirror_export_s + spcr_wall
    print(json.dumps({
        "metric": "kmers_per_sec_per_chip",
        "value": round(kmers_per_sec),
        "unit": "kmer/s",
        "vs_baseline": round(kmers_per_sec / BASELINE_KMERS_PER_SEC, 3),
        "spcr_wall_s": round(spcr_wall, 2),
        "spcr_genes_ok": f"{genes_ok}/{len(panel_params)}",
        "mirror_export_s": round(mirror_export_s, 2),
        "e2e_wall_s": round(e2e_wall, 2),
        "e2e_vs_baseline": round(BASELINE_E2E_WALL_S / e2e_wall, 3),
    }))


if __name__ == "__main__":
    main()
