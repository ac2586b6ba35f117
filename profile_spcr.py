"""One-off: profile the sPCR phase of bench.py on the real chip.

Parameters come from bench.build_parser() so profiles always track the
bench defaults (pass the same flags bench.py accepts)."""
import cProfile
import pstats
import sys
import tempfile
import time

import numpy as np
import jax.numpy as jnp

import bench as B

args = B.build_parser().parse_args()
args.threads = 1  # profile single-threaded for readable output

from sharkmer_tpu.ops.sorted_store import SortedKmerStore
from sharkmer_tpu.pcr.counts import FilteredTable
from sharkmer_tpu.pcr.graph import compute_node_budget
from sharkmer_tpu.pcr.panels import get_panel
from sharkmer_tpu.stats import run_pcr

k = args.k
codes_all = B.make_reads_codes(args.reads, args.read_len, args.genome_mbp,
                               panel=args.panel, error_rate=args.error_rate)
n_batches = -(-args.reads // args.batch)
pad = n_batches * args.batch - args.reads
if pad:
    codes_all = np.concatenate(
        [codes_all, np.full((pad, args.read_len), 5, np.uint8)])
batches = [jnp.asarray(codes_all[b * args.batch:(b + 1) * args.batch])
           for b in range(n_batches)]

t0 = time.perf_counter()
store = SortedKmerStore.create(k)
for codes in batches:
    store.ingest_codes(codes)
store.flush()
print(f"count: {time.perf_counter()-t0:.2f}s", file=sys.stderr)

t0 = time.perf_counter()
filtered = FilteredTable(store, min_count=2)
filtered.warm_caches()
print(f"mirror warm_caches: {time.perf_counter()-t0:.2f}s", file=sys.stderr)

panel_params = get_panel(args.panel)
max_nodes = compute_node_budget(args.reads * args.read_len)
prof = cProfile.Profile()
with tempfile.TemporaryDirectory() as outdir:
    t0 = time.perf_counter()
    prof.enable()
    results = run_pcr(filtered, panel_params, "bench", outdir + "/",
                      max_nodes=max_nodes, threads=args.threads)
    prof.disable()
    print(f"sPCR (1 thread): {time.perf_counter()-t0:.2f}s", file=sys.stderr)
stats = pstats.Stats(prof, stream=sys.stderr)
stats.sort_stats("cumulative").print_stats(35)
stats.sort_stats("tottime").print_stats(25)
