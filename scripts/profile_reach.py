"""On-chip profile of the production sPCR closures with debug logging.

Builds the 1M noisy bench table, then runs the full panel single-
threaded with sharkmer debug logging enabled, so every _drive_closure
call prints (roots, iters, visited, f_cap, done, wall). Adds wall
timers around the coarse phases.
"""
import logging
import sys
import tempfile
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench as B  # noqa: E402

from sharkmer_tpu.ops.sorted_store import SortedKmerStore  # noqa: E402
from sharkmer_tpu.pcr.counts import FilteredTable  # noqa: E402
from sharkmer_tpu.pcr.graph import compute_node_budget  # noqa: E402
from sharkmer_tpu.pcr.panels import get_panel  # noqa: E402
from sharkmer_tpu.stats import run_pcr  # noqa: E402

logging.basicConfig(stream=sys.stderr, level=logging.DEBUG,
                    format="%(relativeCreated)8.0fms %(message)s")
for noisy in ("jax", "jax._src", "urllib3", "requests"):
    logging.getLogger(noisy).setLevel(logging.WARNING)

args = B.build_parser().parse_args()
args.threads = 1

codes_all = B.make_reads_codes(args.reads, args.read_len, args.genome_mbp,
                               panel=args.panel, error_rate=args.error_rate)
n_batches = -(-args.reads // args.batch)
pad = n_batches * args.batch - args.reads
if pad:
    codes_all = np.concatenate(
        [codes_all, np.full((pad, args.read_len), 5, np.uint8)])

t0 = time.perf_counter()
store = SortedKmerStore.create(args.k)
for b in range(n_batches):
    store.ingest_codes(jnp.asarray(
        codes_all[b * args.batch:(b + 1) * args.batch]))
store.flush()
print(f"== count: {time.perf_counter()-t0:.2f}s", file=sys.stderr)

t0 = time.perf_counter()
filtered = FilteredTable(store, min_count=2)
filtered.warm_caches()
print(f"== warm_caches: {time.perf_counter()-t0:.2f}s", file=sys.stderr)

panel_params = get_panel(args.panel)
max_nodes = compute_node_budget(args.reads * args.read_len)
with tempfile.TemporaryDirectory() as outdir:
    t0 = time.perf_counter()
    results = run_pcr(filtered, panel_params, "bench", outdir + "/",
                      max_nodes=max_nodes, threads=args.threads)
    print(f"== sPCR total (1 thread): {time.perf_counter()-t0:.2f}s",
          file=sys.stderr)
for r in results:
    print(f"  {r.status} {r.gene_name} {r.product_lengths}", file=sys.stderr)
