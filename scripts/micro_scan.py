"""Steady-state wall of warm_panel_scans (batched panel scan kernel)."""
import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench as B  # noqa: E402

from sharkmer_tpu.ops.sorted_store import SortedKmerStore  # noqa: E402
from sharkmer_tpu.pcr.counts import FilteredTable  # noqa: E402
from sharkmer_tpu.pcr.panels import get_panel  # noqa: E402
from sharkmer_tpu.pcr.primers import warm_panel_scans  # noqa: E402

args = B.build_parser().parse_args()
codes_all = B.make_reads_codes(args.reads, args.read_len, args.genome_mbp,
                               panel=args.panel, error_rate=args.error_rate)
n_batches = -(-args.reads // args.batch)
store = SortedKmerStore.create(args.k)
for b in range(n_batches):
    store.ingest_codes(jnp.asarray(
        codes_all[b * args.batch:(b + 1) * args.batch]))
store.flush()
print("table built", file=sys.stderr)

filtered = FilteredTable(store, min_count=2)
filtered.table.prepare_spcr()
panel = get_panel(args.panel)
for rep in range(3):
    filtered._scan_cache.clear()
    t0 = time.perf_counter()
    warm_panel_scans(filtered, panel)
    print(f"warm_panel_scans rep{rep}: {time.perf_counter()-t0:.3f}s "
          f"({len(filtered._scan_cache)} cached scans)", file=sys.stderr)
