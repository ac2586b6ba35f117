"""Count-table checkpointing.

The reference has no in-process checkpointing (SURVEY.md §5); its
closest analogs are the read cache and per-chunk snapshots. Here the
expensive Pass 1 product — the device count table — can be saved after
consolidation and reloaded later to re-run sPCR with different panels
or knobs without re-counting:

  sharkmer reads.fastq -s s --save-table s.table.npz ...
  sharkmer --load-table s.table.npz -s s --pcr-panel cnidaria ...

Format: a single .npz with keys/counts plus metadata (k, layout,
ingest stats). Sharded tables save their per-shard arrays and can be
reloaded onto a mesh of a different size (reload goes through a
fresh insert, so owner routing is recomputed).
"""

from __future__ import annotations

import json
import logging

import numpy as np

from ..ops.encoding import KMER_SENTINEL
from ..ops.hashtable import KmerTable

log = logging.getLogger("sharkmer")

FORMAT_VERSION = 1


def save_table(path: str, table, stats=None) -> None:
    """Save any count backend (hash / sorted / sharded) to .npz."""
    if hasattr(table, "to_sorted_arrays"):
        keys, counts = table.to_sorted_arrays()
    else:
        keys = np.asarray(table.keys).reshape(-1)
        counts = np.asarray(table.counts).reshape(-1)
    meta = {
        "format_version": FORMAT_VERSION,
        "k": table.k,
        "backend": type(table).__name__,
    }
    if stats is not None:
        meta["stats"] = stats.__dict__
    np.savez_compressed(
        path, keys=keys, counts=counts, meta=json.dumps(meta)
    )
    occ = int((keys != np.uint64(KMER_SENTINEL)).sum())
    log.info("Saved count table to %s (%d unique kmers)", path, occ)


def load_table(path: str, n_shards: int = 1, capacity: int | None = None,
               backend: str = "sorted"):
    """Load a checkpoint into a (possibly sharded) table.

    Returns (table, stats_dict | None). Keys are re-inserted rather
    than restored slot-for-slot, so the target capacity/mesh is free
    to differ from the saved one.
    """
    with np.load(path, allow_pickle=False) as data:
        keys = data["keys"]
        counts = data["counts"]
        meta = json.loads(str(data["meta"]))
    if meta.get("format_version") != FORMAT_VERSION:
        raise ValueError(
            f"Unsupported table checkpoint version: {meta.get('format_version')}"
        )
    k = int(meta["k"])
    occ = keys != np.uint64(KMER_SENTINEL)
    kmers = keys[occ]
    kcounts = counts[occ].astype(np.uint32)

    if capacity is None:
        capacity = max(1 << 14, 1 << int(len(kmers) / 0.6).bit_length())

    if n_shards > 1:
        from ..parallel.sharded_table import ShardedKmerTable, make_mesh

        mesh = make_mesh(n_shards)
        local = 1 << max(10, (capacity // n_shards - 1).bit_length())
        table = ShardedKmerTable.create(k, mesh, local)
    elif backend == "hash":
        table = KmerTable.create(k, capacity)
    else:
        from ..ops.sorted_store import SortedKmerStore

        table = SortedKmerStore.create(k)

    # bulk re-insert in slabs to bound peak memory
    step = 1 << 22
    for i in range(0, len(kmers), step):
        table = table.insert_kmers(kmers[i : i + step], kcounts[i : i + step])

    log.info(
        "Loaded count table from %s (%d unique kmers, k=%d)",
        path, len(kmers), k,
    )
    return table, meta.get("stats")
