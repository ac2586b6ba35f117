"""Host-side count views for the sPCR engine.

``SmallCounts`` is the host equivalent of the reference's small
``KmerCounts`` result tables (primer-matching k-mers — tens of
entries). ``FilteredTable`` is the lazy min-count view over the device
table (``FilteredKmerCounts``, counting.rs:316-350): lookups apply the
global --min-kmer-count threshold on the fly, no data is copied.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..ops.encoding import revcomp_kmer
from ..ops.hashtable import KmerTable


class SmallCounts:
    """Tiny kmer -> count map with the reference's stat accessors."""

    def __init__(self, k: int, items: dict[int, int] | None = None):
        self.k = k
        self.data: dict[int, int] = dict(items or {})

    def insert(self, kmer: int, count: int) -> None:
        cur = self.data.get(kmer, 0)
        self.data[kmer] = min(cur + count, 0xFFFF_FFFF)

    def get(self, kmer: int) -> int | None:
        return self.data.get(kmer)

    def __len__(self) -> int:
        return len(self.data)

    def __bool__(self) -> bool:
        return bool(self.data)

    def items(self):
        return self.data.items()

    def kmers(self) -> list[int]:
        return list(self.data.keys())

    def get_max_count(self) -> int:
        return max(self.data.values(), default=0)

    def get_median_count(self) -> int:
        """Integer median with the reference's even-length halving
        semantics: (lower_max // 2) + (upper_min // 2)
        (counting.rs:275-298)."""
        counts = sorted(self.data.values())
        if not counts:
            return 0
        mid = len(counts) // 2
        if len(counts) % 2 == 0:
            return counts[mid - 1] // 2 + counts[mid] // 2
        return counts[mid]


@dataclass
class FilteredTable:
    """Read-only min-count view of a device KmerTable."""

    table: KmerTable
    min_count: int

    @property
    def k(self) -> int:
        return self.table.k

    def get_canonical_many(self, kmers: np.ndarray) -> np.ndarray:
        """Counts for directional k-mers; entries below the global
        threshold report 0 (i.e. absent)."""
        counts = np.array(self.table.lookup_directional(kmers))
        counts[counts < self.min_count] = 0
        return counts

    def get_canonical(self, kmer: int) -> int | None:
        c = int(self.get_canonical_many(np.array([kmer], np.uint64))[0])
        return c if c > 0 else None

    def get_canonical_count(self, kmer: int) -> int:
        return int(self.get_canonical_many(np.array([kmer], np.uint64))[0])

    def revcomp(self, kmer: int) -> int:
        return revcomp_kmer(kmer, self.k)
