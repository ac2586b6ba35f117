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


# Above this many unique k-mers the host mirror is skipped (memory)
# and lookups stay on the device.
MIRROR_MAX_UNIQUE = 256_000_000


@dataclass
class FilteredTable:
    """Read-only min-count view of a device count backend.

    sPCR graph extension issues one small lookup batch per BFS wave;
    on a remote accelerator each device call costs milliseconds of
    dispatch latency. Since every backend can export its contents as
    sorted (kmers, counts) arrays, the view keeps a host numpy mirror
    and serves wave lookups with np.searchsorted — microseconds per
    wave — falling back to device lookups only when the store is too
    large to mirror.
    """

    table: KmerTable
    min_count: int
    use_mirror: bool = True
    _mirror: tuple[np.ndarray, np.ndarray] | None = None

    @property
    def k(self) -> int:
        return self.table.k

    def _get_mirror(self):
        if self._mirror is None:
            pairs = self.table.to_dict() if not hasattr(
                self.table, "to_sorted_arrays"
            ) else None
            if pairs is not None:  # generic fallback
                kmers = np.fromiter(pairs.keys(), dtype=np.uint64, count=len(pairs))
                counts = np.fromiter(pairs.values(), dtype=np.uint32, count=len(pairs))
                order = np.argsort(kmers)
                self._mirror = (kmers[order], counts[order])
            else:
                self._mirror = self.table.to_sorted_arrays()
        return self._mirror

    def _mirror_available(self) -> bool:
        if not self.use_mirror:
            return False
        if self._mirror is not None:
            return True
        try:
            return self.table.n_unique() <= MIRROR_MAX_UNIQUE
        except Exception:
            return False

    def get_canonical_many(self, kmers: np.ndarray) -> np.ndarray:
        """Counts for directional k-mers; entries below the global
        threshold report 0 (i.e. absent)."""
        if self._mirror_available():
            from ..ops.encoding import revcomp_kmers_np

            q = np.asarray(kmers, dtype=np.uint64).reshape(-1)
            canon = np.minimum(q, revcomp_kmers_np(q, self.k))
            mk, mc = self._get_mirror()
            idx = np.searchsorted(mk, canon)
            idx = np.minimum(idx, max(len(mk) - 1, 0))
            if len(mk):
                hit = mk[idx] == canon
                counts = np.where(hit, mc[idx], 0).astype(np.uint32)
            else:
                counts = np.zeros(len(canon), np.uint32)
        else:
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
