"""Host-side count views for the sPCR engine.

``SmallCounts`` is the host equivalent of the reference's small
``KmerCounts`` result tables (primer-matching k-mers — tens of
entries). ``FilteredTable`` is the lazy min-count view over the device
table (``FilteredKmerCounts``, counting.rs:316-350): lookups apply the
global --min-kmer-count threshold on the fly, no data is copied.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

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
    # one gene pool shares this view: without the lock every worker
    # would race to build the same multi-second mirror / rc-order cache
    _lock: threading.Lock = field(
        default_factory=threading.Lock, repr=False, compare=False
    )

    @property
    def k(self) -> int:
        return self.table.k

    def _get_mirror(self):
        """Build (sorted kmers, counts) restricted to rows >= the
        view's min_count: sub-threshold rows are invisible through a
        FilteredTable anyway, and dropping them on device shrinks the
        export payload before it crosses the slow link."""
        if self._mirror is not None:  # hot path: one read per BFS wave
            return self._mirror
        with self._lock:
            if self._mirror is None:
                pairs = self.table.to_dict() if not hasattr(
                    self.table, "to_sorted_arrays"
                ) else None
                if pairs is not None:  # generic fallback
                    kmers = np.fromiter(pairs.keys(), dtype=np.uint64, count=len(pairs))
                    counts = np.fromiter(pairs.values(), dtype=np.uint32, count=len(pairs))
                    keep = counts >= np.uint32(max(self.min_count, 1))
                    kmers, counts = kmers[keep], counts[keep]
                    order = np.argsort(kmers)
                    self._mirror = (kmers[order], counts[order])
                else:
                    self._mirror = self.table.to_sorted_arrays(
                        min_count=self.min_count
                    )
        return self._mirror

    def warm_caches(self) -> None:
        """Build the mirror and the rc-range index once, up front —
        called before the gene thread pool starts so workers never
        duplicate the build."""
        if self._mirror_available():
            self._get_mirror()
            self._get_rc_order()

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

    # -- primer scans ---------------------------------------------------------

    def _get_rc_order(self):
        """Mirror rows ordered by revcomp(kmer): turns reverse-strand
        prefix matches into contiguous range queries too.

        The argsort of a ~20M-row mirror is the single biggest host cost
        of the sPCR phase (~4.7 s single-threaded numpy), so use torch's
        multithreaded sort when available. A k-mer is < 2^62, so the
        int64 view preserves order (sign bit never set)."""
        mk, _ = self._get_mirror()  # outside the lock (takes it itself)
        with self._lock:
            if getattr(self, "_rc_cache", None) is None:
                from ..ops.encoding import revcomp_kmers_np

                rc = revcomp_kmers_np(mk, self.k)
                try:
                    import torch

                    vals, idx = torch.sort(
                        torch.from_numpy(rc.view(np.int64))
                    )
                    self._rc_cache = (
                        vals.numpy().view(np.uint64),
                        idx.numpy(),
                    )
                except ImportError:  # pragma: no cover
                    order = np.argsort(rc)
                    self._rc_cache = (rc[order], order)
        return self._rc_cache

    def find_primer_matches(self, oligos: np.ndarray, oligo_len: int,
                            min_count: int):
        """All table k-mers starting with an oligo on either strand
        (find_oligos_in_kmers semantics: forward precedence, RC hits
        revcomp-normalized). Served from the host mirror as sorted
        range queries when available; device sweep otherwise. A scan
        below the view's own threshold (possible with per-primer
        min_count overrides) can't be answered by the filtered mirror,
        so it goes to the device table too."""
        if not self._mirror_available() or min_count < self.min_count:
            return self.table.prefix_scan(oligos, oligo_len, min_count)

        from ..ops.encoding import revcomp_kmers_np

        mk, mc = self._get_mirror()
        if len(mk) == 0:
            return np.zeros(0, np.uint64), np.zeros(0, np.uint32)
        oligos = np.asarray(oligos, dtype=np.uint64)
        shift = np.uint64(2 * (self.k - oligo_len))

        # forward: kmers in [oligo << shift, (oligo+1) << shift)
        lo = oligos << shift
        hi = (oligos + np.uint64(1)) << shift
        starts = np.searchsorted(mk, lo)
        ends = np.searchsorted(mk, hi)
        fwd_rows = np.concatenate(
            [np.arange(s, e) for s, e in zip(starts, ends)]
        ) if len(oligos) else np.zeros(0, np.int64)
        fwd_rows = np.unique(fwd_rows)

        # reverse strand: revcomp(kmer) starts with the oligo
        rc_sorted, rc_order = self._get_rc_order()
        starts = np.searchsorted(rc_sorted, lo)
        ends = np.searchsorted(rc_sorted, hi)
        rc_pos = np.concatenate(
            [np.arange(s, e) for s, e in zip(starts, ends)]
        ) if len(oligos) else np.zeros(0, np.int64)
        rc_rows = np.unique(rc_order[rc_pos.astype(np.int64)])
        # forward precedence: a dual-orientation hit reports forward form
        rc_rows = np.setdiff1d(rc_rows, fwd_rows, assume_unique=True)

        rows = np.concatenate([fwd_rows, rc_rows]).astype(np.int64)
        out_kmers = np.concatenate([
            mk[fwd_rows],
            revcomp_kmers_np(mk[rc_rows], self.k) if len(rc_rows) else
            np.zeros(0, np.uint64),
        ])
        out_counts = mc[rows]
        keep = out_counts >= min_count
        return out_kmers[keep], out_counts[keep]

    def get_canonical(self, kmer: int) -> int | None:
        c = int(self.get_canonical_many(np.array([kmer], np.uint64))[0])
        return c if c > 0 else None

    def get_canonical_count(self, kmer: int) -> int:
        return int(self.get_canonical_many(np.array([kmer], np.uint64))[0])

    def revcomp(self, kmer: int) -> int:
        return revcomp_kmer(kmer, self.k)
