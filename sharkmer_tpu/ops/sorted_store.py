"""Sorted-run k-mer count store — the TPU-native count backend.

Hash tables are hostile to TPUs: every insert is a random HBM
gather/scatter, and probe loops pay the full batch width every round.
Measured on v5e, XLA sorts run at ~220M u64/s and scans at >600M/s
while scattered probe rounds crawl at ~1M/s. So the TPU count path is
built entirely from sorts and scans (the same reasoning that leads
GPU k-mer counters to sort-based designs):

* **aggregate**: sort the encoded batch, run-length-encode it with
  prefix-scan arithmetic (no segment_sum, no scatter):
  run_base = cummax(first_of_run ? exclusive_prefix : -inf) and
  run_total = inclusive_prefix - run_base; keep the LAST element of
  each run, void the rest to the sentinel, and key-value sort once
  more to compact the survivors to the front.
* **merge**: runs merge by concatenate -> the same aggregate pass
  (equal keys from different runs sum their counts). Runs are managed
  LSM-style: small batch runs accumulate and fold into the master run
  when they reach a fraction of its size, so total merge work stays
  O(N log N) amortized.
* **histogram**: clipped bincount over the master counts (a scatter
  into 10k bins — measured fast, unlike wide scatters).
* **lookup**: vectorized binary search (searchsorted) against the
  master run — log2(U) gathers per query batch.
* **primer scan**: forward prefix matches are *contiguous ranges* of
  the sorted store (two searchsorted calls per oligo); RC-suffix
  matches use one elementwise sweep with searchsorted set-membership.

The store keeps identical observable semantics to ops.hashtable
(canonical u64 keys, u32 counts saturating at the freeze threshold),
asserted by differential tests, and exposes the same API so the
engine and the sPCR layer are backend-agnostic.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .encoding import KMER_SENTINEL, canonical_kmers
from .hashtable import _histogram_kernel, _revcomp_kernel

EMPTY = np.uint64(KMER_SENTINEL)


def _next_pow2(n: int) -> int:
    return 1 << max(6, (int(n) - 1).bit_length())


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _aggregate_kernel(kmers, counts):
    """Sort (kmers, counts); sum counts of equal keys; compact unique
    keys (still sorted) to the front with sentinel padding behind.

    Returns (unique_kmers, totals, n_unique). Counts saturate at the
    freeze threshold (see hashtable.SAT_THRESHOLD).
    """
    n = kmers.shape[0]
    sk, sc = jax.lax.sort((kmers, counts), num_keys=1)
    sc = sc.astype(jnp.uint64)

    first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    last = jnp.concatenate([sk[:-1] != sk[1:], jnp.ones((1,), bool)])
    incl = jnp.cumsum(sc)  # inclusive prefix of counts (u64: no overflow)
    excl = incl - sc
    # prefix total just before each run's start, broadcast down the run
    # (excl is monotone non-decreasing, so a running max of the
    # run-start values propagates each run's base down its run)
    run_base = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first, excl, jnp.uint64(0))
    )
    # exact u32 saturation (the u64 sum is exact, so this matches the
    # reference's saturating_add for ALL counts)
    run_total = jnp.minimum(incl - run_base, jnp.uint64(0xFFFF_FFFF))

    keep = last & (sk != jnp.uint64(EMPTY))
    out_k = jnp.where(keep, sk, jnp.uint64(EMPTY))
    out_c = jnp.where(keep, run_total, 0).astype(jnp.uint32)
    # compact: sentinels sort to the end; unique keys stay ascending
    out_k, out_c = jax.lax.sort((out_k, out_c), num_keys=1)
    n_unique = jnp.sum(keep, dtype=jnp.int64)
    return out_k, out_c, n_unique


@jax.jit
def _lookup_sorted_kernel(kmers, counts, n, queries):
    """Binary-search lookups against the sorted master run."""
    idx = jnp.searchsorted(kmers, queries)
    idx = jnp.minimum(idx, kmers.shape[0] - 1)
    hit = (kmers[idx] == queries) & (idx < n) & (queries != jnp.uint64(EMPTY))
    return jnp.where(hit, counts[idx], 0).astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("k",))
def _lookup_directional_sorted_kernel(kmers, counts, n, queries, k: int):
    rc = _revcomp_kernel(queries, k)
    canon = jnp.minimum(queries, rc)
    return _lookup_sorted_kernel(kmers, counts, n, canon)


@functools.partial(jax.jit, static_argnames=("shift", "rc_mask_bits", "max_out"))
def _prefix_scan_sorted_kernel(
    kmers, counts, rc_table, oligos_sorted, rc_oligos_sorted,
    shift: int, rc_mask_bits: int, max_out: int, min_count,
):
    """Primer scan over the store (same semantics as the hashtable
    version: forward prefix match first, else RC low-bits match
    reported revcomp-normalized)."""
    occupied = (kmers != jnp.uint64(EMPTY)) & (counts >= min_count)

    def member(sorted_set, values):
        if sorted_set.shape[0] == 0:
            return jnp.zeros(values.shape, bool)
        idx = jnp.searchsorted(sorted_set, values)
        idx = jnp.minimum(idx, sorted_set.shape[0] - 1)
        return sorted_set[idx] == values

    prefix = kmers >> jnp.uint64(shift)
    fwd_hit = occupied & member(oligos_sorted, prefix)
    low = kmers & jnp.uint64((1 << rc_mask_bits) - 1)
    rc_hit = occupied & ~fwd_hit & member(rc_oligos_sorted, low)
    hit = fwd_hit | rc_hit
    out_kmer = jnp.where(rc_hit, rc_table, kmers)
    idx = jnp.nonzero(hit, size=max_out, fill_value=kmers.shape[0] - 1)[0]
    return out_kmer[idx], counts[idx], jnp.sum(hit)


@dataclass
class SortedKmerStore:
    """LSM-managed sorted count runs with a KmerTable-compatible API."""

    k: int
    # master run: sorted unique kmers, sentinel-padded to a pow2 capacity
    kmers: jax.Array
    counts: jax.Array
    n: int  # occupancy of the master run (host-tracked)
    pending: list = field(default_factory=list)  # [(kmers, counts, n), ...]
    pending_total: int = 0
    merge_ratio: float = 0.5  # fold pending into master at this fraction

    @staticmethod
    def create(k: int, capacity: int = 1 << 16, **_ignored) -> "SortedKmerStore":
        capacity = _next_pow2(capacity)
        return SortedKmerStore(
            k=k,
            kmers=jnp.full((capacity,), jnp.uint64(EMPTY)),
            counts=jnp.zeros((capacity,), jnp.uint32),
            n=0,
        )

    @property
    def capacity(self) -> int:
        return self.kmers.shape[0]

    # -- ingest --------------------------------------------------------------

    def insert_kmers(self, kmers, counts=None) -> "SortedKmerStore":
        kmers = jnp.asarray(kmers, dtype=jnp.uint64).reshape(-1)
        size = _next_pow2(kmers.shape[0])
        if size != kmers.shape[0]:
            kmers = jnp.concatenate([
                kmers,
                jnp.full((size - kmers.shape[0],), jnp.uint64(EMPTY)),
            ])
        if counts is None:
            counts = jnp.ones((size,), jnp.uint32)
        else:
            c = jnp.asarray(counts, dtype=jnp.uint32).reshape(-1)
            if c.shape[0] != size:
                c = jnp.concatenate(
                    [c, jnp.zeros((size - c.shape[0],), jnp.uint32)]
                )
            counts = c
        uk, uc, nu = _aggregate_kernel(kmers, counts)
        self.pending.append((uk, uc, int(nu)))
        self.pending_total += int(nu)
        if self.pending_total >= max(1 << 16, self.merge_ratio * max(self.n, 1)):
            self.flush()
        return self

    def ingest_codes(self, codes) -> "SortedKmerStore":
        kmers, _ = canonical_kmers(jnp.asarray(codes), self.k)
        return self.insert_kmers(kmers.reshape(-1))

    def flush(self) -> "SortedKmerStore":
        """Fold all pending runs into the master run (in place)."""
        if not self.pending:
            return self
        # slice to power-of-two occupancy buckets so repeated flushes
        # reuse compiled shapes (exact-n slices would recompile per call)
        parts_k = []
        parts_c = []
        if self.n:
            w = min(self.capacity, _next_pow2(self.n))
            parts_k.append(jax.lax.slice(self.kmers, (0,), (w,)))
            parts_c.append(jax.lax.slice(self.counts, (0,), (w,)))
        for uk, uc, nu in self.pending:
            w = min(uk.shape[0], _next_pow2(max(nu, 1)))
            parts_k.append(jax.lax.slice(uk, (0,), (w,)))
            parts_c.append(jax.lax.slice(uc, (0,), (w,)))
        total = sum(int(p.shape[0]) for p in parts_k)
        size = _next_pow2(total)
        parts_k.append(jnp.full((size - total,), jnp.uint64(EMPTY)))
        parts_c.append(jnp.zeros((size - total,), jnp.uint32))
        all_k = jnp.concatenate(parts_k)
        all_c = jnp.concatenate(parts_c)
        mk, mc, nu = _aggregate_kernel(all_k, all_c)
        self.kmers, self.counts, self.n = mk, mc, int(nu)
        self.pending = []
        self.pending_total = 0
        return self

    # -- queries --------------------------------------------------------------

    def _flushed(self) -> "SortedKmerStore":
        if self.pending:
            self.flush()
        return self

    def lookup(self, queries) -> jax.Array:
        s = self._flushed()
        q = jnp.asarray(queries, dtype=jnp.uint64)
        return _lookup_sorted_kernel(s.kmers, s.counts, s.n, q)

    def lookup_directional(self, queries) -> np.ndarray:
        s = self._flushed()
        q = np.asarray(queries, dtype=np.uint64).reshape(-1)
        nq = q.shape[0]
        if nq == 0:
            return np.zeros(0, np.uint32)
        padded = _next_pow2(nq)
        qp = np.full(padded, EMPTY, dtype=np.uint64)
        qp[:nq] = q
        out = _lookup_directional_sorted_kernel(
            s.kmers, s.counts, s.n, jnp.asarray(qp), s.k
        )
        return np.asarray(out)[:nq]

    def histogram(self, histo_max: int) -> np.ndarray:
        s = self._flushed()
        return np.asarray(_histogram_kernel(s.counts, histo_max))

    def n_unique(self) -> int:
        return self._flushed().n

    def n_total(self) -> int:
        s = self._flushed()
        return int(jnp.sum(s.counts.astype(jnp.uint64)))

    def max_count(self) -> int:
        s = self._flushed()
        if s.n == 0:
            return 0
        return int(jnp.max(s.counts))

    def prefix_scan(self, oligos, oligo_len: int, min_count: int,
                    max_out: int = 1 << 16):
        from .encoding import revcomp_kmer as _rc

        if oligo_len <= 0 or oligo_len >= self.k:
            raise ValueError(
                f"oligo length {oligo_len} out of range for k={self.k}"
            )
        s = self._flushed()
        oligos = np.asarray(oligos, dtype=np.uint64)
        rc = np.array(
            sorted({_rc(int(o), oligo_len) for o in oligos}), dtype=np.uint64
        )
        fwd = np.sort(oligos)
        rc_table = _revcomp_kernel(s.kmers, s.k)
        kmers, counts, nm = _prefix_scan_sorted_kernel(
            s.kmers, s.counts, rc_table, jnp.asarray(fwd), jnp.asarray(rc),
            2 * (s.k - oligo_len), 2 * oligo_len, max_out,
            jnp.uint32(min_count),
        )
        nm = int(nm)
        if nm > max_out:
            raise RuntimeError(
                f"primer scan overflow: {nm} matches > max_out {max_out}"
            )
        return np.asarray(kmers[:nm]), np.asarray(counts[:nm])

    # -- host export -----------------------------------------------------------

    def to_sorted_arrays(self) -> tuple[np.ndarray, np.ndarray]:
        """Host mirror: (sorted unique kmers, counts)."""
        s = self._flushed()
        return np.asarray(s.kmers[: s.n]), np.asarray(s.counts[: s.n])

    def to_dict(self) -> dict[int, int]:
        keys, counts = self.to_sorted_arrays()
        return dict(zip(keys.tolist(), counts.tolist()))
