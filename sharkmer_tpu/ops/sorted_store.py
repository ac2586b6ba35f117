"""Sorted-run k-mer count store — the TPU-native count backend.

Hash tables are hostile to TPUs: every insert is a random HBM
gather/scatter, and probe loops pay the full batch width every round.
Measured on v5e, XLA sorts run at ~220M u64/s and scans at >600M/s
while scattered probe rounds crawl at ~1M/s. So the TPU count path is
built entirely from sorts and scans (the same reasoning that leads
GPU k-mer counters to sort-based designs):

* **aggregate**: sort the (kmer, count) batch, run-length-encode it
  with prefix-scan arithmetic (no segment_sum, no wide scatter):
  run_base = cummax(first_of_run ? exclusive_prefix : 0) and
  run_total = inclusive_prefix - run_base; keep the LAST element of
  each run, void the rest to the sentinel, and key-value sort once
  more to compact the survivors to the front.
* **partitioned master**: the master is a list of disjoint key-range
  partitions, each a sorted sentinel-padded device array no larger
  than MAX_AGG — the deployment-measured ceiling above which a single
  fused sort kernel cannot compile. Batch runs are routed into
  partitions with one device `searchsorted` against the partition
  boundary keys, merged partition-locally, and partitions split in
  half when they outgrow their budget. Total merge work stays
  O(N log N) via the LSM flush policy (pending runs fold in when they
  reach a fraction of the master size).
* **histogram**: clipped bincount per partition, summed.
* **lookup**: vectorized binary search per partition (a key lives in
  exactly one partition, so per-partition results sum).
* **primer scan**: forward prefix matches are contiguous ranges of
  each partition; RC-suffix matches use an elementwise sweep with
  searchsorted set-membership.

The store keeps identical observable semantics to ops.hashtable
(canonical u64 keys, exact u32 saturating counts), asserted by
differential tests, and exposes the same API so the engine and the
sPCR layer are backend-agnostic.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .encoding import KMER_SENTINEL, canonical_kmers
from .hashtable import _histogram_kernel, _revcomp_kernel

EMPTY = np.uint64(KMER_SENTINEL)

# Largest element count a single fused sort/aggregate kernel may see.
# The remote TPU compiler OOMs above ~2^24 on the deployment target
# (and compile time grows steeply before that); override with
# SHARKMER_MAX_AGG when the toolchain allows more.
MAX_AGG = int(os.environ.get("SHARKMER_MAX_AGG", 1 << 22))


def _next_pow2(n: int) -> int:
    return 1 << max(6, (int(n) - 1).bit_length())


def _aggregate_impl(kmers, counts):
    """Sort (kmers, counts); sum counts of equal keys; compact unique
    keys (still sorted) to the front with sentinel padding behind.

    Returns (unique_kmers, totals, n_unique) — same width as the input.
    """
    sk, sc = jax.lax.sort((kmers, counts), num_keys=1)
    sc = sc.astype(jnp.uint64)

    first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    last = jnp.concatenate([sk[:-1] != sk[1:], jnp.ones((1,), bool)])
    incl = jnp.cumsum(sc)  # inclusive prefix of counts (u64: no overflow)
    excl = incl - sc
    # prefix total just before each run's start, broadcast down the run
    # (excl is monotone non-decreasing, so a running max of the
    # run-start values propagates each run's base down its run).
    # lax.cummax, NOT associative_scan: the generic scan's unrolled
    # slice/concat tree makes XLA compile time explode past ~2^20
    # elements, while the cumulative-reduce primitives stay flat.
    run_base = jax.lax.cummax(jnp.where(first, excl, jnp.uint64(0)))
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


_aggregate_kernel = functools.partial(jax.jit, donate_argnums=(0, 1))(
    _aggregate_impl
)


@functools.partial(jax.jit, static_argnames=("width",))
def _pad_to_kernel(keys, counts, width: int):
    """Pad (keys, counts) to exactly `width` with sentinels/zeros."""
    pad = width - keys.shape[0]
    if pad <= 0:
        return keys[:width], counts[:width]
    return (
        jnp.concatenate([keys, jnp.full((pad,), jnp.uint64(EMPTY))]),
        jnp.concatenate([counts, jnp.zeros((pad,), jnp.uint32)]),
    )


@jax.jit
def _searchsorted_kernel(keys, bounds):
    return jnp.searchsorted(keys, bounds)


@jax.jit
def _merge_kernel(pk, pc, sk, sc):
    """Merge two equal-width sorted runs: ONE fixed shape on the hot
    path (2 * part_budget), however the store grows."""
    return _aggregate_impl(
        jnp.concatenate([pk, sk]), jnp.concatenate([pc, sc])
    )


@functools.partial(jax.jit, static_argnames=("out_width",))
def _slice_run_kernel(keys, counts, start, size, out_width: int):
    """Masked dynamic slice [start, start+size) padded to out_width.
    The inputs are pre-padded so the window can never clamp."""
    kpad = jnp.concatenate(
        [keys, jnp.full((out_width,), jnp.uint64(EMPTY))]
    )
    cpad = jnp.concatenate([counts, jnp.zeros((out_width,), jnp.uint32)])
    k = jax.lax.dynamic_slice(kpad, (start,), (out_width,))
    c = jax.lax.dynamic_slice(cpad, (start,), (out_width,))
    pos = jnp.arange(out_width)
    k = jnp.where(pos < size, k, jnp.uint64(EMPTY))
    c = jnp.where(pos < size, c, 0)
    return k, c


@jax.jit
def _lookup_sorted_kernel(kmers, counts, n, queries):
    """Binary-search lookups against one sorted partition."""
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
    """Primer scan over one partition (same semantics as the hashtable
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
class _Part:
    kmers: jax.Array  # sorted, sentinel-padded
    counts: jax.Array
    n: int  # occupancy
    first_key: int  # lower bound of the partition's key range


@dataclass
class SortedKmerStore:
    """Partitioned sorted count runs with a backend-standard API."""

    k: int
    parts: list = field(default_factory=list)  # ascending key ranges
    pending: list = field(default_factory=list)  # [(uk, uc, nu), ...]
    pending_total: int = 0
    merge_ratio: float = 0.5
    max_agg: int = MAX_AGG

    @staticmethod
    def create(k: int, capacity: int = 0, **_ignored) -> "SortedKmerStore":
        return SortedKmerStore(k=k)

    @property
    def capacity(self) -> int:
        return sum(p.kmers.shape[0] for p in self.parts)

    @property
    def part_budget(self) -> int:
        return self.max_agg // 2

    # -- ingest --------------------------------------------------------------

    def insert_kmers(self, kmers, counts=None) -> "SortedKmerStore":
        kmers = jnp.asarray(kmers, dtype=jnp.uint64).reshape(-1)
        if counts is not None:
            counts = jnp.asarray(counts, dtype=jnp.uint32).reshape(-1)
        # sub-batch so no aggregate exceeds the compile ceiling; widths
        # are power-of-two so at most log2(budget) shapes ever compile
        step = self.part_budget
        n_in = int(kmers.shape[0])
        for i in range(0, max(n_in, 1), step):
            ksub = kmers[i : i + step]
            if ksub.shape[0] == 0:
                break
            size = min(step, _next_pow2(int(ksub.shape[0])))
            if size != ksub.shape[0]:
                ksub = jnp.concatenate([
                    ksub, jnp.full((size - ksub.shape[0],), jnp.uint64(EMPTY)),
                ])
            if counts is None:
                csub = jnp.ones((size,), jnp.uint32)
            else:
                csub = counts[i : i + step]
                if csub.shape[0] != size:
                    csub = jnp.concatenate([
                        csub, jnp.zeros((size - csub.shape[0],), jnp.uint32),
                    ])
            uk, uc, nu = _aggregate_kernel(ksub, csub)
            # nu stays on device: syncing per sub-batch would serialize
            # every dispatch on a device round-trip. pending_total is an
            # upper bound (run width), which only affects flush cadence.
            self.pending.append((uk, uc, nu))
            self.pending_total += size
        if self.pending_total >= max(
            1 << 16, self.merge_ratio * max(self.n_unique_master(), 1)
        ):
            self.flush()
        return self

    def ingest_codes(self, codes) -> "SortedKmerStore":
        kmers, _ = canonical_kmers(jnp.asarray(codes), self.k)
        return self.insert_kmers(kmers.reshape(-1))

    def n_unique_master(self) -> int:
        return sum(p.n for p in self.parts)

    # -- flush / partition management ----------------------------------------

    def flush(self) -> "SortedKmerStore":
        """Fold all pending runs into the partitioned master (in place).

        Runs are first tree-merged pairwise up to the compile ceiling
        (width max_agg) so each master partition is touched by as few
        merge ops as possible — per-op dispatch latency, not element
        throughput, dominates on a remote device.
        """
        if not self.pending:
            return self
        pending, self.pending = self.pending, []
        self.pending_total = 0
        # consolidate equal-width runs pairwise while the merged sort
        # stays within the compile ceiling (widths are powers of two)
        by_width: dict[int, list] = {}
        for run in pending:
            by_width.setdefault(int(run[0].shape[0]), []).append(run)
        w = min(by_width)
        while 2 * w <= self.max_agg:
            runs = by_width.get(w, [])
            while len(runs) >= 2:
                (ak, ac, _), (bk, bc, _) = runs.pop(), runs.pop()
                by_width.setdefault(2 * w, []).append(
                    _merge_kernel(ak, ac, bk, bc)
                )
            if not runs:
                by_width.pop(w, None)
            w *= 2
        merged = [r for runs in by_width.values() for r in runs]
        # ONE device round-trip for every run's occupancy
        nus = [
            int(v)
            for v in np.asarray(jnp.stack([nu for _, _, nu in merged]))
        ]
        for (uk, uc, _), nu in zip(merged, nus):
            self._merge_run(uk, uc, nu)
        return self

    def _merge_run(self, uk, uc, nu: int) -> None:
        """Fold one sorted unique run (width <= part_budget) into the
        partitioned master.

        Shape discipline: every partition array is physically EXACTLY
        part_budget wide (sentinel-padded past its occupancy), so the
        whole lifetime of the store compiles a constant set of XLA
        programs: one 2*budget merge, one budget histogram/lookup, and
        at most log2(budget) run-width variants. Data-dependent widths
        here previously caused a fresh (remote) compile per merge.
        """
        W = self.part_budget
        if nu == 0:
            return
        if not self.parts:
            # seed the master from the run's first W-slice; the tail of
            # a wider (tree-merged) run folds in through the merge path.
            # part 0's lower bound is never consulted (it catches all
            # keys below the second partition).
            head = min(nu, W)
            sk, sc = _slice_run_kernel(uk, uc, 0, head, W)
            self.parts = [_Part(sk, sc, head, 0)]
            if nu <= W:
                return
            target = self.parts[0]
            pos = head
            while pos < nu:
                size = min(W, nu - pos)
                sk, sc = _slice_run_kernel(uk, uc, pos, size, W)
                target = self._merge_into_part(target, sk, sc)
                pos += size
            return

        # route the run across the partition key ranges with a single
        # device searchsorted against the boundary keys
        firsts = [p.first_key for p in self.parts[1:]]
        if firsts:
            bw = _next_pow2(len(firsts))
            bounds = np.full((bw,), EMPTY, dtype=np.uint64)
            bounds[: len(firsts)] = firsts
            splits = np.minimum(
                np.asarray(
                    _searchsorted_kernel(uk, jnp.asarray(bounds))
                )[: len(firsts)],
                nu,
            ).tolist()
        else:
            splits = []
        starts = [0, *splits]
        ends = [*splits, nu]
        # snapshot the targets: a merge may split its partition and
        # shift list indices, but the routing above is against the
        # pre-flush boundaries, so each segment's owner object is fixed
        targets = list(self.parts)
        for part, seg_start, seg_end in zip(targets, starts, ends):
            # wide (tree-merged) runs can put more than W keys in one
            # partition's range: merge W-slices in ascending order,
            # threading the tail-owning partition through any splits
            target, pos = part, seg_start
            while pos < seg_end:
                size = min(W, seg_end - pos)
                sk, sc = _slice_run_kernel(uk, uc, pos, size, W)
                target = self._merge_into_part(target, sk, sc)
                pos += size

    def _merge_into_part(self, part: _Part, sk, sc) -> "_Part":
        """Merge a W-wide sorted slice into `part`; split if overfull.
        Returns the partition now owning the TOP of part's key range
        (the right half after a split), so callers merging ascending
        slices can keep targeting the correct partition."""
        W = self.part_budget
        p_idx = next(i for i, p in enumerate(self.parts) if p is part)
        mk, mc, mn = _merge_kernel(part.kmers, part.counts, sk, sc)
        mn = int(mn)
        if mn <= W:
            new = _Part(
                jax.lax.slice(mk, (0,), (W,)),
                jax.lax.slice(mc, (0,), (W,)),
                mn,
                part.first_key,
            )
            self.parts[p_idx] = new
            return new
        # overfull: split at the width midpoint. Both merge inputs hold
        # <= W uniques, so mn <= 2W and each half fits the budget.
        lk = jax.lax.slice(mk, (0,), (W,))
        lc = jax.lax.slice(mc, (0,), (W,))
        rk = jax.lax.slice(mk, (W,), (2 * W,))
        rc_ = jax.lax.slice(mc, (W,), (2 * W,))
        right_first = int(np.asarray(rk[0:1])[0])
        right = _Part(rk, rc_, mn - W, right_first)
        self.parts[p_idx] = _Part(lk, lc, W, part.first_key)
        self.parts.insert(p_idx + 1, right)
        return right

    # -- queries --------------------------------------------------------------

    def _flushed(self) -> "SortedKmerStore":
        if self.pending:
            self.flush()
        return self

    def lookup(self, queries) -> jax.Array:
        s = self._flushed()
        q = jnp.asarray(queries, dtype=jnp.uint64)
        out = jnp.zeros(q.shape, jnp.uint32)
        for p in s.parts:
            out = out + _lookup_sorted_kernel(p.kmers, p.counts, p.n, q)
        return out

    def lookup_directional(self, queries) -> np.ndarray:
        s = self._flushed()
        q = np.asarray(queries, dtype=np.uint64).reshape(-1)
        nq = q.shape[0]
        if nq == 0:
            return np.zeros(0, np.uint32)
        padded = _next_pow2(nq)
        qp = np.full(padded, EMPTY, dtype=np.uint64)
        qp[:nq] = q
        qj = jnp.asarray(qp)
        out = np.zeros(padded, np.uint32)
        for p in s.parts:
            out = out + np.asarray(
                _lookup_directional_sorted_kernel(
                    p.kmers, p.counts, p.n, qj, s.k
                )
            )
        return out[:nq]

    def histogram(self, histo_max: int) -> np.ndarray:
        s = self._flushed()
        total = np.zeros(histo_max + 2, np.uint64)
        for p in s.parts:
            total = total + np.asarray(_histogram_kernel(p.counts, histo_max))
        return total

    def n_unique(self) -> int:
        return self._flushed().n_unique_master()

    def n_total(self) -> int:
        s = self._flushed()
        return sum(
            int(jnp.sum(p.counts.astype(jnp.uint64))) for p in s.parts
        )

    def max_count(self) -> int:
        s = self._flushed()
        if not s.parts:
            return 0
        return max(int(jnp.max(p.counts)) for p in s.parts)

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
        all_k, all_c = [np.zeros(0, np.uint64)], [np.zeros(0, np.uint32)]
        for p in s.parts:
            rc_table = _revcomp_kernel(p.kmers, s.k)
            kmers, counts, nm = _prefix_scan_sorted_kernel(
                p.kmers, p.counts, rc_table, jnp.asarray(fwd),
                jnp.asarray(rc), 2 * (s.k - oligo_len), 2 * oligo_len,
                max_out, jnp.uint32(min_count),
            )
            nm = int(nm)
            if nm > max_out:
                raise RuntimeError(
                    f"primer scan overflow: {nm} matches > max_out {max_out}"
                )
            # full-width transfer + host slice: device slices of
            # data-dependent width would compile per distinct nm
            all_k.append(np.asarray(kmers)[:nm])
            all_c.append(np.asarray(counts)[:nm])
        return np.concatenate(all_k), np.concatenate(all_c)

    # -- host export -----------------------------------------------------------

    def to_sorted_arrays(self) -> tuple[np.ndarray, np.ndarray]:
        """Host mirror: (sorted unique kmers, counts)."""
        s = self._flushed()
        if not s.parts:
            return np.zeros(0, np.uint64), np.zeros(0, np.uint32)
        keys = np.concatenate([np.asarray(p.kmers)[: p.n] for p in s.parts])
        counts = np.concatenate(
            [np.asarray(p.counts)[: p.n] for p in s.parts]
        )
        return keys, counts

    def to_dict(self) -> dict[int, int]:
        keys, counts = self.to_sorted_arrays()
        return dict(zip(keys.tolist(), counts.tolist()))
