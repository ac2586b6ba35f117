"""Mesh-sharded sorted-run count store.

The multi-chip variant of ops.sorted_store: the k-mer keyspace is
partitioned by the high bits of the SplitMix64 hash; each shard keeps
its own sorted master run of owned k-mers. Everything runs inside
shard_map:

* **insert**: all_gather the batch, mask to owned k-mers, shard-local
  sort/RLE aggregate, slice the (front-compacted) result to a bounded
  pending-run width (4x the fair share — the hash keeps shards
  balanced; an overflow check guards the tail risk).
* **flush**: concatenate master + pending runs per shard, aggregate,
  slice back to capacity (occupancy-checked, grow by doubling).
* **histogram**: local clipped bincount, all_gather + local sum (u64
  all-reduce does not lower on TPU; see _sum_shards_u64).
* **lookup**: no owner masking needed — a k-mer exists only on its
  owning shard, every other shard contributes 0, and psum combines.
* **sPCR data plane**: shard-local reach closures and fused primer
  range scans (parallel/sharded_reach.py) — the same reach-prefetch
  deployment default as the single-chip store, not a mirror fallback.

Bit-identical to the single-device store by construction (same
aggregation arithmetic, ownership only partitions the keyspace).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import hashtable as ht
from ..ops.encoding import KMER_SENTINEL, canonical_kmers
from ..ops.sorted_store import (
    _aggregate_kernel,
    _lookup_sorted_kernel,
)
from .sharded_table import AXIS, _owner, make_mesh  # noqa: F401

EMPTY = np.uint64(KMER_SENTINEL)


def _next_pow2(n: int) -> int:
    return 1 << max(6, (int(n) - 1).bit_length())


@functools.lru_cache(maxsize=64)
def _make_batch_agg(mesh: Mesh, n_shards: int, out_width: int):
    @jax.jit
    def agg(kmers, counts):
        def body(kmers, counts):
            me = jax.lax.axis_index(AXIS)
            full_k = jax.lax.all_gather(kmers[0], AXIS).reshape(-1)
            full_c = jax.lax.all_gather(counts[0], AXIS).reshape(-1)
            owner = _owner(full_k, n_shards)
            mine = jnp.where(
                owner == me.astype(jnp.uint64), full_k, jnp.uint64(EMPTY)
            )
            uk, uc, nu = _aggregate_kernel(mine, full_c)
            # owned uniques are front-compacted; bound to out_width
            return (
                jax.lax.slice(uk, (0,), (out_width,))[None],
                jax.lax.slice(uc, (0,), (out_width,))[None],
                jax.lax.all_gather(nu[None], AXIS),
            )

        return shard_map(
            body, mesh=mesh,
            in_specs=(P(AXIS, None), P(AXIS, None)),
            out_specs=(P(AXIS, None), P(AXIS, None), P()),
            check_vma=False,
        )(kmers, counts)

    return agg


@functools.lru_cache(maxsize=64)
def _make_merge(mesh: Mesh, widths: tuple, cap: int):
    n_args = 2 * len(widths)

    @jax.jit
    def merge(kmers, counts, *runs):
        def body(kmers, counts, *runs):
            parts_k = [kmers[0]]
            parts_c = [counts[0]]
            for i in range(0, len(runs), 2):
                parts_k.append(runs[i][0])
                parts_c.append(runs[i + 1][0])
            all_k = jnp.concatenate(parts_k)
            all_c = jnp.concatenate(parts_c)
            mk, mc, nu = _aggregate_kernel(all_k, all_c)
            mk = jax.lax.slice(mk, (0,), (cap,))
            mc = jax.lax.slice(mc, (0,), (cap,))
            return mk[None], mc[None], jax.lax.all_gather(nu[None], AXIS)

        spec = tuple([P(AXIS, None)] * (2 + n_args))
        return shard_map(
            body, mesh=mesh, in_specs=spec,
            out_specs=(P(AXIS, None), P(AXIS, None), P()),
            check_vma=False,
        )(kmers, counts, *runs)

    return merge


@functools.lru_cache(maxsize=64)
def _make_lookup(mesh: Mesh, k: int):
    @jax.jit
    def lookup(kmers, counts, queries):
        def body(kmers, counts, queries):
            rc = ht._revcomp_kernel(queries, k)
            canon = jnp.minimum(queries, rc)
            local = _lookup_sorted_kernel(
                kmers[0], counts[0], kmers.shape[1], canon
            )
            return jax.lax.psum(local, AXIS)

        return shard_map(
            body, mesh=mesh,
            in_specs=(P(AXIS, None), P(AXIS, None), P()),
            out_specs=P(), check_vma=False,
        )(kmers, counts, queries)

    return lookup


@functools.lru_cache(maxsize=64)
def _make_histogram(mesh: Mesh, histo_max: int):
    @jax.jit
    def histogram(counts):
        def body(counts):
            local = ht._histogram_kernel(counts[0], histo_max)
            return _sum_shards_u64(local)

        return shard_map(
            body, mesh=mesh, in_specs=(P(AXIS, None),), out_specs=P(),
            check_vma=False,
        )(counts)

    return histogram


def _sum_shards_u64(local):
    """Cross-shard sum of a u64 vector. all_gather + local add, NOT
    psum: the TPU all-reduce lowering rejects u64 operands ("Supported
    lowering only of Sum all reduce"), while all_gather is pure data
    movement and the add then happens shard-locally. Histograms are
    tiny (histo_max+2 elements) so the extra bytes are negligible."""
    return jnp.sum(
        jax.lax.all_gather(local, AXIS), axis=0, dtype=jnp.uint64
    )


@dataclass
class ShardedSortedStore:
    k: int
    mesh: Mesh
    kmers: jax.Array  # [S, cap] sorted-per-shard, sentinel padded
    counts: jax.Array  # [S, cap]
    pending: list = field(default_factory=list)  # [(uk [S,B], uc [S,B]), ...]
    pending_width: int = 0

    @staticmethod
    def create(k: int, mesh: Mesh, local_capacity: int = 1 << 14,
               **_ignored) -> "ShardedSortedStore":
        local_capacity = _next_pow2(local_capacity)
        n = mesh.devices.size
        sharding = NamedSharding(mesh, P(AXIS, None))
        return ShardedSortedStore(
            k=k,
            mesh=mesh,
            kmers=jax.device_put(
                jnp.full((n, local_capacity), jnp.uint64(EMPTY)), sharding
            ),
            counts=jax.device_put(
                jnp.zeros((n, local_capacity), jnp.uint32), sharding
            ),
        )

    @property
    def n_shards(self) -> int:
        return self.kmers.shape[0]

    @property
    def local_capacity(self) -> int:
        return self.kmers.shape[1]

    # -- insert ---------------------------------------------------------------

    def insert_kmers(self, kmers, counts=None) -> "ShardedSortedStore":
        kmers = np.asarray(kmers, dtype=np.uint64).reshape(-1)
        if counts is None:
            counts_np = np.ones(len(kmers), np.uint32)
        else:
            counts_np = np.asarray(counts, dtype=np.uint32).reshape(-1)
        S = self.n_shards
        per = max(64, -(-len(kmers) // S))
        pk = np.full(S * per, EMPTY, dtype=np.uint64)
        pk[: len(kmers)] = kmers
        pc = np.zeros(S * per, np.uint32)
        pc[: len(counts_np)] = counts_np
        sharding = NamedSharding(self.mesh, P(AXIS, None))
        dk = jax.device_put(pk.reshape(S, per), sharding)
        dc = jax.device_put(pc.reshape(S, per), sharding)

        out_width = min(S * per, _next_pow2(4 * per))
        uk, uc, nus = _make_batch_agg(self.mesh, S, out_width)(dk, dc)
        if int(np.max(np.asarray(nus))) > out_width:
            raise RuntimeError(
                "shard ownership skew overflowed the pending-run width; "
                "increase the batch width margin"
            )
        self.pending.append((uk, uc))
        self.pending_width += out_width
        if self.pending_width >= max(1 << 14, self.local_capacity // 2):
            self.flush()
        return self

    def ingest_codes(self, codes) -> "ShardedSortedStore":
        kmers, _ = canonical_kmers(jnp.asarray(codes), self.k)
        return self.insert_kmers(np.asarray(kmers).reshape(-1))

    def merge_from(self, other: "ShardedSortedStore") -> "ShardedSortedStore":
        """Fold another store (same mesh, same k) into this one. Both
        stores partition the keyspace by the same owner hash, so the
        other's shard-local master run IS a valid pending run for this
        store's shard-local merge — no collective, no host round-trip."""
        if other.k != self.k or other.mesh is not self.mesh:
            raise ValueError("merge_from requires same k and mesh")
        other._flushed()
        self.pending.append((other.kmers, other.counts))
        self.pending_width += other.local_capacity
        return self.flush()

    # -- flush / grow -----------------------------------------------------------

    def flush(self) -> "ShardedSortedStore":
        if not self.pending:
            return self
        while True:
            flat_runs = []
            widths = []
            for uk, uc in self.pending:
                flat_runs.extend([uk, uc])
                widths.append(uk.shape[1])
            cap = self.local_capacity
            mk, mc, nus = _make_merge(self.mesh, tuple(widths), cap)(
                self.kmers, self.counts, *flat_runs
            )
            max_n = int(np.max(np.asarray(nus)))
            if max_n < cap:
                self.kmers, self.counts = mk, mc
                self.pending = []
                self.pending_width = 0
                return self
            # a shard overflowed its capacity: grow the masters and retry
            self._grow()

    def _grow(self) -> None:
        cap = self.local_capacity * 2
        sharding = NamedSharding(self.mesh, P(AXIS, None))
        pad_k = jax.device_put(
            jnp.full((self.n_shards, cap - self.local_capacity),
                     jnp.uint64(EMPTY)),
            sharding,
        )
        pad_c = jax.device_put(
            jnp.zeros((self.n_shards, cap - self.local_capacity), jnp.uint32),
            sharding,
        )
        self.kmers = jnp.concatenate([self.kmers, pad_k], axis=1)
        self.counts = jnp.concatenate([self.counts, pad_c], axis=1)

    # -- queries -----------------------------------------------------------------

    def _flushed(self) -> "ShardedSortedStore":
        if self.pending:
            self.flush()
        return self

    def lookup_directional(self, queries) -> np.ndarray:
        s = self._flushed()
        q = np.asarray(queries, dtype=np.uint64).reshape(-1)
        nq = q.shape[0]
        if nq == 0:
            return np.zeros(0, np.uint32)
        padded = _next_pow2(nq)
        qp = np.full(padded, EMPTY, dtype=np.uint64)
        qp[:nq] = q
        out = _make_lookup(self.mesh, self.k)(s.kmers, s.counts, jnp.asarray(qp))
        return np.asarray(out)[:nq]

    def histogram(self, histo_max: int) -> np.ndarray:
        s = self._flushed()
        return np.asarray(_make_histogram(self.mesh, histo_max)(s.counts))

    def n_unique(self) -> int:
        s = self._flushed()
        return int(jnp.sum(s.kmers != jnp.uint64(EMPTY)))

    def n_total(self) -> int:
        s = self._flushed()
        return int(jnp.sum(s.counts.astype(jnp.uint64)))

    def max_count(self) -> int:
        s = self._flushed()
        return int(jnp.max(s.counts))

    # -- sPCR device support (mesh-sharded reach + fused range scans) ---------

    def _spcr_index(self):
        """Cached per-shard sidecars (parallel/sharded_reach.py),
        rebuilt whenever the master arrays are replaced."""
        from .sharded_reach import ShardedSpcrIndex

        s = self._flushed()
        cached = getattr(self, "_spcr_cache", None)
        if cached is not None and cached[0] is s.kmers:
            return cached[1]
        index = ShardedSpcrIndex(s)
        self._spcr_cache = (s.kmers, index)
        return index

    def prepare_spcr(self) -> None:
        """Build the sPCR shard sidecars up front (one-time cost,
        otherwise paid lazily by the first scan/reach call)."""
        self._spcr_index()

    def reach(self, roots, min_count: int, depth: int | None = None,
              pre=None):
        """Depth-capped de Bruijn closure over the sharded table: the
        closure loop runs replicated across shards with shard-local
        probes (parallel/sharded_reach.py). Returns a ReachResult or
        None on overflow."""
        from ..ops import reach as reach_mod
        from .sharded_reach import sharded_reach

        s = self._flushed()
        return sharded_reach(
            s, s._spcr_index(), roots, min_count,
            depth or reach_mod.DEPTH, pre=pre,
        )

    def prefix_scan(self, oligos, oligo_len: int, min_count: int,
                    max_out: int = 1 << 12):
        """Primer-oligo scan via shard-local fused range queries
        (sharded_range_scan); same observable semantics as the
        single-chip scan (forward precedence, RC normalization)."""
        from .sharded_reach import sharded_range_scan

        s = self._flushed()
        kmers, counts = sharded_range_scan(
            s, s._spcr_index(), np.asarray(oligos, dtype=np.uint64),
            oligo_len, max_out=max_out,
        )
        keep = counts >= np.uint32(max(min_count, 1))
        return kmers[keep], counts[keep]

    def prefix_scan_many(self, requests, max_out: int = 1 << 12):
        """Batched primer scans (see SortedKmerStore.prefix_scan_many):
        each request dispatches its shard_map scan before the first
        host sync; per-request semantics identical to prefix_scan."""
        from .sharded_reach import sharded_range_scan

        s = self._flushed()
        index = s._spcr_index()
        # v1: sequential per-request calls (one sync each). The
        # latency win that motivates the batch API is a single-chip
        # tunnel concern; on a pod slice the controller sits next to
        # the mesh and per-call syncs are cheap.
        return [
            sharded_range_scan(
                s, index, np.asarray(oligos, dtype=np.uint64), olen,
                max_out=max_out,
            )
            for oligos, olen in requests
        ]

    def to_sorted_arrays(
        self, min_count: int = 1
    ) -> tuple[np.ndarray, np.ndarray]:
        s = self._flushed()
        keys = np.asarray(s.kmers).reshape(-1)
        counts = np.asarray(s.counts).reshape(-1)
        occ = keys != EMPTY
        if min_count > 1:
            occ &= counts >= np.uint32(min_count)
        keys, counts = keys[occ], counts[occ]
        order = np.argsort(keys)
        return keys[order], counts[order]

    def to_dict(self) -> dict[int, int]:
        keys, counts = self.to_sorted_arrays()
        return dict(zip(keys.tolist(), counts.tolist()))


def make_sorted_ingest_step(mesh: Mesh, k: int, histo_max: int, cap: int):
    """Fused multi-chip ingest step on the sorted backend: data-parallel
    encode -> owner-route -> shard-local sort/RLE merge into the master
    run -> psum'd spectrum. One jitted program covering both
    parallelism axes (reads and keyspace).

    step(kmers, counts, codes) -> (kmers, counts, histo) where
      kmers/counts: [S, cap] sharded on axis 0,
      codes: uint8 [S, reads_per_shard, width] sharded on axis 0.
    """
    n_shards = mesh.devices.size

    def body(master_k, master_c, codes):
        me = jax.lax.axis_index(AXIS)
        kmers, _ = canonical_kmers(codes[0], k)  # dp: local read slice
        local = kmers.reshape(-1)
        full = jax.lax.all_gather(local, AXIS).reshape(-1)
        owner = _owner(full, n_shards)
        mine = jnp.where(
            owner == me.astype(jnp.uint64), full, jnp.uint64(EMPTY)
        )
        all_k = jnp.concatenate([master_k[0], mine])
        all_c = jnp.concatenate(
            [master_c[0], jnp.ones(mine.shape, jnp.uint32)]
        )
        mk, mc, _ = _aggregate_kernel(all_k, all_c)
        mk = jax.lax.slice(mk, (0,), (cap,))
        mc = jax.lax.slice(mc, (0,), (cap,))
        histo = _sum_shards_u64(ht._histogram_kernel(mc, histo_max))
        return mk[None], mc[None], histo

    mapped = shard_map(
        body, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None, None)),
        out_specs=(P(AXIS, None), P(AXIS, None), P()),
        check_vma=False,
    )
    return jax.jit(mapped)
