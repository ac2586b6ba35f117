#!/usr/bin/env python3
"""Compile-cost vs steady-state decomposition of the 8M-read count path.

Feeds the production SortedKmerStore the same drain/merge shape
sequence as the bench's 8M row — N buffers of 2^27 keys with the
noisy workload's two-component structure (~19% error singletons over
a 25M-key genome pool: ~45M uniques per drain, ~220M distinct total)
— TWICE in one process. Pass 1 pays every mid-run compile; pass 2 is
steady state. The difference is the compile bill the bench's timed
row was paying before _warm_scale_shapes.

Keys are generated ON DEVICE (no host datagen): values don't matter
to shapes, only occupancies do.

Usage: python scripts/profile_scale.py [--drains 8] [--width 27]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _mix64(z):
    """SplitMix64 finalizer: uniform spread over the u64 space."""
    z = z * jnp.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> jnp.uint64(30))) * jnp.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> jnp.uint64(27))) * jnp.uint64(0x94D049BB133111EB)
    return z ^ (z >> jnp.uint64(31))


def junk_batch(seed: int, n: int, pool: int, sing_frac: float, k: int):
    """Device-generated pseudo-kmer batch mimicking the noisy-read
    workload's two-component key structure: ``sing_frac`` of events
    are error singletons (globally distinct keys), the rest draw from
    a ``pool``-key "genome" (high duplication). Both components are
    SplitMix64-hashed so keys spread uniformly over the 2^2k keyspace
    like real canonical k-mers (a dense key range is pathological for
    the sPCR bucket index and for closure walks). This reproduces the
    production drain-run occupancies (~45M uniques/drain at the 8M
    row) and the master's partition trajectory, which is what the
    compiled-shape set depends on."""
    mask = jnp.uint64((1 << (2 * k)) - 1)

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        g_idx = jax.random.randint(
            k1, (n,), 0, np.int64(pool), dtype=jnp.int64
        ).astype(jnp.uint64)
        genome = _mix64(g_idx + jnp.uint64(1)) & mask
        s_idx = (
            jnp.uint64(1 << 48)
            + jnp.uint64(seed) * jnp.uint64(n)
            + jnp.arange(n, dtype=jnp.uint64)
        )
        sing = _mix64(s_idx) & mask
        pick = jax.random.uniform(k2, (n,)) < sing_frac
        return jnp.where(pick, sing, genome)

    return gen(jax.random.PRNGKey(seed))


def one_pass(k: int, drains: int, width: int, pool: int,
             sing_frac: float, label: str, spcr: bool):
    from sharkmer_tpu.ops.sorted_store import SortedKmerStore

    n = 1 << width
    store = SortedKmerStore.create(k)
    t_pass = time.perf_counter()
    for d in range(drains):
        kmers = junk_batch(d, n, pool, sing_frac, k)
        jax.block_until_ready(kmers)
        t0 = time.perf_counter()
        store.insert_kmers(kmers)
        store.flush()
        print(f"[{label}] drain+fold {d}: "
              f"{time.perf_counter() - t0:6.1f}s "
              f"({len(store.parts)} parts)", flush=True)
    t0 = time.perf_counter()
    h = store.histogram(10_000)
    print(f"[{label}] histogram: {time.perf_counter() - t0:6.1f}s "
          f"(n_unique {store.n_unique_master()})", flush=True)
    count_wall = time.perf_counter() - t_pass
    print(f"[{label}] count total: {count_wall:6.1f}s", flush=True)

    if spcr:
        from sharkmer_tpu.pcr.counts import FilteredTable

        t0 = time.perf_counter()
        ft = FilteredTable(store, min_count=2, mode="auto")
        ft.warm_caches()
        print(f"[{label}] sPCR prep (index build): "
              f"{time.perf_counter() - t0:6.1f}s", flush=True)
    return count_wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--drains", type=int, default=8)
    ap.add_argument("--width", type=int, default=27)
    ap.add_argument("--pool", type=int, default=25_000_000,
                    help="genome-pool size (high-duplication keys); 25M"
                         " matches the bench's 20 Mbp genome")
    ap.add_argument("--sing-frac", type=float, default=0.19,
                    help="fraction of events that are error singletons"
                         " (1-(1-err)^k at err=1%%, k=21)")
    ap.add_argument("--k", type=int, default=21)
    ap.add_argument("--spcr", action="store_true",
                    help="also time the sPCR index build per pass")
    args = ap.parse_args()
    print(f"platform {jax.devices()[0].platform}; "
          f"{args.drains} drains x 2^{args.width} from a "
          f"{args.pool} pool", flush=True)
    w1 = one_pass(args.k, args.drains, args.width, args.pool,
                  args.sing_frac, "pass1 (compiles)", args.spcr)
    w2 = one_pass(args.k, args.drains, args.width, args.pool,
                  args.sing_frac, "pass2 (steady)", args.spcr)
    print(f"compile bill: {w1 - w2:.1f}s of pass1's {w1:.1f}s; "
          f"steady-state count wall {w2:.1f}s", flush=True)


if __name__ == "__main__":
    main()
