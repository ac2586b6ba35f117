#!/usr/bin/env python3
"""Per-kernel decomposition of the count loop on the real chip.

Times each stage of the production drain path at the bench's 1M-read
workload width (2^27 raw k-mers): flat u64 sort, Pallas run-starts
(forward + flipped), the full ghosted drain, the v2 compaction drain,
partition seeding, and the final histogram sweep. Prints one line per
stage so docs/DESIGN.md's cost model stays measured, not guessed.

Usage:  python scripts/profile_count.py [--width 27] [--iters 3]
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


def _sync(out):
    """Fetch one element to host — on the tunneled axon platform
    block_until_ready returns before remote execution completes, so a
    tiny device->host read is the only real synchronization."""
    leaves = jax.tree_util.tree_leaves(out)
    for leaf in leaves:
        if hasattr(leaf, "shape") and getattr(leaf, "size", 0):
            np.asarray(leaf.reshape(-1)[:1])
    return out


def timeit(label, fn, iters=3):
    _sync(fn())  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        _sync(fn())
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:40s} {dt * 1e3:9.1f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=27)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--k", type=int, default=21)
    args = ap.parse_args()
    n = 1 << args.width
    k = args.k

    from sharkmer_tpu.ops import pallas_kernels, sorted_store
    from sharkmer_tpu.ops.sorted_store import (
        SortedKmerStore,
        _aggregate_ingest_ghosted_jit,
        _aggregate_ingest_v2_jit,
    )

    # ~5.3x duplication like the 1M-read noisy workload (131M events,
    # ~25M unique keys)
    rng = np.random.default_rng(0)
    mask = np.uint64((1 << (2 * k)) - 1)
    uniq = rng.integers(0, 1 << (2 * k), size=n // 5, dtype=np.uint64)
    raw = uniq[rng.integers(0, len(uniq), size=n)] & mask
    buf = jnp.asarray(raw)
    print(f"width 2^{args.width} = {n} kmers, k={k}, "
          f"~{len(uniq)} unique, platform "
          f"{jax.devices()[0].platform}", flush=True)

    timeit("flat u64 sort (lax.sort)",
           lambda: jax.jit(lambda x: jax.lax.sort(x, is_stable=False))(buf),
           args.iters)
    sk = jax.lax.sort(buf, is_stable=False)
    timeit("pallas run_starts (fwd)",
           lambda: pallas_kernels.run_starts(sk), args.iters)
    timeit("flip + run_starts (bwd)",
           lambda: pallas_kernels.run_starts(jnp.flip(sk)), args.iters)
    # the drain kernels DONATE their input: hand each call a fresh
    # device-side copy so the (slow tunneled) host upload stays out of
    # the measured window
    timeit(
        "ghosted drain (sort+1 scan+counts)",
        lambda: _aggregate_ingest_ghosted_jit(
            buf + jnp.uint64(0), use_pallas=True
        ),
        args.iters,
    )
    timeit(
        "v2 drain (sort+scan+row compact)",
        lambda: _aggregate_ingest_v2_jit(
            buf + jnp.uint64(0), count_bits=64 - 2 * k, interpret=False
        ),
        args.iters,
    )

    # counts array shaped like a seeded partition: histogram sweep cost
    ghk, ghc, n_p, n_r = _aggregate_ingest_ghosted_jit(
        buf + jnp.uint64(0), use_pallas=True
    )
    print(f"  (n_padded={int(n_p)}, n_real={int(n_r)})", flush=True)

    def full_store_pass():
        store = SortedKmerStore.create(k)
        store.insert_kmers(buf + jnp.uint64(0))  # device copy: no upload
        store.flush()
        return store

    store = full_store_pass()
    timeit("histogram(10000) on seeded store",
           lambda: store.histogram(10_000), args.iters)

    t0 = time.perf_counter()
    s2 = full_store_pass()
    h = s2.histogram(10_000)
    jax.block_until_ready(h)
    print(f"{'full insert+flush+histogram':40s} "
          f"{(time.perf_counter() - t0) * 1e3:9.1f} ms", flush=True)
    print(f"-> {n / (time.perf_counter() - t0) / 1e6:.1f} M ingest-elems/s "
          f"upper bound (excl. encode)", flush=True)


if __name__ == "__main__":
    main()
