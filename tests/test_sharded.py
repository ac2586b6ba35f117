"""Shard-invariance tests: N-shard results must equal 1-shard results
bit-for-bit (the distributed analog of the reference's chunk-invariance
oracle, tests/spcr_18s.rs:438-528)."""

import collections

import jax
import numpy as np
import pytest

from sharkmer_tpu.ops import KmerTable, ascii_to_codes, codes_to_batch
from sharkmer_tpu.ops.encoding import kmers_from_ascii_ref, seq_to_kmer
from sharkmer_tpu.parallel import ShardedKmerTable, make_mesh

from util import random_genome, reads_from_genome


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


@pytest.fixture(scope="module")
def dataset():
    genome = random_genome(4000, seed=21, n_rate=0.005)
    reads = reads_from_genome(genome, 2000, read_len=100, seed=22)
    return reads


def build_both(reads, k, mesh, batches=4):
    single = KmerTable.create(k, capacity=1 << 14)
    sharded = ShardedKmerTable.create(k, mesh, local_capacity=1 << 11)
    n = len(reads)
    step = -(-n // batches)
    for i in range(0, n, step):
        codes = codes_to_batch([ascii_to_codes(r) for r in reads[i : i + step]])
        single = single.ingest_codes(codes)
        sharded = sharded.ingest_codes(codes)
    return single, sharded


def test_sharded_matches_single(mesh8, dataset):
    k = 21
    single, sharded = build_both(dataset, k, mesh8)

    assert sharded.n_unique() == single.n_unique()
    assert sharded.n_total() == single.n_total()
    assert sharded.to_dict() == single.to_dict()

    # histograms bit-identical
    np.testing.assert_array_equal(sharded.histogram(100), single.histogram(100))

    # lookups identical (hits and misses)
    rng = np.random.default_rng(3)
    queries = np.concatenate([
        np.array(list(single.to_dict().keys())[:500], np.uint64),
        rng.integers(0, 1 << 42, size=500, dtype=np.uint64),
    ])
    np.testing.assert_array_equal(
        sharded.lookup_directional(queries), single.lookup_directional(queries)
    )


def test_sharded_prefix_scan_matches(mesh8, dataset):
    k = 15
    single, sharded = build_both(dataset, k, mesh8)
    oligo = np.array([seq_to_kmer(dataset[0][:9])], np.uint64)
    k1, c1 = single.prefix_scan(oligo, 9, min_count=1)
    k2, c2 = sharded.prefix_scan(oligo, 9, min_count=1)
    # order differs across shards; compare as multisets
    assert sorted(zip(k1.tolist(), c1.tolist())) == sorted(
        zip(k2.tolist(), c2.tolist())
    )
    assert len(k1) > 0


def test_sharded_counts_match_python_model(mesh8, dataset):
    k = 17
    _, sharded = build_both(dataset, k, mesh8, batches=2)
    model = collections.Counter()
    for r in dataset:
        model.update(kmers_from_ascii_ref(r, k))
    assert sharded.to_dict() == dict(model)


@pytest.mark.parametrize("n_shards", [2, 4])
def test_other_shard_counts(n_shards, dataset):
    k = 19
    mesh = make_mesh(n_shards)
    single = KmerTable.create(k, capacity=1 << 14)
    sharded = ShardedKmerTable.create(k, mesh, local_capacity=1 << 12)
    codes = codes_to_batch([ascii_to_codes(r) for r in dataset[:800]])
    single = single.ingest_codes(codes)
    sharded = sharded.ingest_codes(codes)
    assert sharded.to_dict() == single.to_dict()
    np.testing.assert_array_equal(sharded.histogram(50), single.histogram(50))


def test_engine_with_sharded_backend(dataset):
    """CountingEngine(n_shards=4) matches the single-device engine."""
    from sharkmer_tpu.engine import CountingEngine

    reads = [r.encode() for r in dataset[:1500]]
    e1 = CountingEngine(k=17, n_chunks=4, histo_max=60,
                        initial_capacity=1 << 13)
    e1.ingest(iter(reads))
    v1 = e1.consolidate()

    e8 = CountingEngine(k=17, n_chunks=4, histo_max=60,
                        initial_capacity=1 << 13, n_shards=4)
    e8.ingest(iter(reads))
    v8 = e8.consolidate()

    assert e1.stats.__dict__ == e8.stats.__dict__
    for a, b in zip(v1, v8):
        np.testing.assert_array_equal(a, b)
    assert e8.table.to_dict() == e1.table.to_dict()


def test_sharded_growth(mesh8, dataset):
    k = 19
    small = ShardedKmerTable.create(k, mesh8, local_capacity=1 << 6)
    import collections

    from sharkmer_tpu.ops.encoding import kmers_from_ascii_ref

    model = collections.Counter()
    for r in dataset[:300]:
        model.update(kmers_from_ascii_ref(r, k))
    kmers = np.array(list(model.elements()), np.uint64)
    small = small.insert_kmers(kmers)
    assert small.local_capacity > 1 << 6
    assert small.to_dict() == dict(model)


def test_sharded_merge_from(mesh8, dataset):
    """merge_from on both sharded backends equals one-table inserts
    (the streamed chunked engine's consolidation primitive)."""
    from sharkmer_tpu.parallel.sorted_sharded import ShardedSortedStore

    k = 19
    kms = np.array(
        [m for r in dataset for m in kmers_from_ascii_ref(r, k)],
        dtype=np.uint64,
    )
    half = len(kms) // 2
    for cls, cap in [(ShardedKmerTable, 1 << 11),
                     (ShardedSortedStore, 1 << 11)]:
        one = cls.create(k, mesh8, local_capacity=cap).insert_kmers(kms)
        a = cls.create(k, mesh8, local_capacity=cap).insert_kmers(kms[:half])
        b = cls.create(k, mesh8, local_capacity=cap).insert_kmers(kms[half:])
        merged = a.merge_from(b)
        assert merged.to_dict() == one.to_dict()
