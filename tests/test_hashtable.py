"""Count-table tests.

Mirrors the reference counting suite
(/root/reference/src/kmer/counting.rs:361-510): accumulation,
saturation, merges, filtered views, plus table-specific behaviour
(growth, probe collisions) and a randomized differential test against
a python dict counter.
"""

import collections

import numpy as np
import pytest

from sharkmer_tpu.ops import (
    KmerTable,
    ascii_to_codes,
    codes_to_batch,
    kmers_from_ascii_ref,
)
from sharkmer_tpu.ops.histogram import histogram_from_counts


def make_table(k=5, capacity=1 << 10):
    return KmerTable.create(k, capacity)


def test_insert_and_get():
    t = make_table().insert_kmers(np.array([42], np.uint64), np.array([3], np.uint32))
    assert t.to_dict() == {42: 3}
    assert int(t.lookup(np.array([42], np.uint64))[0]) == 3
    assert int(t.lookup(np.array([99], np.uint64))[0]) == 0


def test_insert_accumulates():
    t = make_table()
    t = t.insert_kmers(np.array([42], np.uint64), np.array([3], np.uint32))
    t = t.insert_kmers(np.array([42], np.uint64), np.array([7], np.uint32))
    assert t.to_dict() == {42: 10}
    assert t.n_unique() == 1


def test_batch_duplicates_aggregate():
    t = make_table().insert_kmers(np.array([7, 7, 7, 9], np.uint64))
    assert t.to_dict() == {7: 3, 9: 1}


def test_saturating_add():
    t = make_table()
    t = t.insert_kmers(np.array([1], np.uint64), np.array([0xFFFFFFFF], np.uint32))
    t = t.insert_kmers(np.array([1], np.uint64), np.array([1], np.uint32))
    assert t.to_dict() == {1: 0xFFFFFFFF}


def test_merge_two_tables_semantics():
    # extend() semantics: merging = inserting the other table's pairs
    a = make_table().insert_kmers(
        np.array([1, 2], np.uint64), np.array([10, 20], np.uint32)
    )
    b = {2: 5, 3: 15}
    a = a.insert_kmers(
        np.array(list(b.keys()), np.uint64), np.array(list(b.values()), np.uint32)
    )
    assert a.to_dict() == {1: 10, 2: 25, 3: 15}


def test_growth_preserves_contents():
    t = KmerTable.create(5, capacity=64)
    rng = np.random.default_rng(1)
    kmers = rng.integers(0, 1 << 10, size=500, dtype=np.uint64)
    t = t.insert_kmers(kmers)
    assert t.capacity > 64
    expected = collections.Counter(kmers.tolist())
    assert t.to_dict() == dict(expected)


def test_randomized_differential_vs_dict():
    rng = np.random.default_rng(7)
    t = KmerTable.create(21, capacity=1 << 12)
    model: collections.Counter = collections.Counter()
    for _ in range(5):
        batch = rng.integers(0, 1 << 42, size=2000, dtype=np.uint64)
        # heavy duplication to stress aggregation
        batch = np.concatenate([batch, batch[: rng.integers(0, 2000)]])
        t = t.insert_kmers(batch)
        model.update(batch.tolist())
    assert t.to_dict() == dict(model)
    assert t.n_unique() == len(model)
    assert t.n_total() == sum(model.values())
    # random lookups incl. misses
    queries = rng.integers(0, 1 << 42, size=1000, dtype=np.uint64)
    got = np.asarray(t.lookup(queries))
    for q, g in zip(queries.tolist(), got.tolist()):
        assert g == model.get(q, 0)


def test_ingest_seq_canonical_counts():
    # counting.rs test_ingest_seq: ACGT at k=3 -> ACG,CGT are revcomp
    # pair -> one canonical entry with count 2
    t = KmerTable.create(3, capacity=64)
    codes = codes_to_batch([ascii_to_codes("ACGT")])
    t = t.ingest_codes(codes)
    assert t.n_unique() == 1
    assert t.n_total() == 2


def test_ingest_matches_reference_encoder():
    seqs = ["ACGTACGTACGTTTTGGGA", "NTANCACNAGAAAATC", "CCCCCCCCCCCC"]
    k = 7
    t = KmerTable.create(k, capacity=1 << 10)
    t = t.ingest_codes(codes_to_batch([ascii_to_codes(s) for s in seqs]))
    model: collections.Counter = collections.Counter()
    for s in seqs:
        model.update(kmers_from_ascii_ref(s, k))
    assert t.to_dict() == dict(model)


def test_histogram_vector():
    # histogram expected vector from mod.rs:289-305
    t = make_table(k=11, capacity=256)
    kmers = np.array([1, 20, 2, 11, 12], np.uint64)
    counts = np.array([5, 5, 7, 11, 12], np.uint32)
    t = t.insert_kmers(kmers, counts)
    vec = t.histogram(histo_max=10)
    expected = np.array([0, 0, 0, 0, 0, 2, 0, 1, 0, 0, 0, 2], np.uint64)
    np.testing.assert_array_equal(vec, expected)
    # numpy dual-path check
    np.testing.assert_array_equal(
        vec, histogram_from_counts(np.array(list(t.to_dict().values())), 10)
    )


def test_prefix_scan_forward_and_rc():
    # primers.rs:604-696 behaviours
    from sharkmer_tpu.ops.encoding import seq_to_kmer

    k = 5

    def build(seq):
        t = KmerTable.create(k, capacity=256)
        return t.ingest_codes(codes_to_batch([ascii_to_codes(seq)]))

    # forward match: kmers of ACGTACGT starting with ACG
    t = build("ACGTACGT")
    oligo = np.array([seq_to_kmer("ACG")], np.uint64)
    kmers, counts = t.prefix_scan(oligo, 3, min_count=1)
    assert len(kmers) > 0

    # no match
    t = build("AAAAAAAAAA")
    kmers, _ = t.prefix_scan(np.array([seq_to_kmer("GGG")], np.uint64), 3, 1)
    assert len(kmers) == 0

    # min_count filter: all-distinct canonical kmers have count 1
    t = build("AACCCAACC")
    kmers, _ = t.prefix_scan(np.array([seq_to_kmer("AAC")], np.uint64), 3, 2)
    assert len(kmers) == 0

    # RC hit is stored revcomp-normalized: oligo AAA on TTTTTTT
    t = build("TTTTTTT")
    kmers, counts = t.prefix_scan(np.array([seq_to_kmer("AAA")], np.uint64), 3, 1)
    assert len(kmers) == 1
    from sharkmer_tpu.ops.encoding import kmer_to_seq

    assert kmer_to_seq(int(kmers[0]), k) == "AAAAA"

    # oligo length k-1 is the maximum valid
    t = build("ACGTACGT")
    kmers, _ = t.prefix_scan(np.array([seq_to_kmer("ACGT")], np.uint64), 4, 1)
    assert len(kmers) > 0
    with pytest.raises(ValueError):
        t.prefix_scan(np.array([seq_to_kmer("ACGTA")], np.uint64), 5, 1)
