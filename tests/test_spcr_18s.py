"""In-process 18S sPCR integration test.

Port of the reference's build_test_case pipeline test
(/root/reference/src/pcr/mod.rs:1236-1395): a real 18S sequence
ingested 10x at k=21, full primer -> seed -> extend -> prune -> paths
pipeline, ending in do_pcr producing an amplicon that is an exact
substring of the source sequence.
"""

import numpy as np
import pytest

from sharkmer_tpu.ops import KmerTable, ascii_to_codes, codes_to_batch
from sharkmer_tpu.ops.encoding import seq_to_kmer
from sharkmer_tpu.pcr import PCRParams, do_pcr
from sharkmer_tpu.pcr import graph as graph_mod
from sharkmer_tpu.pcr import paths as paths_mod
from sharkmer_tpu.pcr import primers as primers_mod
from sharkmer_tpu.pcr import pruning as pruning_mod
from sharkmer_tpu.pcr.counts import FilteredTable
from sharkmer_tpu.pcr.primers import (
    FORWARD,
    REVERSE,
    get_kmers_from_primers,
    preprocess_primer_by_mismatch,
)

from data_18s import READ_STRING

K = 21
REPLICATES = 10


def build_test_case():
    table = KmerTable.create(K, capacity=1 << 13)
    codes = codes_to_batch([ascii_to_codes(READ_STRING)] * REPLICATES)
    table = table.ingest_codes(codes)
    params = PCRParams(
        forward_seq="AACCTGGTTGATCCTGCCAGT",
        reverse_seq="TGATCCTTCTGCAGGTTCACCTAC",
        min_length=0,
        max_length=2500,
        gene_name="18s",
        min_count=3,
        mismatches=2,
        trim=15,
    )
    return table, params


@pytest.fixture(scope="module")
def case():
    return build_test_case()


def test_primer_preprocessing_steps(case):
    table, params = case
    filtered = FilteredTable(table, 1)
    levels = preprocess_primer_by_mismatch(params, REVERSE, K)
    variants = set().union(*levels)
    # 991 variants of the reverse primer at r=2 (mod.rs:1295-1296)
    assert len(variants) == 991
    assert "TGCAGGTTCACCTAC" in variants
    assert "GGCAGGTTCACCTAC" in variants

    rev_kmers = get_kmers_from_primers(variants, filtered, params.min_count)
    assert len(rev_kmers) == 1
    from sharkmer_tpu.pcr.params import DEFAULT_MAX_NUM_PRIMER_KMERS

    capped = primers_mod.filter_primer_kmers(rev_kmers, DEFAULT_MAX_NUM_PRIMER_KMERS)
    assert len(capped) == 1


def test_extension_lookup(case):
    table, _ = case
    filtered = FilteredTable(table, 1)
    kmer = seq_to_kmer("TGATCCTGCCAGTATCATATG")
    assert filtered.get_canonical(kmer) is not None


def test_integration(case):
    table, params = case
    # canonical-only storage: number of unique kmers = positions
    assert table.n_unique() == len(READ_STRING) - K + 1
    assert table.n_total() == (len(READ_STRING) - K + 1) * REPLICATES

    filtered = FilteredTable(table, 1)
    fwd, rev = primers_mod.get_primer_kmers(params, filtered)
    assert len(fwd) == 1
    assert len(rev) == 1

    seed_graph, node_lookup = graph_mod.create_seed_graph(fwd, rev, filtered)
    assert seed_graph.node_count() == 2
    assert len(seed_graph.start_nodes()) == 1
    assert len(seed_graph.end_nodes()) == 1

    g, _, found = graph_mod.extend_graph(
        seed_graph, node_lookup, filtered, 5, params,
        graph_mod.DEFAULT_MAX_NUM_NODES,
    )
    assert found, "forward and reverse extensions should meet"

    all_paths = paths_mod.get_assembly_paths(g, filtered, params, None)
    assert all_paths, "expected paths after extension"

    pruning_mod.remove_low_coverage_tips(g, K, 0.1)
    pruning_mod.reachability_pruning(g)
    all_paths = paths_mod.get_assembly_paths(g, filtered, params, None)
    assert all_paths, "expected paths after pruning"


def test_do_pcr_end_to_end(case):
    table, params = case
    filtered = FilteredTable(table, 1)
    outcome = do_pcr(filtered, "testsample", params)
    assert outcome.failure_reason is None
    assert len(outcome.records) == 1
    rec = outcome.records[0]
    assert rec.rec_id == "testsample_18s_0"
    # product must be an exact substring of the source (sense strand)
    assert rec.seq in READ_STRING
    # amplicon starts with the trimmed forward primer (last 15 bases)
    assert rec.seq.startswith("GTTGATCCTGCCAGT")
    assert len(rec.seq) == 1808
    assert "product=0" in rec.desc


def test_do_pcr_missing_primer(case):
    table, params = case
    filtered = FilteredTable(table, 1)
    import dataclasses

    bad = dataclasses.replace(params, forward_seq="GGGGGGGGGGGGGGGGGGGG",
                              mismatches=0)
    outcome = do_pcr(filtered, "s", bad)
    assert outcome.records == []
    assert "not found" in outcome.failure_reason
