"""sPCR unit tests: primers, graph helpers, pruning, paths, bubbles,
threading — ported fixtures from the reference test suites
(/root/reference/src/pcr/*.rs #[cfg(test)] modules).
"""

import math

import numpy as np
import pytest

from sharkmer_tpu.pcr import graph as graph_mod
from sharkmer_tpu.pcr import paths as paths_mod
from sharkmer_tpu.pcr import pruning as pruning_mod
from sharkmer_tpu.pcr import bubble as bubble_mod
from sharkmer_tpu.pcr import threading as threading_mod
from sharkmer_tpu.pcr.graph import DBEdge, DBGraph, DBNode
from sharkmer_tpu.pcr.params import PCRParams
from sharkmer_tpu.pcr.primers import (
    combinations,
    permute_sequences,
    resolve_primer,
    string_to_oligo,
)
from sharkmer_tpu.pcr.spcr import compute_coverage_thresholds
from sharkmer_tpu.pcr.threading import EdgeReadSupport, ThreadingAnnotations
from sharkmer_tpu.utils import bounded_levenshtein


def mk_node(sub_kmer=0, is_start=False, is_end=False):
    return DBNode(sub_kmer, is_start, is_end)


def mk_edge(count):
    return DBEdge(0, 0, count, 1.0)


def make_params(min_length=0, max_length=100):
    return PCRParams(
        forward_seq="ACGT", reverse_seq="TGCA", min_length=min_length,
        max_length=max_length, gene_name="test", min_count=2, mismatches=0,
        trim=0,
    )


class FakeCounts:
    """Minimal FilteredTable stand-in for graph/path unit tests."""

    def __init__(self, k, data=None):
        self.k = k
        self.data = data or {}

    def get_canonical_many(self, kmers):
        from sharkmer_tpu.ops.encoding import revcomp_kmer

        out = np.zeros(len(kmers), np.uint32)
        for i, km in enumerate(np.asarray(kmers).tolist()):
            canon = min(km, revcomp_kmer(km, self.k))
            out[i] = self.data.get(canon, 0)
        return out

    def get_canonical(self, kmer):
        c = int(self.get_canonical_many(np.array([kmer], np.uint64))[0])
        return c if c > 0 else None


# --- primers ----------------------------------------------------------------

def test_string_to_oligo():
    kmer, length = string_to_oligo("GCGA")
    assert kmer == 0b1001_1000 and length == 4
    assert string_to_oligo("ACGT") == (0b00011011, 4)
    assert string_to_oligo("A") == (0, 1)
    assert string_to_oligo("T") == (3, 1)
    with pytest.raises(ValueError):
        string_to_oligo("ACNGT")
    assert string_to_oligo("") == (0, 0)


def test_resolve_primer():
    assert resolve_primer("ACGT") == {"ACGT"}
    assert resolve_primer("AR") == {"AA", "AG"}
    assert resolve_primer("RY") == {"AC", "AT", "GC", "GT"}
    assert resolve_primer("N") == {"A", "C", "G", "T"}
    got = resolve_primer("CGTAATGCGGCGN")
    assert got == {f"CGTAATGCGGCG{b}" for b in "ACGT"}


def test_combinations():
    assert len(combinations(4, 2)) == 6
    assert len(combinations(5, 0)) == 1
    assert len(combinations(3, 3)) == 1
    assert combinations(2, 5) == []


def test_permute_sequences():
    assert permute_sequences({"ACG"}, 0) == {"ACG"}
    got = permute_sequences({"AC"}, 1)
    assert got == {"AC", "CC", "GC", "TC", "AA", "AT", "AG"}
    assert len(permute_sequences({"CGT"}, 3)) == 64
    # procedural n=4 r=2 case (mod.rs:1152-1180)
    expected = set()
    for i in "ACGT":
        for j in "ACGT":
            for pat in [f"{i}{j}GT", f"{i}C{j}T", f"{i}CG{j}",
                        f"A{i}{j}T", f"A{i}G{j}", f"AC{i}{j}"]:
                expected.add(pat)
    assert len(permute_sequences({"ACGT"}, 2)) == len(expected)
    r = permute_sequences({"TGCAGGTTCACCTAC"}, 2)
    assert "TGCAGGTTCACCTAC" in r and "GGCAGGTTCACCTAC" in r


# --- coverage thresholds ----------------------------------------------------

def test_coverage_thresholds():
    # high <= min -> just min
    assert compute_coverage_thresholds(4, 3) == [3]
    # high=50, min=2 -> step=(25-2)//3=7 -> [25,18,11,2]
    assert compute_coverage_thresholds(50, 2) == [25, 18, 11, 2]
    # step rounds to zero -> dedup
    # step_size rounds to 0 -> repeats collapse
    assert compute_coverage_thresholds(10, 3) == [5, 3]
    assert compute_coverage_thresholds(8, 3) == [4, 3]


# --- graph helpers ----------------------------------------------------------

def create_test_graph():
    g = DBGraph()
    nodes = {}
    nodes["a"] = g.add_node(mk_node(0, True, False))
    nodes["b"] = g.add_node(mk_node(1))
    nodes["c"] = g.add_node(mk_node(2))
    nodes["d"] = g.add_node(mk_node(3, False, True))
    nodes["e"] = g.add_node(mk_node(4, False, True))
    g.add_edge(nodes["a"], nodes["b"], mk_edge(5))
    g.add_edge(nodes["b"], nodes["c"], mk_edge(10))
    g.add_edge(nodes["c"], nodes["d"], mk_edge(4))
    g.add_edge(nodes["c"], nodes["e"], mk_edge(1))
    return g, nodes


def test_descendants():
    g, n = create_test_graph()
    assert len(graph_mod.descendants(g, n["a"], 1)) == 1
    assert len(graph_mod.descendants(g, n["a"], 2)) == 2
    assert len(graph_mod.descendants(g, n["a"], 3)) == 4
    assert len(graph_mod.descendants(g, n["a"], 4)) == 4
    assert len(graph_mod.descendants(g, n["b"], 2)) == 3


def test_start_end_nodes():
    g, n = create_test_graph()
    assert g.start_nodes() == [n["a"]]
    assert sorted(g.end_nodes()) == sorted([n["d"], n["e"]])


def test_suffix_mask():
    assert graph_mod.get_suffix_mask(21) == (1 << 40) - 1
    assert graph_mod.get_suffix_mask(3) == 0b1111
    assert graph_mod.get_suffix_mask(2) == 0b11


def test_node_budget():
    assert graph_mod.compute_node_budget(0) == 100_000
    assert graph_mod.compute_node_budget(150_000_000) == 100_000
    assert graph_mod.compute_node_budget(750_000_000) == 500_000
    assert graph_mod.compute_node_budget(2**63) == 500_000
    mid = (150_000_000 + 750_000_000) // 2
    assert 100_000 < graph_mod.compute_node_budget(mid) < 500_000


def test_median_f64():
    assert graph_mod.median_f64([]) is None
    assert graph_mod.median_f64([42]) == 42.0
    assert graph_mod.median_f64([9, 1, 5]) == 5.0
    assert graph_mod.median_f64([11, 1, 9, 5]) == 7.0
    assert graph_mod.median_f64([7, 3]) == 5.0
    assert graph_mod.compute_median([3, 1, 4, 1, 5, 9, 2, 6]) == 3.5
    assert graph_mod.compute_median([]) == 0.0


# --- pruning ----------------------------------------------------------------

def test_remove_low_coverage_tip_forward():
    g = DBGraph()
    start = g.add_node(mk_node(0, True))
    a = g.add_node(mk_node(1))
    b = g.add_node(mk_node(2))
    end = g.add_node(mk_node(3, False, True))
    tip = g.add_node(mk_node(4))
    g.add_edge(start, a, mk_edge(100))
    g.add_edge(a, b, mk_edge(100))
    g.add_edge(b, end, mk_edge(100))
    g.add_edge(b, tip, mk_edge(1))
    pruning_mod.remove_low_coverage_tips(g, 3, 0.1)
    assert g.node_count() == 4
    assert tip not in g.nodes


def test_preserve_high_coverage_tip():
    g = DBGraph()
    start = g.add_node(mk_node(0, True))
    a = g.add_node(mk_node(1))
    end = g.add_node(mk_node(2, False, True))
    tip = g.add_node(mk_node(3))
    g.add_edge(start, a, mk_edge(10))
    g.add_edge(a, end, mk_edge(10))
    g.add_edge(a, tip, mk_edge(10))
    pruning_mod.remove_low_coverage_tips(g, 3, 0.1)
    assert g.node_count() == 4


def test_reachability_pruning():
    g = DBGraph()
    start = g.add_node(mk_node(0, True))
    a = g.add_node(mk_node(1))
    end = g.add_node(mk_node(2, False, True))
    orphan = g.add_node(mk_node(3))
    dead = g.add_node(mk_node(4))
    g.add_edge(start, a, mk_edge(10))
    g.add_edge(a, end, mk_edge(10))
    g.add_edge(start, dead, mk_edge(10))
    pruning_mod.reachability_pruning(g)
    assert g.node_count() == 3
    assert orphan not in g.nodes and dead not in g.nodes

    empty = DBGraph()
    pruning_mod.reachability_pruning(empty)
    assert empty.node_count() == 0


# --- paths ------------------------------------------------------------------

def test_linear_path():
    g = DBGraph()
    s = g.add_node(mk_node(0, True))
    a = g.add_node(mk_node(1))
    b = g.add_node(mk_node(2))
    e = g.add_node(mk_node(3, False, True))
    g.add_edge(s, a, mk_edge(10))
    g.add_edge(a, b, mk_edge(10))
    g.add_edge(b, e, mk_edge(10))
    fkc = FakeCounts(3, {0: 10})
    paths = paths_mod.get_assembly_paths(g, fkc, make_params(), None)
    assert len(paths) == 1
    assert [n for n, _ in paths[0]] == [s, a, b, e]
    assert paths[0][0][1] is None
    assert all(eid is not None for _, eid in paths[0][1:])


def test_diamond_finds_both_paths():
    g = DBGraph()
    s = g.add_node(mk_node(0, True))
    a = g.add_node(mk_node(1))
    b = g.add_node(mk_node(2))
    e = g.add_node(mk_node(3, False, True))
    g.add_edge(s, a, mk_edge(10))
    g.add_edge(s, b, mk_edge(5))
    g.add_edge(a, e, mk_edge(10))
    g.add_edge(b, e, mk_edge(5))
    paths = paths_mod.get_assembly_paths(g, FakeCounts(3, {0: 10}), make_params(), None)
    assert len(paths) == 2


def test_no_start_nodes_gives_empty():
    g = DBGraph()
    assert paths_mod.get_assembly_paths(g, FakeCounts(3), make_params(), None) == []


def test_max_length_caps_paths():
    g = DBGraph()
    s = g.add_node(mk_node(0, True))
    prev = s
    for i in range(1, 4):
        n = g.add_node(mk_node(i))
        g.add_edge(prev, n, mk_edge(10))
        prev = n
    e = g.add_node(mk_node(4, False, True))
    g.add_edge(prev, e, mk_edge(10))
    # 5 nodes needed; max_length=5, k=3 -> max_path_nodes = 4 -> no paths
    paths = paths_mod.get_assembly_paths(
        g, FakeCounts(3, {0: 10}), make_params(0, 5), None
    )
    assert paths == []


def test_dfs_budget_limits_exploration():
    g = DBGraph()
    s = g.add_node(mk_node(0, True))
    a = g.add_node(mk_node(1))
    e = g.add_node(mk_node(2, False, True))
    g.add_edge(s, a, mk_edge(10))
    g.add_edge(a, e, mk_edge(10))
    p = make_params()
    p.max_dfs_states = 0
    assert paths_mod.get_assembly_paths(g, FakeCounts(3, {0: 10}), p, None) == []


def test_sorted_children_order():
    g = DBGraph()
    s = g.add_node(mk_node(0, True))
    lo = g.add_node(mk_node(1))
    hi = g.add_node(mk_node(2))
    lo_edge = g.add_edge(s, lo, mk_edge(1))
    hi_edge = g.add_edge(s, hi, mk_edge(100))
    children = paths_mod._sorted_children(g, s, None)
    assert len(children) == 2
    assert children[0][:2] == (lo, lo_edge)
    assert children[1][:2] == (hi, hi_edge)


# --- dedup / scoring --------------------------------------------------------

def test_bounded_levenshtein():
    rng = np.random.default_rng(0)

    def brute(a, b):
        n, m = len(a), len(b)
        d = [[0] * (m + 1) for _ in range(n + 1)]
        for i in range(n + 1):
            d[i][0] = i
        for j in range(m + 1):
            d[0][j] = j
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                d[i][j] = min(
                    d[i - 1][j] + 1,
                    d[i][j - 1] + 1,
                    d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                )
        return d[n][m]

    for _ in range(200):
        n = int(rng.integers(0, 25))
        m = int(rng.integers(0, 25))
        a = "".join(rng.choice(list("ACGT"), size=n))
        b = "".join(rng.choice(list("ACGT"), size=m))
        k = int(rng.integers(0, 12))
        exact = brute(a, b)
        got = bounded_levenshtein(a, b, k)
        if exact <= k:
            assert got == exact, (a, b, k)
        else:
            assert got is None, (a, b, k, exact, got)


def test_path_score_composite():
    s = paths_mod.PathScore(5, 10.0, 0.5, 1.0)
    assert s.composite() == 10.0
    s = paths_mod.PathScore(5, 10.0, 2.0, 1.0)
    assert s.composite() == pytest.approx(5.0)
    s = paths_mod.PathScore(5, 10.0, 0.5, 10.0)
    assert s.composite() == pytest.approx(5.0)
    s = paths_mod.PathScore(5, 10.0, 0.5, 1.0, zero_support_edges=1,
                            median_unambiguous_support=2.0,
                            edge_support_fraction=1.0)
    assert s.composite() == pytest.approx(5.0)


# --- threading --------------------------------------------------------------

def make_threading_graph():
    g = DBGraph()
    n0 = g.add_node(mk_node(0b0000, True, False))  # AA
    n1 = g.add_node(mk_node(0b0001))  # AC
    n2 = g.add_node(mk_node(0b0110, False, True))  # CG
    e0 = g.add_edge(n0, n1, mk_edge(10))  # AAC
    e1 = g.add_edge(n1, n2, mk_edge(8))  # ACG
    return g, (n0, n1, n2), (e0, e1)


def canonical_edge_kmer(g, eid, k):
    from sharkmer_tpu.ops.encoding import revcomp_kmer

    kmer = g.edge_kmer(eid)
    return min(kmer, revcomp_kmer(kmer, k))


def test_build_edge_lookup():
    g, _, _ = make_threading_graph()
    lookup = threading_mod.build_edge_lookup(g, 3)
    assert len(lookup) == 2
    assert all(len(v) == 1 for v in lookup.values())


def test_contiguous_run_linear_and_gap():
    g, _, (e0, e1) = make_threading_graph()
    lookup = threading_mod.build_edge_lookup(g, 3)
    kmers = [canonical_edge_kmer(g, e0, 3), canonical_edge_kmer(g, e1, 3)]
    runs = threading_mod.find_contiguous_runs(kmers, lookup, g)
    assert [len(r.edges) if hasattr(r, "edges") else len(r) for r in runs] == [2]

    gap = 0xDEADBEEF
    runs = threading_mod.find_contiguous_runs(
        [kmers[0], gap, kmers[1]], lookup, g
    )
    assert [len(r) for r in runs] == [1, 1]


def test_inverted_repeat_disambiguation():
    # threading.rs:479-587
    g = DBGraph()
    n_a = g.add_node(mk_node(0b0000, True))  # AA
    n_b = g.add_node(mk_node(0b0001))  # AC
    n_c = g.add_node(mk_node(0b1011))  # GT
    n_d = g.add_node(mk_node(0b1111, False, True))  # TT
    e_x = g.add_edge(n_a, n_b, mk_edge(10))  # AAC
    e_bridge = g.add_edge(n_b, n_c, mk_edge(10))
    e_rcx = g.add_edge(n_c, n_d, mk_edge(10))  # GTT = rc(AAC)

    lookup = threading_mod.build_edge_lookup(g, 3)
    canonical = canonical_edge_kmer(g, e_x, 3)
    assert canonical == canonical_edge_kmer(g, e_rcx, 3)
    assert sorted(lookup[canonical]) == sorted([e_x, e_rcx])

    kmers = [
        canonical_edge_kmer(g, e_x, 3),
        canonical_edge_kmer(g, e_bridge, 3),
        canonical_edge_kmer(g, e_rcx, 3),
    ]
    runs = threading_mod.find_contiguous_runs(kmers, lookup, g)
    flat = [e for r in runs for e in r]
    assert flat[2] == e_rcx


def test_unambiguous_and_branch_links():
    g, (n0, n1, n2), (e0, e1) = make_threading_graph()
    assert threading_mod._is_run_unambiguous(g, [e0, e1])
    n3 = g.add_node(mk_node(0b1010))
    g.add_edge(n1, n3, mk_edge(3))
    assert not threading_mod._is_run_unambiguous(g, [e0, e1])
    links = {}
    threading_mod._record_branch_links(g, [e0, e1], links)
    assert len(links) == 1


# --- bubbles ----------------------------------------------------------------

def make_bubble_graph():
    g = DBGraph()
    n0 = g.add_node(mk_node(0, True))
    n1 = g.add_node(mk_node(1))
    n2 = g.add_node(mk_node(2))
    n3 = g.add_node(mk_node(3, False, True))
    e0 = g.add_edge(n0, n1, mk_edge(5))
    e1 = g.add_edge(n0, n2, mk_edge(3))
    e2 = g.add_edge(n1, n3, mk_edge(5))
    e3 = g.add_edge(n2, n3, mk_edge(3))
    return g, (e0, e1, e2, e3)


def test_detect_simple_bubble():
    g, _ = make_bubble_graph()
    bubbles = bubble_mod.detect_simple_bubbles(g)
    assert len(bubbles) == 1
    assert len(bubbles[0].branches) == 2


def test_resolve_with_read_support():
    g, (e0, e1, e2, e3) = make_bubble_graph()
    ann = ThreadingAnnotations()
    ann.edge_support[e0] = EdgeReadSupport(10, 8)
    ann.edge_support[e2] = EdgeReadSupport(10, 8)
    ann.edge_support[e1] = EdgeReadSupport(2, 1)
    ann.edge_support[e3] = EdgeReadSupport(2, 1)
    prefs = bubble_mod.resolve_bubbles(g, ann)
    assert prefs[e0] > prefs[e1]
    assert prefs[e2] > prefs[e3]


def test_no_bubble_linear():
    g = DBGraph()
    n0 = g.add_node(mk_node(0, True))
    n1 = g.add_node(mk_node(1, False, True))
    g.add_edge(n0, n1, mk_edge(5))
    assert bubble_mod.detect_simple_bubbles(g) == []


def test_depth_limited_branches_not_a_bubble():
    g = DBGraph()
    source = g.add_node(mk_node(0, True))
    for base in (1000, 2000):
        prev = source
        for i in range(60):
            n = g.add_node(mk_node(base + i + 1))
            g.add_edge(prev, n, mk_edge(5))
            prev = n
    assert bubble_mod.detect_simple_bubbles(g) == []


def test_bubble_tiebreak_deterministic():
    g, edges = make_bubble_graph()
    ann = ThreadingAnnotations()
    for e in edges:
        ann.edge_support[e] = EdgeReadSupport(10, 5)
    ref = sorted(bubble_mod.resolve_bubbles(g, ann).items())
    for _ in range(10):
        assert sorted(bubble_mod.resolve_bubbles(g, ann).items()) == ref
