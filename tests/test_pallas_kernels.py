"""Differential tests for the Pallas drain kernels.

On the CPU test platform the kernels run in the Pallas interpreter;
the oracle is the XLA ``lax.cummax`` formulation the kernel replaces
on TPU (the dual-path pattern of /root/reference/src/kmer/encoding.rs:4-23
applied to the drain's run-length-encode step).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sharkmer_tpu.ops import pallas_kernels
from sharkmer_tpu.ops.sorted_store import (
    EMPTY,
    _aggregate_ingest_impl,
)

pytestmark = pytest.mark.skipif(
    not pallas_kernels.HAVE_PALLAS, reason="pallas not importable"
)

TILE = 256 * pallas_kernels.LANES  # default kernel tile (131072)


def _oracle_run_starts(sorted_keys: np.ndarray) -> np.ndarray:
    """XLA formulation: cummax over run-start positions."""
    sk = jnp.asarray(sorted_keys)
    first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    pos = jnp.arange(sk.shape[0], dtype=jnp.int32)
    return np.asarray(jax.lax.cummax(jnp.where(first, pos, 0)))


def _sorted_keys_with_runs(n: int, n_distinct: int, seed: int,
                           sentinel_tail: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, 1 << 62, size=n_distinct, dtype=np.uint64)
    draw = rng.choice(keys, size=n - sentinel_tail)
    out = np.sort(draw)
    if sentinel_tail:
        out = np.concatenate(
            [out, np.full(sentinel_tail, EMPTY, np.uint64)]
        )
    return out


@pytest.mark.parametrize("n_tiles", [1, 2, 4])
def test_run_starts_matches_cummax(n_tiles):
    n = n_tiles * TILE
    sk = _sorted_keys_with_runs(n, n // 3, seed=n_tiles,
                                sentinel_tail=n // 7)
    got = np.asarray(
        pallas_kernels.run_starts(jnp.asarray(sk), interpret=True)
    )
    np.testing.assert_array_equal(got, _oracle_run_starts(sk))


def test_run_starts_edge_cases():
    # all-equal keys: one run spanning every tile boundary
    sk = np.zeros(2 * TILE, np.uint64)
    got = np.asarray(
        pallas_kernels.run_starts(jnp.asarray(sk), interpret=True)
    )
    np.testing.assert_array_equal(got, np.zeros(2 * TILE, np.int32))

    # all-distinct keys: every element is its own run start
    sk = np.arange(TILE, dtype=np.uint64)
    got = np.asarray(
        pallas_kernels.run_starts(jnp.asarray(sk), interpret=True)
    )
    np.testing.assert_array_equal(got, np.arange(TILE, dtype=np.int32))

    # runs that straddle exactly the tile boundary
    sk = np.repeat(
        np.arange(TILE // 2, dtype=np.uint64), 4
    )  # length 2*TILE, runs of 4
    got = np.asarray(
        pallas_kernels.run_starts(jnp.asarray(sk), interpret=True)
    )
    np.testing.assert_array_equal(got, _oracle_run_starts(sk))


def test_run_starts_rejects_untiled_width():
    with pytest.raises(ValueError):
        pallas_kernels.run_starts(
            jnp.zeros(TILE + 1, jnp.uint64), interpret=True
        )


def _oracle_run_ends(sorted_keys: np.ndarray) -> np.ndarray:
    """XLA formulation: reverse cummin over run-end positions."""
    sk = jnp.asarray(sorted_keys)
    last = jnp.concatenate([sk[:-1] != sk[1:], jnp.ones((1,), bool)])
    pos = jnp.arange(sk.shape[0], dtype=jnp.int32)
    return np.asarray(jnp.flip(jax.lax.cummin(jnp.flip(
        jnp.where(last, pos, jnp.int32(0x7FFF_FFFF))
    ))))


@pytest.mark.parametrize("n_tiles", [1, 2, 4])
def test_run_ends_matches_cummin(n_tiles):
    n = n_tiles * TILE
    sk = _sorted_keys_with_runs(n, n // 3, seed=n_tiles,
                                sentinel_tail=n // 7)
    got = np.asarray(
        pallas_kernels.run_ends(jnp.asarray(sk), interpret=True)
    )
    np.testing.assert_array_equal(got, _oracle_run_ends(sk))


def test_run_ends_edge_cases():
    # all-equal keys: one run ending at the final element
    sk = np.zeros(2 * TILE, np.uint64)
    got = np.asarray(
        pallas_kernels.run_ends(jnp.asarray(sk), interpret=True)
    )
    np.testing.assert_array_equal(
        got, np.full(2 * TILE, 2 * TILE - 1, np.int32)
    )

    # all-distinct keys: every element is its own run end
    sk = np.arange(TILE, dtype=np.uint64)
    got = np.asarray(
        pallas_kernels.run_ends(jnp.asarray(sk), interpret=True)
    )
    np.testing.assert_array_equal(got, np.arange(TILE, dtype=np.int32))

    # runs of 4 straddling the tile boundary
    sk = np.repeat(np.arange(TILE // 2, dtype=np.uint64), 4)
    got = np.asarray(
        pallas_kernels.run_ends(jnp.asarray(sk), interpret=True)
    )
    np.testing.assert_array_equal(got, _oracle_run_ends(sk))


def test_ghosted_drain_pallas_matches_xla():
    """The ghosted fresh drain's Pallas run-ends path must produce
    bit-identical (keys, counts, n_padded, n_real) to the XLA
    cummin fallback."""
    from sharkmer_tpu.ops.sorted_store import _aggregate_ingest_ghosted_impl

    buf = _sorted_keys_with_runs(TILE, TILE // 4, seed=5,
                                 sentinel_tail=TILE // 5)
    rng = np.random.default_rng(17)
    rng.shuffle(buf)  # drains sort internally
    k_p, c_p, np_p, nr_p = _aggregate_ingest_ghosted_impl(
        jnp.asarray(buf), True, interpret=True
    )
    k_x, c_x, np_x, nr_x = _aggregate_ingest_ghosted_impl(
        jnp.asarray(buf), False
    )
    assert int(np_p) == int(np_x) and int(nr_p) == int(nr_x)
    np.testing.assert_array_equal(np.asarray(k_p), np.asarray(k_x))
    np.testing.assert_array_equal(np.asarray(c_p), np.asarray(c_x))


def test_drain_pallas_matches_xla(monkeypatch):
    """Full drain equivalence: the Pallas run-start path must produce
    bit-identical (keys, counts, n_unique) to the XLA cummax path."""
    monkeypatch.setattr(
        pallas_kernels,
        "run_starts",
        functools.partial(pallas_kernels.run_starts, interpret=True),
    )
    rng = np.random.default_rng(99)
    buf = _sorted_keys_with_runs(TILE, TILE // 4, seed=9,
                                 sentinel_tail=TILE // 5)
    rng.shuffle(buf)  # drains sort internally
    k_p, c_p, n_p = _aggregate_ingest_impl(jnp.asarray(buf), True, 0)
    k_x, c_x, n_x = _aggregate_ingest_impl(jnp.asarray(buf), False, 0)
    assert int(n_p) == int(n_x)
    np.testing.assert_array_equal(np.asarray(k_p), np.asarray(k_x))
    np.testing.assert_array_equal(np.asarray(c_p), np.asarray(c_x))


def test_drain_packed_compaction_matches_kv():
    """The packed single-sort compaction (k <= 21) must be bit-identical
    to the kv-sort compaction, including the n_unique count."""
    rng = np.random.default_rng(3)
    # 42-bit keyspace (k=21) with heavy duplication + sentinel tail
    buf = rng.integers(0, 1 << 42, size=4096, dtype=np.uint64)
    buf = np.concatenate([buf, buf[:1024], buf[:64],
                          np.full(512, (1 << 64) - 1, np.uint64)])
    k_kv, c_kv, n_kv = _aggregate_ingest_impl(jnp.asarray(buf), False, 0)
    k_pk, c_pk, n_pk = _aggregate_ingest_impl(jnp.asarray(buf), False, 22)
    assert int(n_kv) == int(n_pk)
    np.testing.assert_array_equal(np.asarray(k_kv), np.asarray(k_pk))
    np.testing.assert_array_equal(np.asarray(c_kv), np.asarray(c_pk))


def test_merge_aggregate_packed_matches_kv():
    """_aggregate_impl with count_bits set must match the kv formulation
    for benign counts (packed route), for counts exceeding the packed
    field (runtime kv fallback), and for the all-ones key edge case."""
    from sharkmer_tpu.ops.sorted_store import _aggregate_impl

    rng = np.random.default_rng(11)
    kmers = rng.integers(0, 1 << 42, size=2048, dtype=np.uint64)
    kmers = np.concatenate([kmers, kmers[:512],
                            np.full(256, (1 << 64) - 1, np.uint64)])

    for counts in (
        rng.integers(1, 200, size=len(kmers), dtype=np.uint32),  # packed
        rng.integers(1, 1 << 31, size=len(kmers), dtype=np.uint32),  # kv
    ):
        c = counts.copy()
        c[-256:] = 0  # sentinel padding carries zero counts
        ref = _aggregate_impl(jnp.asarray(kmers), jnp.asarray(c), 0)
        got = _aggregate_impl(jnp.asarray(kmers), jnp.asarray(c), 22)
        assert int(ref[2]) == int(got[2])
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))

    # a real key equal to 2^2k-1 must force the kv route and stay exact
    kmers2 = np.array([5, (1 << 42) - 1, (1 << 42) - 1, 9], np.uint64)
    counts2 = np.array([3, 4, 5, 1], np.uint32)
    ref = _aggregate_impl(jnp.asarray(kmers2), jnp.asarray(counts2), 0)
    got = _aggregate_impl(jnp.asarray(kmers2), jnp.asarray(counts2), 22)
    assert int(ref[2]) == int(got[2]) == 3
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))


def test_drain_packed_overflow_falls_back_exactly():
    """A run total that saturates the packed count field must trigger
    the runtime kv fallback and stay exact (poly-A class repeats)."""
    # count_bits=20 -> cap 2^20-1; one key repeated 2^20+5 times
    reps = (1 << 20) + 5
    buf = np.concatenate([
        np.full(reps, 7, np.uint64),
        np.arange(100, 200, dtype=np.uint64),
        np.full(123, (1 << 64) - 1, np.uint64),
    ])
    k_o, c_o, n_o = _aggregate_ingest_impl(jnp.asarray(buf), False, 20)
    assert int(n_o) == 101
    keys = np.asarray(k_o)[:101]
    counts = np.asarray(c_o)[:101]
    assert keys[0] == 7 and counts[0] == reps
    np.testing.assert_array_equal(keys[1:], np.arange(100, 200))
    assert (counts[1:] == 1).all()
