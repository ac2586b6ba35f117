"""Histogram (count-of-counts spectrum) helpers.

The device-side histogram is a clipped bincount over the table's
counts array (see ops/hashtable._histogram_kernel). This module holds
the host-side conveniences mirroring the reference ``Histogram``
invariant accessors (/root/reference/src/kmer/histogram.rs:103-134):

* vector layout: index i (1..histo_max) = number of k-mers observed
  exactly i times; index histo_max+1 = number observed more than
  histo_max times (the folded overflow tail); index 0 always 0.
"""

from __future__ import annotations

import numpy as np


def histogram_from_counts(counts: np.ndarray, histo_max: int) -> np.ndarray:
    """NumPy reference histogram for tests (dual-path cross-check)."""
    counts = np.asarray(counts)
    clipped = np.minimum(counts[counts > 0], histo_max + 1).astype(np.int64)
    return np.bincount(clipped, minlength=histo_max + 2).astype(np.uint64)


def histo_n_unique(histo_vec: np.ndarray) -> int:
    """Total unique k-mers in a folded histogram vector (histogram.rs:119-123).

    Exact only when the overflow bin is empty; with overflow it still
    counts each overflowing k-mer once (the fold preserves uniqueness).
    """
    return int(np.sum(histo_vec[1:]))


def histo_n_kmers_lower_bound(histo_vec: np.ndarray, histo_max: int) -> int:
    """Sum(count * n) treating the overflow bin at its minimum value.

    The reference tracks exact large counts in a sparse side map
    (histogram.rs:14); the folded vector cannot recover them, so run
    invariants that need the exact total (io.rs:1120-1125) are checked
    against the table's counts sum instead.
    """
    v = np.asarray(histo_vec, dtype=np.uint64)
    idx = np.arange(len(v), dtype=np.uint64)
    return int(np.sum(v[1:] * idx[1:]))
