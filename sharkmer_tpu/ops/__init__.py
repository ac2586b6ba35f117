"""Device-side compute ops: encoding, hash/count table, histograms, medians."""

from .encoding import (  # noqa: F401
    BASE_A,
    BASE_C,
    BASE_G,
    BASE_T,
    CODE_N,
    CODE_PAD,
    KMER_SENTINEL,
    ascii_to_codes,
    canonical_kmers,
    codes_to_batch,
    count_valid_bases,
    kmer_last_base,
    kmer_to_seq,
    kmers_from_ascii_ref,
    revcomp_kmer,
    seq_to_kmer,
)
from .hashtable import KmerTable  # noqa: F401
from .histogram import histogram_from_counts  # noqa: F401
