"""Encoding oracle tests.

Expected values mirror the reference test vectors
(/root/reference/src/kmer/mod.rs:159-278): revcomp round trips,
bit-exact k-mer streams, N splitting, and the dual-path equivalence
check between the device window encoder and the rolling reference
encoder (the reference's own cross-check pattern,
test_kmers_from_ascii_matches_read_pipeline).
"""

import numpy as np
import pytest

from sharkmer_tpu.ops import (
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


def device_kmers(seq: str, k: int) -> list[int]:
    codes = codes_to_batch([ascii_to_codes(seq)])
    kmers, valid = canonical_kmers(codes, k)
    kmers = np.asarray(kmers)[np.asarray(valid)]
    return kmers.tolist()


def test_revcomp_kmer_hardcoded():
    # mod.rs:159-177
    assert revcomp_kmer(0b0010_0110, 3) == 0b0001_1001
    assert revcomp_kmer(revcomp_kmer(0b0010_0110, 3), 3) == 0b0010_0110
    kmer = 0b0110_1100_0011_1001_1010_0110
    assert revcomp_kmer(kmer, 12) == 0b0110_0101_1001_0011_1100_0110
    assert revcomp_kmer(revcomp_kmer(kmer, 12), 12) == kmer


def test_get_kmers_expected_vectors():
    # mod.rs:180-226: CGTAATGCGGCG... k=9 canonical stream
    seq = "CGTAATGCGGCG"
    expected = [
        0b01_1001_0011_1100_0110,
        0b01_0110_0100_1111_0001,
        0b10_0101_1001_0011_1100,
        0b00_0011_1001_1010_0110,
    ]
    assert kmers_from_ascii_ref(seq, 9) == expected
    assert device_kmers(seq, 9) == expected

    # truncations
    assert device_kmers(seq[:11], 9) == expected[:3]
    assert device_kmers(seq[:10], 9) == expected[:2]
    assert device_kmers(seq[:9], 9) == expected[:1]
    assert device_kmers(seq[:8], 9) == []


def test_kmer_to_seq():
    assert kmer_to_seq(0b1001_1000, 4) == "GCGA"
    assert kmer_to_seq(0b1001_1000_1001_1000, 8) == "GCGAGCGA"
    assert seq_to_kmer("GCGA") == 0b1001_1000
    assert kmer_last_base(0b1001_1000) == "A"


def test_count_valid_bases():
    assert count_valid_bases("ACGTACGT") == 8
    assert count_valid_bases("ACNGT") == 4
    assert count_valid_bases("NNN") == 0
    assert count_valid_bases("") == 0


CROSS_CHECK_CASES = [
    "CGTAATGCGGCGA",
    "CGTANATGCGGCGA",
    "NCGTANATGCGGCGA",
    "NCGTANATGCGGCGANN",
    "NNCGTANATGCGGCGA",
    "TANCACN",
    "NTANCACNAGAAAATC",
    "AAAA",
    "ACGTACGTACGT",
]


@pytest.mark.parametrize("k", [3, 5, 9, 11, 21, 31])
def test_device_matches_reference_encoder(k):
    # The dual-path equivalence check (encoding.rs:4-23). Includes a
    # long random case so every bit lane of the u64 is exercised.
    rng = np.random.default_rng(0)
    long_case = "".join(rng.choice(list("ACGTN"), p=[0.24] * 4 + [0.04], size=500))
    for seq in CROSS_CHECK_CASES + [long_case]:
        expected = kmers_from_ascii_ref(seq, k)
        actual = device_kmers(seq, k)
        assert actual == expected, f"k={k} seq={seq[:40]}..."


def test_batch_boundary_isolation():
    # Padding must never leak k-mers across reads in a batch.
    seqs = ["ACGTACGTACGT", "TTTT", "GGGGGGGGGGGGGGGG"]
    codes = codes_to_batch([ascii_to_codes(s) for s in seqs])
    k = 5
    kmers, valid = canonical_kmers(codes, k)
    kmers, valid = np.asarray(kmers), np.asarray(valid)
    for i, s in enumerate(seqs):
        assert kmers[i][valid[i]].tolist() == kmers_from_ascii_ref(s, k)
    # invalid positions carry the sentinel
    assert (kmers[~valid] == np.uint64(KMER_SENTINEL)).all()


def test_invalid_character_rejected():
    with pytest.raises(ValueError, match="Invalid character"):
        ascii_to_codes("ACGX")


def test_k_bounds():
    with pytest.raises(ValueError):
        kmers_from_ascii_ref("ACGT", 0)
    with pytest.raises(ValueError):
        kmers_from_ascii_ref("ACGT", 32)


def test_revcomp_kmers_np_matches_scalar():
    from sharkmer_tpu.ops.encoding import revcomp_kmers_np

    rng = np.random.default_rng(9)
    for k in (3, 11, 21, 31):
        kmers = rng.integers(0, 1 << (2 * k), size=200, dtype=np.uint64)
        got = revcomp_kmers_np(kmers, k)
        expected = np.array(
            [revcomp_kmer(int(x), k) for x in kmers], dtype=np.uint64
        )
        np.testing.assert_array_equal(got, expected)
