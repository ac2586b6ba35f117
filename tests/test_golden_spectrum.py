"""Golden spectrum regression — the pinned-numbers oracle.

The reference pins a jellyfish-verified histogram as hard-coded golden
values in its integration suite (/root/reference/tests/spcr_18s.rs:367-432)
and treats bit-identical `diff` vs `jellyfish count -C` as the external
parity oracle (/root/reference/scripts/compare_jellyfish.sh:108-121).
Jellyfish is not installable in this environment (no network), so the
stand-in is: a fully deterministic synthetic FASTQ (seeded generators
committed here), spot values computed ONCE with the independent pure-
python reference encoder (kmers_from_ascii_ref) and HARD-CODED below.

The values below are frozen. If this test fails, the counting semantics
changed — do not regenerate the numbers without understanding why.
Running scripts/compare_jellyfish.sh on any FASTQ remains the external
check where jellyfish is available.
"""

import numpy as np
import yaml

from sharkmer_tpu.main import main

from util import random_genome, reads_from_genome, write_fastq

K = 21
HISTO_MAX = 100

# -- pinned golden values (python-model verified, 2026-08-19) -------------
GOLDEN_N_KMERS = 384_003
GOLDEN_N_UNIQUE = 38_956
GOLDEN_SPOTS = {
    1: 10_151,  # singletons
    2: 3,
    5: 196,
    10: 2_737,
    16: 2_061,
}
GOLDEN_MAX_BIN = 28  # highest occupied count bin
GOLDEN_TAIL = 0  # overflow bucket (histo_max + 1)


def golden_reads() -> list[str]:
    """The frozen dataset: 30kb genome (0.2% N), 4000 reads of 120bp,
    odd reads reverse-complemented, every 5th read carries one point
    mutation (a singleton k-mer tail). All RNG seeds pinned."""
    genome = random_genome(30000, seed=12345, n_rate=0.002)
    reads = reads_from_genome(genome, 4000, read_len=120, seed=54321)
    rng = np.random.default_rng(99)
    comp = str.maketrans("ACGT", "TGCA")
    out = []
    for i, r in enumerate(reads):
        if i % 2 == 1:
            r = r.translate(comp)[::-1]
        if i % 5 == 0:
            pos = int(rng.integers(0, len(r)))
            r = r[:pos] + "ACGT"[int(rng.integers(0, 4))] + r[pos + 1 :]
        out.append(r)
    return out


def test_golden_spectrum(tmp_path):
    path = tmp_path / "golden.fastq.gz"
    write_fastq(path, golden_reads(), gzipped=True)
    out = tmp_path / "out"
    rc = main([
        str(path), "-s", "gold", "-k", str(K), "--chunks", "1",
        "--histo-max", str(HISTO_MAX), "-o", str(out),
    ])
    assert rc == 0

    rows = (out / "gold.final.histo").read_text().splitlines()[2:]
    vec = np.zeros(HISTO_MAX + 2, np.uint64)
    for row in rows:
        count, freq = row.split("\t")
        vec[int(count)] = int(freq)

    for bin_, expect in GOLDEN_SPOTS.items():
        assert vec[bin_] == expect, f"bin {bin_}: {vec[bin_]} != {expect}"
    assert int(vec[1:].sum()) == GOLDEN_N_UNIQUE
    assert vec[HISTO_MAX + 1] == GOLDEN_TAIL
    occupied = np.nonzero(vec)[0]
    assert occupied.max() == GOLDEN_MAX_BIN
    # weighted total equals every k-mer event ingested
    assert int((np.arange(len(vec)) * vec).sum()) == GOLDEN_N_KMERS

    stats = yaml.safe_load((out / "gold.stats.yaml").read_text())
    assert stats["n_kmers"] == GOLDEN_N_KMERS
    assert stats["n_singleton_kmers"] == GOLDEN_SPOTS[1]
    # reference semantics (main.rs:193): multi = k-mer EVENTS - singletons
    assert (
        stats["n_multi_kmers"] == GOLDEN_N_KMERS - GOLDEN_SPOTS[1]
    )
