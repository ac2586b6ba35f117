"""Offline multi-panel gene-recovery regression.

Stand-in for the reference's network-dependent 13-sample x 6-panel
benchmark grid (/root/reference/benchmarks/run_benchmark.py and
benchmark_results/*.summary.md): a synthetic genome embeds one exact
amplicon per primer pair of several panels — with degenerate (IUPAC)
positions realized to a random concrete base, exercising the expansion
machinery — reads are generated at controlled depth, the FULL CLI runs
with the real panel, and every gene must be recovered with a product
inside its declared [min_length, max_length] window and matching the
embedded amplicon exactly. Fails if ANY gene regresses.
"""

import numpy as np
import pytest
import yaml

from sharkmer_tpu.main import main
from sharkmer_tpu.pcr.panels import get_panel
from sharkmer_tpu.pcr.params import IUPAC

REVCOMP = str.maketrans("ACGT", "TGCA")

PANELS = [
    "angiospermae", "bacteria", "c_elegans", "cnidaria", "human",
    "hydrozoa", "insecta", "metazoa", "teleostei",
]


def _rc(s: str) -> str:
    return s.translate(REVCOMP)[::-1]


def _concrete(primer: str, rng: np.random.Generator) -> str:
    """One concrete realization of a degenerate primer (random choice
    at each IUPAC position so non-canonical expansions are exercised)."""
    return "".join(
        c if c in "ACGT" else rng.choice(list(IUPAC[c])) for c in primer
    )


def _random_seq(n: int, rng: np.random.Generator) -> str:
    return "".join(rng.choice(list("ACGT"), size=n))


def synth_genome_for_panel(panel_name: str, seed: int = 0):
    """Genome embedding one amplicon per (non-deprecated) primer pair.

    Returns (genome, {gene_name: (amplicon, expected_len)}).
    """
    rng = np.random.default_rng(seed)
    params = get_panel(panel_name)
    genome_parts = [_random_seq(400, rng)]
    amplicons = {}
    for p in params:
        fwd = _concrete(p.forward_seq, rng)
        rev = _concrete(p.reverse_seq, rng)
        total = p.expected_length or (p.min_length + p.max_length) // 2
        insert = total - len(fwd) - len(rev)
        assert insert > 0, f"{panel_name}/{p.gene_name}: no room for insert"
        amp = fwd + _random_seq(insert, rng) + _rc(rev)
        amplicons[p.gene_name] = (amp, total)
        genome_parts.append(amp)
        genome_parts.append(_random_seq(400, rng))
    return "".join(genome_parts), amplicons


def tiling_reads(genome: str, read_len: int, step: int) -> list[str]:
    reads = [
        genome[i : i + read_len]
        for i in range(0, len(genome) - read_len + 1, step)
    ]
    # cover the genome tail (the last amplicon's reverse primer)
    reads.append(genome[-read_len:])
    return reads


@pytest.mark.parametrize("panel_name", PANELS)
def test_panel_recovery(panel_name, tmp_path):
    genome, amplicons = synth_genome_for_panel(panel_name, seed=7)
    # ~12x depth: every amplicon position covered well above min_count,
    # on both strands
    fwd_reads = tiling_reads(genome, 150, 25)
    rev_reads = [_rc(r) for r in tiling_reads(genome, 150, 37)]
    path = tmp_path / "reads.fastq"
    with open(path, "w") as f:
        for i, s in enumerate(fwd_reads + rev_reads):
            f.write(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n")

    out = tmp_path / "out"
    rc = main([
        str(path), "-s", "syn", "-k", "19", "-o", str(out),
        "--pcr-panel", panel_name,
    ])
    assert rc == 0
    stats = yaml.safe_load((out / "syn.stats.yaml").read_text())
    failures = []
    for r in stats["pcr_results"]:
        gene = r["gene_name"]
        # gene names carry no panel prefix for --pcr-panel runs
        amp, total = amplicons[gene]
        if r["status"] != "success":
            failures.append(f"{gene}: {r.get('failure_reason')}")
            continue
        fasta = out / f"syn_{gene}.fasta"
        seqs = _fasta_seqs(fasta.read_text())
        params = {p.gene_name: p for p in get_panel(panel_name)}[gene]
        ok = any(
            params.min_length <= len(s) <= params.max_length
            and (s in amp or _rc(s) in amp)
            for s in seqs
        )
        if not ok:
            failures.append(
                f"{gene}: products {[len(s) for s in seqs]} do not match "
                f"embedded {total} bp amplicon"
            )
    assert not failures, f"{panel_name}: {failures}"


def _fasta_seqs(text: str) -> list[str]:
    seqs, cur = [], []
    for line in text.splitlines():
        if line.startswith(">"):
            if cur:
                seqs.append("".join(cur))
                cur = []
        else:
            cur.append(line.strip())
    if cur:
        seqs.append("".join(cur))
    return seqs


def test_recovery_survives_lower_depth(tmp_path):
    """Depth robustness: ~6x tiling still recovers every cnidaria gene
    (the reference's depth-sweep analog at the shallow end)."""
    genome, amplicons = synth_genome_for_panel("cnidaria", seed=11)
    reads = tiling_reads(genome, 150, 50) + [
        _rc(r) for r in tiling_reads(genome, 150, 49)
    ]
    path = tmp_path / "reads.fastq"
    with open(path, "w") as f:
        for i, s in enumerate(reads):
            f.write(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n")
    out = tmp_path / "out"
    rc = main([
        str(path), "-s", "lo", "-k", "19", "-o", str(out),
        "--pcr-panel", "cnidaria",
    ])
    assert rc == 0
    stats = yaml.safe_load((out / "lo.stats.yaml").read_text())
    statuses = {r["gene_name"]: r["status"] for r in stats["pcr_results"]}
    assert all(v == "success" for v in statuses.values()), statuses
