"""Primer binding-site degeneracy analysis.

Compares observed amplicon ends against the IUPAC-coded primer
sequences to report which degenerate positions were actually used —
the same capability as the reference's primer_analysis module.
"""

from __future__ import annotations

from . import runner

IUPAC_SETS = {
    "A": frozenset("A"), "C": frozenset("C"), "G": frozenset("G"),
    "T": frozenset("T"),
    "R": frozenset("AG"), "Y": frozenset("CT"), "M": frozenset("AC"),
    "K": frozenset("GT"), "S": frozenset("CG"), "W": frozenset("AT"),
    "B": frozenset("CGT"), "D": frozenset("AGT"), "H": frozenset("ACT"),
    "V": frozenset("ACG"), "N": frozenset("ACGT"),
}
_SET_TO_IUPAC = {v: k for k, v in IUPAC_SETS.items()}
_COMPLEMENT = str.maketrans(
    "ACGTRYMKSWBDHVNacgtrymkswbdhvn", "TGCAYRKMSWVHDBNtgcayrkmswvhdbn"
)
DEFAULT_TRIM = 15


def revcomp(seq: str) -> str:
    return seq.translate(_COMPLEMENT)[::-1]


def iupac_from_set(bases: frozenset) -> str:
    return _SET_TO_IUPAC.get(frozenset(bases), "N")


def _best_sequence_for_gene(runs: list, gene: str) -> str | None:
    for run in runs:
        if not run.get("success"):
            continue
        for prod in run.get("genes", []):
            if prod["gene"] == gene and prod.get("sequences"):
                return prod["sequences"][0]
    return None


def analyze_gene(primer: dict, observed_starts: list[str],
                 observed_ends: list[str], trim: int) -> dict:
    """Position-by-position degeneracy utilisation for one primer pair."""
    fwd = primer.get("forward_seq", "")[-trim:]
    rev = primer.get("reverse_seq", "")[-trim:]

    def per_position(primer_seq: str, observed: list[str]) -> list[dict]:
        rows = []
        for i, code in enumerate(primer_seq):
            allowed = IUPAC_SETS.get(code, frozenset())
            seen = frozenset(
                o[i] for o in observed if len(o) > i and o[i] in "ACGT"
            )
            rows.append({
                "position": i,
                "primer_code": code,
                "allowed": "".join(sorted(allowed)),
                "observed": "".join(sorted(seen)),
                "observed_code": iupac_from_set(seen) if seen else "-",
                "degenerate": len(allowed) > 1,
                "utilised": len(seen & allowed) if allowed else 0,
            })
        return rows

    # the amplicon starts with the (sense) trimmed forward primer region
    # and ends with the reverse complement of the trimmed reverse primer
    rev_observed = [revcomp(e)[-len(rev):] for e in observed_ends]
    return {
        "forward": per_position(fwd, [s[: len(fwd)] for s in observed_starts]),
        "reverse": per_position(rev, rev_observed),
    }


def analyze_primer_bindings(panel_data: dict, sample_results: list,
                            considered_genes: list) -> list:
    """Per-gene degeneracy analysis across all samples."""
    primers = {
        runner.derive_gene_name(p): p for p in panel_data.get("primers", [])
    }
    prefix = panel_data.get("gene_prefix") or panel_data.get("name", "")
    analyses = []
    for gene in considered_genes:
        base = gene[len(prefix) + 1:] if gene.startswith(f"{prefix}_") else gene
        primer = primers.get(base) or primers.get(gene)
        if primer is None:
            continue
        trim = min(int(primer.get("trim", DEFAULT_TRIM)), runner.K)
        starts, ends = [], []
        for _sample_block, runs in sample_results:
            seq = _best_sequence_for_gene(runs, gene)
            if seq:
                starts.append(seq[:trim])
                ends.append(seq[-trim:])
        if not starts:
            continue
        analysis = analyze_gene(primer, starts, ends, trim)
        analysis["gene"] = gene
        analysis["n_sequences"] = len(starts)
        analyses.append(analysis)
    return analyses
