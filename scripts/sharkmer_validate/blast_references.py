"""BLAST recovered amplicons against panel gold references.

Builds a local blastn database from the panel's ``references:`` blocks
and classifies each recovered product: on-target = best hit is the
same gene (same-taxon vs other-taxon distinguished in the score code).
Degrades gracefully when blastn/makeblastdb are not installed
(blast_mode = "none").
"""

from __future__ import annotations

import shutil
import subprocess
import tempfile
from pathlib import Path


def blast_available() -> bool:
    return shutil.which("blastn") is not None and shutil.which("makeblastdb") is not None


def collect_references(panel_data: dict) -> list[dict]:
    """Flatten panel references into records: gene, taxon, accession, seq."""
    out = []
    for ref_gene in panel_data.get("references") or []:
        gene = ref_gene.get("gene")
        for seq_entry in ref_gene.get("sequences", []):
            out.append({
                "gene": gene,
                "taxon": seq_entry.get("taxon"),
                "accession": seq_entry.get("accession"),
                "sequence": seq_entry.get("sequence", "").replace("\n", ""),
            })
    return out


def build_blast_db(references: list[dict], workdir: Path) -> Path | None:
    if not references:
        return None
    fasta = workdir / "references.fasta"
    with open(fasta, "w") as f:
        for i, ref in enumerate(references):
            taxon = (ref["taxon"] or "unknown").replace(" ", "_")
            f.write(f">ref_{i}|{ref['gene']}|{taxon}\n{ref['sequence']}\n")
    db = workdir / "refdb"
    subprocess.run(
        ["makeblastdb", "-in", str(fasta), "-dbtype", "nucl", "-out", str(db)],
        check=True, capture_output=True,
    )
    return db


def blast_sequence(seq: str, db: Path, workdir: Path) -> dict | None:
    """Best blastn hit: {gene, taxon, identity, align_len, bitscore}."""
    query = workdir / "query.fasta"
    query.write_text(f">query\n{seq}\n")
    proc = subprocess.run(
        [
            "blastn", "-query", str(query), "-db", str(db),
            "-outfmt", "6 sseqid pident length bitscore", "-max_target_seqs", "5",
        ],
        capture_output=True, text=True, check=True,
    )
    best = None
    for line in proc.stdout.splitlines():
        sseqid, pident, length, bitscore = line.split("\t")
        _, gene, taxon = sseqid.split("|", 2)
        hit = {
            "gene": gene,
            "taxon": taxon.replace("_", " "),
            "identity": float(pident) / 100.0,
            "align_len": int(length),
            "bitscore": float(bitscore),
        }
        if best is None or hit["bitscore"] > best["bitscore"]:
            best = hit
    return best


def annotate_runs_with_blast(panel_data: dict, sample_results: list) -> str:
    """Annotate each recovered gene with its best BLAST hit in place.

    Returns the blast_mode string recorded in the result file:
    "local" when a database was built and used, "none" otherwise.
    """
    references = collect_references(panel_data)
    if not references or not blast_available():
        return "none"

    with tempfile.TemporaryDirectory(prefix="sharkmer_blast_") as td:
        workdir = Path(td)
        db = build_blast_db(references, workdir)
        if db is None:
            return "none"
        for sample_block, runs in sample_results:
            taxon = sample_block.get("taxon")
            for run in runs:
                for gene_entry in run.get("genes", []):
                    seqs = gene_entry.get("sequences") or []
                    if not seqs:
                        continue
                    hit = blast_sequence(seqs[0], db, workdir)
                    if hit is None:
                        gene_entry["blast"] = {"hit": None}
                        continue
                    base_gene = gene_entry["gene"].split("_", 1)[-1]
                    gene_entry["blast"] = {
                        "hit_gene": hit["gene"],
                        "hit_taxon": hit["taxon"],
                        "identity": round(hit["identity"], 4),
                        "align_len": hit["align_len"],
                        "on_target": hit["gene"] == base_gene,
                        "same_taxon": bool(taxon) and hit["taxon"] == taxon,
                    }
    return "local"
