#!/usr/bin/env python3
"""Populate a panel's ``references:`` block from NCBI.

For each (gene, taxon) requested, queries NCBI E-utilities for a
nucleotide record matching the gene name and taxon, and emits a
references YAML fragment ready to paste into the panel. The same
capability as the reference's scripts/bootstrap_references.py,
network-dependent and therefore not exercised in CI.

Usage:
  python scripts/bootstrap_references.py --gene 18S --taxon "Xenia sp." \
      --gene CO1 --taxon "Xenia sp."
"""

from __future__ import annotations

import argparse
import sys
import time
import urllib.parse
import urllib.request
import xml.etree.ElementTree as ET

import yaml

EUTILS = "https://eutils.ncbi.nlm.nih.gov/entrez/eutils"
GENE_SYNONYMS = {
    "18S": "18S ribosomal RNA",
    "28S": "28S ribosomal RNA",
    "16S": "16S ribosomal RNA",
    "12S": "12S ribosomal RNA",
    "CO1": "cytochrome c oxidase subunit I",
    "CytB": "cytochrome b",
    "ITS": "internal transcribed spacer",
}


def _get(url: str) -> bytes:
    req = urllib.request.Request(url, headers={"User-Agent": "sharkmer-tpu"})
    with urllib.request.urlopen(req, timeout=30) as resp:
        return resp.read()


def esearch(gene: str, taxon: str, retmax: int = 3) -> list[str]:
    term = (
        f'"{GENE_SYNONYMS.get(gene, gene)}"[Title] AND '
        f'"{taxon}"[Organism] AND 200:50000[SLEN]'
    )
    url = (
        f"{EUTILS}/esearch.fcgi?db=nucleotide&retmax={retmax}&term="
        + urllib.parse.quote(term)
    )
    root = ET.fromstring(_get(url))
    return [e.text for e in root.findall(".//Id")]


def efetch_fasta(uid: str) -> tuple[str, str]:
    url = f"{EUTILS}/efetch.fcgi?db=nucleotide&id={uid}&rettype=fasta&retmode=text"
    text = _get(url).decode()
    lines = text.strip().splitlines()
    header = lines[0][1:]
    accession = header.split()[0]
    return accession, "".join(lines[1:])


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--gene", action="append", required=True)
    parser.add_argument("--taxon", action="append", required=True)
    parser.add_argument("--delay", type=float, default=0.4,
                        help="seconds between NCBI requests")
    args = parser.parse_args(argv)
    if len(args.gene) != len(args.taxon):
        parser.error("--gene and --taxon must be given in pairs")

    by_gene: dict[str, list[dict]] = {}
    for gene, taxon in zip(args.gene, args.taxon):
        print(f"searching {gene} for {taxon}...", file=sys.stderr)
        uids = esearch(gene, taxon)
        if not uids:
            print(f"  no hits for {gene} / {taxon}", file=sys.stderr)
            continue
        time.sleep(args.delay)
        accession, seq = efetch_fasta(uids[0])
        time.sleep(args.delay)
        by_gene.setdefault(gene, []).append({
            "taxon": taxon,
            "accession": accession,
            "sequence": seq,
        })

    references = [
        {"gene": gene, "sequences": seqs} for gene, seqs in by_gene.items()
    ]
    yaml.safe_dump({"references": references}, sys.stdout, sort_keys=False,
                   width=80)
    return 0


if __name__ == "__main__":
    sys.exit(main())
