#!/usr/bin/env python3
"""Bootstrap panel ``references:`` blocks from actual pipeline runs.

The second of the two reference-bootstrapping tools (the counterpart of
bootstrap_references.py, which queries NCBI directly): run each panel's
declared validation samples at their highest depth, keep the best
amplicon per (gene, sample), optionally BLAST each against NCBI nt with
a genus restriction, and emit a TSV for review plus a YAML fragment of
candidate reference sequences. Same capability as the reference's
scripts/bootstrap_from_runs.py (416 LoC), independently implemented on
this repo's runner module.

Network-dependent (ENA reads + NCBI BLAST) and therefore not exercised
in CI; the pure parsing/collection helpers are unit-tested offline.

Usage:
  python scripts/bootstrap_from_runs.py sharkmer_tpu/panels/cnidaria.yaml
  python scripts/bootstrap_from_runs.py --all --reuse-runs --no-blast
"""

from __future__ import annotations

import argparse
import re
import sys
import time
import urllib.parse
import urllib.request
import xml.etree.ElementTree as ET
from datetime import datetime
from pathlib import Path

import yaml

sys.path.insert(0, str(Path(__file__).resolve().parent))

from sharkmer_validate import runner  # noqa: E402

RUNS_DIR = runner.REPO_ROOT / "benchmarks" / "bootstrap_runs"
OUT_DIR = runner.REPO_ROOT / "benchmarks" / "bootstrap"

BLAST_URL = "https://blast.ncbi.nlm.nih.gov/blast/Blast.cgi"
POLL_INTERVAL = 30
MAX_WAIT = 900  # per BLAST job


# -- NCBI web BLAST (taxon-restricted) ----------------------------------------

def _post(params: dict) -> str:
    data = urllib.parse.urlencode(params).encode()
    req = urllib.request.Request(
        BLAST_URL, data=data, headers={"User-Agent": "sharkmer-tpu-bootstrap"}
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.read().decode()


def _get(params: dict) -> str:
    url = f"{BLAST_URL}?{urllib.parse.urlencode(params)}"
    req = urllib.request.Request(
        url, headers={"User-Agent": "sharkmer-tpu-bootstrap"}
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.read().decode()


def submit_blast(sequence: str, taxon: str = "") -> str | None:
    params = {
        "CMD": "Put", "PROGRAM": "blastn", "DATABASE": "nt",
        "QUERY": sequence, "FORMAT_TYPE": "XML", "HITLIST_SIZE": "5",
        "EXPECT": "1e-10", "TOOL": "sharkmer-tpu-bootstrap",
    }
    if taxon:
        genus = taxon.split()[0]
        params["ENTREZ_QUERY"] = f'"{genus}"[Organism]'
    try:
        text = _post(params)
    except Exception as e:  # noqa: BLE001 — network tool, report and move on
        print(f"    submit failed: {e}")
        return None
    m = re.search(r"RID = (\S+)", text)
    return m.group(1) if m else None


def poll_blast(rid: str) -> str | None:
    """Wait for the job; return the XML result text or None."""
    waited = 0
    while waited < MAX_WAIT:
        time.sleep(POLL_INTERVAL)
        waited += POLL_INTERVAL
        try:
            status = _get(
                {"CMD": "Get", "FORMAT_OBJECT": "SearchInfo", "RID": rid}
            )
        except Exception:  # noqa: BLE001
            continue
        if "Status=READY" in status:
            return _get({"CMD": "Get", "FORMAT_TYPE": "XML", "RID": rid})
        if "Status=FAILED" in status:
            return None
    return None


def top_hit(xml_text: str) -> dict | None:
    """Best hit summary from BLAST XML (accession, identity, length)."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return None
    hit = root.find(".//Hit")
    if hit is None:
        return None
    hsp = hit.find(".//Hsp")
    if hsp is None:
        return None
    identity = int(hsp.findtext("Hsp_identity", "0"))
    align_len = max(1, int(hsp.findtext("Hsp_align-len", "1")))
    return {
        "accession": hit.findtext("Hit_accession", ""),
        "description": hit.findtext("Hit_def", ""),
        "pct_identity": round(100.0 * identity / align_len, 1),
        "align_length": align_len,
    }


# -- amplicon collection --------------------------------------------------------

def best_amplicons(runs: list[dict], panel_name: str) -> list[dict]:
    """Best (top-ranked) product per (gene, sample) across run records.

    Run records are the dicts runner.run_sharkmer returns; for each
    sample only the deepest successful run contributes (callers pass
    runs ordered deepest-first per sample).
    """
    out: list[dict] = []
    seen: set[tuple[str, str]] = set()
    for run in runs:
        if not run.get("success"):
            continue
        for gene_entry in run.get("genes", []):
            gene = gene_entry["gene"]
            prefix = f"{panel_name}_"
            if gene.startswith(prefix):
                gene = gene[len(prefix):]
            key = (gene, run["accession"])
            if key in seen:
                continue
            seqs = gene_entry.get("sequences") or []
            if gene_entry.get("status") != "success" or not seqs:
                continue
            seen.add(key)
            out.append({
                "gene": gene,
                "taxon": run.get("taxon", ""),
                "accession": run["accession"],
                "max_reads": run["max_reads"],
                "sequence": seqs[0],
                "length": len(seqs[0]),
            })
    return out


def reuse_runs(panel_data: dict, panel_name: str, run_dir: Path) -> list[dict]:
    """Rebuild run records from an existing run directory's outputs."""
    records: list[dict] = []
    for sample in (panel_data.get("validation") or {}).get("samples", []):
        accession = sample["accession"]
        for max_reads in sorted(sample.get("max_reads", []), reverse=True):
            stats_path = run_dir / f"{accession}_{max_reads}.stats.yaml"
            if not stats_path.exists():
                continue
            with open(stats_path) as f:
                stats = yaml.safe_load(f)
            genes = []
            for r in stats.get("pcr_results", []):
                entry = {
                    "gene": r["gene_name"],
                    "status": r["status"],
                    "sequences": [],
                }
                fasta = run_dir / f"{accession}_{max_reads}_{r['gene_name']}.fasta"
                if r["status"] == "success" and fasta.exists():
                    entry["sequences"] = runner.read_fasta_sequences(str(fasta))
                genes.append(entry)
            records.append({
                "accession": accession,
                "taxon": sample.get("taxon", ""),
                "max_reads": max_reads,
                "success": True,
                "genes": genes,
            })
            break  # deepest available run wins for this sample
    return records


# -- outputs --------------------------------------------------------------------

def write_outputs(panel_name: str, amplicons: list[dict], out_dir: Path):
    out_dir.mkdir(parents=True, exist_ok=True)
    stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    tsv = out_dir / f"{panel_name}_{stamp}.tsv"
    with open(tsv, "w") as f:
        f.write(
            "panel\tgene\ttaxon\tsample_accession\tlength\t"
            "blast_accession\tblast_identity\tblast_description\n"
        )
        for a in amplicons:
            hit = a.get("blast") or {}
            f.write(
                f"{panel_name}\t{a['gene']}\t{a['taxon']}\t{a['accession']}\t"
                f"{a['length']}\t{hit.get('accession', '---')}\t"
                f"{hit.get('pct_identity', '---')}\t"
                f"{hit.get('description', '---')}\n"
            )
    yml = out_dir / f"{panel_name}_{stamp}.yaml"
    with open(yml, "w") as f:
        yaml.dump(
            {
                "panel": panel_name,
                "date": datetime.now().strftime("%Y-%m-%d"),
                "amplicons": amplicons,
            },
            f, default_flow_style=False, sort_keys=False, width=4096,
        )
    print(f"wrote {tsv}\nwrote {yml}")


# -- driver -----------------------------------------------------------------------

def process_panel(panel_path: Path, reuse: bool, skip_blast: bool) -> None:
    panel_data = runner.load_panel(panel_path)
    panel_name = panel_data.get("name", panel_path.stem)
    samples = (panel_data.get("validation") or {}).get("samples", [])
    if not samples:
        print(f"{panel_name}: no validation samples, skipping")
        return
    print(f"== {panel_name} ({len(samples)} samples) ==")

    records: list[dict] = []
    run_dir = RUNS_DIR / panel_name
    if reuse and run_dir.is_dir():
        records = reuse_runs(panel_data, panel_name, run_dir)
    if not records:
        for sample in samples:
            accession = sample["accession"]
            max_reads = max(sample.get("max_reads", [1_000_000]))
            print(f"  running {accession} @ {max_reads // 1000}k reads...")
            rec = runner.run_sharkmer(
                panel_path, accession, max_reads, run_dir
            )
            rec["taxon"] = sample.get("taxon", "")
            records.append(rec)

    amplicons = best_amplicons(records, panel_name)
    print(f"  {len(amplicons)} amplicons collected")

    if not skip_blast:
        for i, a in enumerate(amplicons, 1):
            print(
                f"  [{i}/{len(amplicons)}] BLAST {a['gene']} "
                f"({a['taxon']}, {a['length']} bp)..."
            )
            rid = submit_blast(a["sequence"], a["taxon"])
            xml = poll_blast(rid) if rid else None
            a["blast"] = top_hit(xml) if xml else None

    if amplicons:
        write_outputs(panel_name, amplicons, OUT_DIR)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("panels", nargs="*", help="panel YAML files")
    ap.add_argument("--all", action="store_true",
                    help="every built-in panel with validation samples")
    ap.add_argument("--reuse-runs", action="store_true",
                    help="reuse existing run outputs instead of re-running")
    ap.add_argument("--no-blast", action="store_true",
                    help="collect amplicons only, skip NCBI BLAST")
    args = ap.parse_args(argv)

    if args.all:
        paths = sorted(runner.PANELS_DIR.glob("*.yaml"))
    elif args.panels:
        paths = [Path(p).resolve() for p in args.panels]
    else:
        ap.print_help()
        return 1
    for p in paths:
        if not p.exists():
            print(f"not found: {p}")
            continue
        process_panel(p, reuse=args.reuse_runs, skip_blast=args.no_blast)
    return 0


if __name__ == "__main__":
    sys.exit(main())
