#!/usr/bin/env python3
"""Validate a primer panel against its declared validation samples.

For each `validation.samples` accession x depth in the panel YAML, runs
the pipeline (streaming the reads from ENA, cached), then BLASTs the
recovered amplicons against the panel's gold `references:` (when
blastn is installed) and writes a markdown report plus a YAML result
file in the shared validation/benchmark format.

Usage:
  python scripts/validate_panel.py sharkmer_tpu/panels/cnidaria.yaml
  python scripts/validate_panel.py PANEL --genes 18S,CO1 --max-reads 1000000
  python scripts/validate_panel.py PANEL --label sweep_k_21 --extra-args "-k 21"
"""

from __future__ import annotations

import argparse
import shlex
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from sharkmer_validate import blast_references, primer_analysis, report, results, runner  # noqa: E402


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("panel", help="panel YAML path")
    parser.add_argument("--genes", help="comma-separated gene filter")
    parser.add_argument("--max-reads", type=int, action="append",
                        help="depth override (repeatable)")
    parser.add_argument("--accession", action="append",
                        help="sample filter (repeatable)")
    parser.add_argument("--out-dir", type=Path, default=None)
    parser.add_argument("--label", help="sweep label recorded in the result")
    parser.add_argument("--extra-args", default="",
                        help="extra CLI args forwarded to sharkmer")
    parser.add_argument("--keep-outputs", action="store_true")
    args = parser.parse_args(argv)

    panel_path = Path(args.panel)
    panel_data = runner.load_panel(panel_path)
    validation = panel_data.get("validation") or {}
    samples = validation.get("samples") or []
    if args.accession:
        samples = [s for s in samples if s["accession"] in args.accession]
    if not samples:
        print("Panel declares no validation samples.", file=sys.stderr)
        return 1

    extra = shlex.split(args.extra_args) if args.extra_args else []
    gene_filter = set(args.genes.split(",")) if args.genes else None

    sample_results = []
    workdir_ctx = tempfile.TemporaryDirectory(prefix="sharkmer_validate_")
    workdir = Path(args.out_dir) if args.keep_outputs and args.out_dir else Path(workdir_ctx.name)
    for sample in samples:
        depths = args.max_reads or sample.get("max_reads") or runner.DEFAULT_MAX_READS
        runs = []
        for max_reads in depths:
            outdir = workdir / sample["accession"] / str(max_reads)
            print(f"== {sample['accession']} @ {max_reads:,} reads", flush=True)
            run = runner.run_sharkmer(
                panel_path, sample["accession"], max_reads, outdir,
                extra_args=extra,
            )
            if gene_filter:
                run["genes"] = [
                    g for g in run["genes"]
                    if g["gene"].split("_", 1)[-1] in gene_filter
                ]
            runs.append(run)
        sample_results.append((sample, runs))

    blast_mode = blast_references.annotate_runs_with_blast(
        panel_data, sample_results
    )
    if blast_mode == "none":
        print("BLAST unavailable or no references; skipping identity checks.")

    result = results.build_result(
        panel_path, panel_data, sample_results,
        runner.get_sharkmer_version(), blast_mode=blast_mode,
        machine_info=runner.get_machine_info(), extra_args=extra,
        sweep_label=args.label,
    )
    out_dir = args.out_dir or results.RESULTS_DIR
    result_path = results.write_result(result, out_dir)
    report_path = result_path.with_suffix(".md")
    report.write_report(result, panel_data, report_path)
    print(f"Result:  {result_path}")
    print(f"Report:  {report_path}")

    analyses = primer_analysis.analyze_primer_bindings(
        panel_data, sample_results,
        sorted({g["gene"] for _, runs in sample_results
                for r in runs for g in r["genes"]
                if g.get("status") == "success"}),
    )
    for a in analyses:
        print(f"primer degeneracy utilisation: {a['gene']} "
              f"({a['n_sequences']} sequences)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
