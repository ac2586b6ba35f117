#!/usr/bin/env python3
"""Regression benchmark driver.

Runs the panel x sample x depth matrix declared in benchmark.yaml and
writes per-panel result YAMLs plus a combined summary markdown,
mirroring the reference's benchmarks/run_benchmark.py outputs
(benchmark_results/{panel}_{pv}_{sv}_{stamp}.yaml + summary.md).

Usage:
  python benchmarks/run_benchmark.py                # full matrix
  python benchmarks/run_benchmark.py --panel cnidaria --max-reads 1000000
"""

from __future__ import annotations

import argparse
import sys
from datetime import datetime
from pathlib import Path

import yaml

SCRIPTS = Path(__file__).resolve().parent.parent / "scripts"
sys.path.insert(0, str(SCRIPTS))
# the synthetic-workload generator imports sharkmer_tpu directly
sys.path.insert(0, str(SCRIPTS.parent))

from sharkmer_validate import report, results, runner  # noqa: E402

BENCH_DIR = Path(__file__).resolve().parent
RESULTS_DIR = BENCH_DIR / "benchmark_results"


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=Path,
                        default=BENCH_DIR / "benchmark.yaml")
    parser.add_argument("--panel", action="append",
                        help="panel filter (repeatable)")
    parser.add_argument("--accession", action="append")
    parser.add_argument("--max-reads", type=int, action="append")
    parser.add_argument("--out-dir", type=Path, default=RESULTS_DIR)
    args = parser.parse_args(argv)

    with open(args.config) as f:
        config = yaml.safe_load(f)
    defaults = config.get("defaults", {})
    depth_default = defaults.get("max_reads", runner.DEFAULT_MAX_READS)

    version = runner.get_sharkmer_version()
    machine = runner.get_machine_info()
    summaries = []

    for bench in config.get("benchmarks", []):
        panel_name = bench["panel"]
        if args.panel and panel_name not in args.panel:
            continue
        panel_path = runner.PANELS_DIR / f"{panel_name}.yaml"
        panel_data = runner.load_panel(panel_path)

        sample_results = []
        for sample in bench.get("samples", []):
            if args.accession and sample["accession"] not in args.accession:
                continue
            depths = args.max_reads or depth_default
            fastq = None
            synth = sample.get("synthetic")
            if synth:
                # offline grid: one synthetic FASTQ per (panel, sample)
                # at the deepest depth; shallower cells reuse it via -m
                from sharkmer_validate.synth import synthesize_panel_fastq

                fastq = BENCH_DIR / "work" / "synth" / (
                    f"{panel_name}_{sample['accession']}_"
                    f"{max(depths)}.fastq.gz"
                )
                print(f"== synthesizing {fastq.name}", flush=True)
                synthesize_panel_fastq(
                    panel_path, fastq, max(depths),
                    read_len=synth.get("read_len", 150),
                    genome_mbp=synth.get("genome_mbp", 20.0),
                    error_rate=synth.get("error_rate", 0.01),
                    seed=synth.get("seed", 0),
                )
            runs = []
            for max_reads in depths:
                outdir = (
                    BENCH_DIR / "work" / panel_name / sample["accession"]
                    / str(max_reads)
                )
                print(f"== {panel_name} {sample['accession']} @ "
                      f"{max_reads:,}", flush=True)
                runs.append(
                    runner.run_sharkmer(panel_path, sample["accession"],
                                        max_reads, outdir,
                                        fastq_path=fastq)
                )
            sample_results.append((sample, runs))

        if not sample_results:
            continue
        result = results.build_result(
            panel_path, panel_data, sample_results, version,
            machine_info=machine,
        )
        path = results.write_result(result, args.out_dir)
        report.write_report(result, panel_data, path.with_suffix(".md"))
        summaries.append((panel_name, result))
        print(f"-> {path}")

    if summaries:
        stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
        combined = args.out_dir / f"benchmark_{version}_{stamp}.summary.md"
        with open(combined, "w") as f:
            f.write(f"# sharkmer-tpu benchmark {version}\n\n")
            for panel_name, result in summaries:
                panel_path = runner.PANELS_DIR / f"{panel_name}.yaml"
                f.write(report.generate_report(
                    result, runner.load_panel(panel_path)))
                f.write("\n")
        print(f"-> {combined}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
