#!/usr/bin/env python3
"""Aggregate knob-sweep result files into winner tables.

Consumes the shared validation/benchmark result YAML format. Results
are grouped by sweep_label (e.g. ``sweep_k_21``) / extra_args, and the
table reports genes recovered + total wall time per knob value, the
same decision surface the reference's sweep_summary.py produces for
its tuning sweeps (k, max-primer-kmers, high-coverage-ratio,
tip-coverage-fraction).

Usage:
  python scripts/sweep_summary.py panels/validation_results/*.yaml
"""

from __future__ import annotations

import argparse
import sys
from collections import defaultdict
from pathlib import Path

import yaml


def summarize_result(result: dict) -> dict:
    genes_recovered = 0
    genes_total = 0
    wall = 0.0
    for sample in result.get("samples", []):
        for depth in sample.get("depths", []):
            wall += depth.get("wall_time_seconds") or 0.0
            for gene in depth.get("genes", []):
                genes_total += 1
                if gene.get("status") == "success":
                    genes_recovered += 1
    return {
        "panel": result.get("panel"),
        "label": result.get("sweep_label") or "default",
        "extra_args": " ".join(
            result.get("parameters", {}).get("extra_args", [])
        ),
        "genes_recovered": genes_recovered,
        "genes_total": genes_total,
        "wall_time_seconds": round(wall, 1),
    }


def build_tables(summaries: list[dict]) -> str:
    by_label: dict[str, list[dict]] = defaultdict(list)
    for s in summaries:
        by_label[s["label"]].append(s)

    lines = ["# Sweep summary", ""]
    lines.append("| label | args | panels | genes recovered | total wall (s) |")
    lines.append("|---|---|---|---|---|")
    rows = []
    for label, group in sorted(by_label.items()):
        recovered = sum(g["genes_recovered"] for g in group)
        total = sum(g["genes_total"] for g in group)
        wall = sum(g["wall_time_seconds"] for g in group)
        args = group[0]["extra_args"]
        rows.append((label, args, len(group), recovered, total, wall))
    for label, args, n, recovered, total, wall in rows:
        lines.append(
            f"| {label} | `{args}` | {n} | {recovered}/{total} | {wall:.0f} |"
        )
    if rows:
        winner = max(rows, key=lambda r: (r[3], -r[5]))
        lines += ["", f"**Winner:** `{winner[0]}` — {winner[3]}/{winner[4]} "
                      f"genes in {winner[5]:.0f}s"]
    return "\n".join(lines) + "\n"


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("results", nargs="+", help="result YAML files")
    parser.add_argument("-o", "--output", type=Path,
                        help="write markdown here (default: stdout)")
    args = parser.parse_args(argv)

    summaries = []
    for path in args.results:
        with open(path) as f:
            summaries.append(summarize_result(yaml.safe_load(f)))
    table = build_tables(summaries)
    if args.output:
        args.output.write_text(table)
        print(f"-> {args.output}")
    else:
        print(table)
    return 0


if __name__ == "__main__":
    sys.exit(main())
