#!/usr/bin/env python3
"""Per-chunk GenomeScope2 runs + movie from an incremental .histo.

Equivalent of the reference's sharkmer_viewer/genomescopemovie.sh: the
multi-column ``{sample}.histo`` that sharkmer writes with --chunks N
holds one k-mer spectrum per cumulative chunk; this tool splits it into
per-chunk 2-column histo files, runs GenomeScope2 on each, aggregates
the per-chunk model fits (genome size, heterozygosity, coverage) into a
single TSV, and stitches the per-chunk plots into an MP4 with ffmpeg.

GenomeScope2 and ffmpeg are external tools (conda-installable); each
stage degrades gracefully when its tool is absent, so the split and
TSV stages remain usable everywhere. The pure-python split/parse
helpers are unit-tested offline.

Usage:
  python scripts/genomescope_movie.py -i sample.histo -o gs_out -k 21 [-t 8]
"""

from __future__ import annotations

import argparse
import re
import shutil
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path


def split_chunks(histo_path: Path, out_dir: Path) -> list[Path]:
    """Split the multi-column .histo into per-chunk 2-col histo files.

    Data rows are ``count<TAB>chunk_1<TAB>...<TAB>chunk_N``; header and
    comment lines are skipped (same layout the reference tool consumes).
    """
    rows = []
    for line in histo_path.read_text().splitlines():
        if line and line[0].isdigit():
            rows.append(line.split("\t"))
    if not rows:
        raise ValueError(f"no data rows in {histo_path}")
    n_chunks = len(rows[0]) - 1
    out_dir.mkdir(parents=True, exist_ok=True)
    paths = []
    for c in range(n_chunks):
        p = out_dir / f"chunk_{c + 1:04d}.histo"
        with open(p, "w") as f:
            for row in rows:
                f.write(f"{row[0]}\t{row[c + 1]}\n")
        paths.append(p)
    return paths


def parse_summary(summary_path: Path) -> dict:
    """Pull the headline model fits out of a GenomeScope2 summary.txt."""
    out: dict[str, str] = {}
    text = summary_path.read_text()
    for label, key in [
        ("Genome Haploid Length", "genome_haploid_length"),
        ("Genome Unique Length", "genome_unique_length"),
        ("Heterozygosity", "heterozygosity"),
        ("Model Fit", "model_fit"),
        ("Read Error Rate", "read_error_rate"),
    ]:
        m = re.search(rf"^{label}\s{{2,}}(\S[^\n]*?)\s{{2,}}(\S[^\n]*)$",
                      text, re.MULTILINE)
        if m:
            out[f"{key}_min"] = m.group(1).strip()
            out[f"{key}_max"] = m.group(2).strip()
    m = re.search(r"^kmer coverage\s+(\S+)", text, re.MULTILINE | re.IGNORECASE)
    if m:
        out["kmer_coverage"] = m.group(1)
    return out


def write_stats_tsv(out_dir: Path, summaries: list[tuple[int, dict]],
                    name: str) -> Path:
    keys = sorted({k for _, s in summaries for k in s})
    tsv = out_dir / f"{name}_genomescope_stats.tsv"
    with open(tsv, "w") as f:
        f.write("chunk\t" + "\t".join(keys) + "\n")
        for chunk, s in summaries:
            f.write(
                f"{chunk}\t" + "\t".join(s.get(k, "") for k in keys) + "\n"
            )
    return tsv


def run_genomescope(histo: Path, out_dir: Path, k: int) -> Path | None:
    name = histo.stem
    cmd = [
        "genomescope2", "-i", str(histo), "-o", str(out_dir),
        "-k", str(k), "-n", name,
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        print(f"  {name}: genomescope2 failed: {proc.stderr[-200:]}",
              file=sys.stderr)
        return None
    return out_dir / f"{name}_summary.txt"


def make_movie(out_dir: Path, name: str, fps: int = 4) -> Path | None:
    if shutil.which("ffmpeg") is None:
        print("ffmpeg not found; skipping movie", file=sys.stderr)
        return None
    movie = out_dir / f"{name}.mp4"
    cmd = [
        "ffmpeg", "-y", "-framerate", str(fps),
        "-pattern_type", "glob",
        "-i", str(out_dir / "chunk_*_transformed_linear_plot.png"),
        "-c:v", "libx264", "-pix_fmt", "yuv420p", str(movie),
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        print(f"ffmpeg failed: {proc.stderr[-200:]}", file=sys.stderr)
        return None
    return movie


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("-i", "--input", required=True,
                    help="multi-chunk .histo written with --chunks N")
    ap.add_argument("-o", "--outdir", default=None)
    ap.add_argument("-k", "--kmer-size", type=int, default=21)
    ap.add_argument("-t", "--threads", type=int, default=1)
    ap.add_argument("--fps", type=int, default=4)
    args = ap.parse_args(argv)

    histo = Path(args.input)
    if not histo.is_file():
        print(f"input file does not exist: {histo}", file=sys.stderr)
        return 1
    out_dir = Path(args.outdir or histo.stem + "_gs")
    name = histo.stem

    chunk_files = split_chunks(histo, out_dir)
    print(f"split {len(chunk_files)} chunk spectra into {out_dir}")

    if shutil.which("genomescope2") is None:
        print(
            "genomescope2 not found — per-chunk histos were written; "
            "install genomescope2 (conda -c bioconda genomescope2) to fit "
            "models and render the movie",
            file=sys.stderr,
        )
        return 0

    with ThreadPoolExecutor(max_workers=max(1, args.threads)) as pool:
        summary_paths = list(pool.map(
            lambda h: run_genomescope(h, out_dir, args.kmer_size),
            chunk_files,
        ))
    summaries = [
        (i + 1, parse_summary(p))
        for i, p in enumerate(summary_paths)
        if p is not None and p.exists()
    ]
    if summaries:
        tsv = write_stats_tsv(out_dir, summaries, name)
        print(f"wrote {tsv}")
    movie = make_movie(out_dir, name, args.fps)
    if movie:
        print(f"wrote {movie}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
