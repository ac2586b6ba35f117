"""Shared test fixtures: synthetic genomes / FASTQ generation."""

from __future__ import annotations

import gzip
import io

import numpy as np


def random_genome(n: int, seed: int = 0, n_rate: float = 0.0) -> str:
    rng = np.random.default_rng(seed)
    if n_rate > 0:
        p = [(1 - n_rate) / 4] * 4 + [n_rate]
        return "".join(rng.choice(list("ACGTN"), p=p, size=n))
    return "".join(rng.choice(list("ACGT"), size=n))


def reads_from_genome(
    genome: str, n_reads: int, read_len: int = 100, seed: int = 1
) -> list[str]:
    rng = np.random.default_rng(seed)
    starts = rng.integers(0, max(1, len(genome) - read_len), size=n_reads)
    return [genome[s : s + read_len] for s in starts]


def fastq_bytes(reads: list[str], gzipped: bool = False) -> bytes:
    buf = io.BytesIO()
    for i, seq in enumerate(reads):
        buf.write(f"@read_{i}\n{seq}\n+\n{'I' * len(seq)}\n".encode())
    data = buf.getvalue()
    if gzipped:
        return gzip.compress(data)
    return data


def write_fastq(path, reads: list[str], gzipped: bool = False) -> None:
    with open(path, "wb") as f:
        f.write(fastq_bytes(reads, gzipped))
