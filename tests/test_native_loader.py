"""Native C++ FASTQ loader tests: differential against the python
reader (the dual-path pattern), error paths, overlong-read widening."""

import numpy as np
import pytest

from sharkmer_tpu.io import native as native_mod
from sharkmer_tpu.io.fastq import FastqFormatError, open_fastq, read_fastq_records
from sharkmer_tpu.ops.encoding import ascii_to_codes

from util import fastq_bytes, random_genome, reads_from_genome

pytestmark = pytest.mark.skipif(
    not native_mod.available(), reason="native loader did not build"
)


def collect_native(path, validate_every=0, batch=64):
    seqs = []
    with native_mod.NativeFastqReader(str(path), validate_every) as r:
        while True:
            out = r.read_batch(batch)
            if out is None:
                break
            codes, lens = out
            for row, ln in zip(codes, lens):
                seqs.append((row[: int(ln)].copy(), int(ln)))
    return seqs


def test_matches_python_reader(tmp_path):
    genome = random_genome(3000, seed=30, n_rate=0.01)
    reads = reads_from_genome(genome, 500, 120, seed=31)
    for gz in (False, True):
        path = tmp_path / ("r.fastq.gz" if gz else "r.fastq")
        path.write_bytes(fastq_bytes(reads, gzipped=gz))
        native = collect_native(path)
        python = [
            s.decode() for s in read_fastq_records(open_fastq(path))
        ]
        assert len(native) == len(python)
        for (codes, ln), seq in zip(native, python):
            assert ln == len(seq)
            np.testing.assert_array_equal(codes, ascii_to_codes(seq))


def test_overlong_read_widens(tmp_path):
    reads = ["ACGT" * 10, "A" * 2000, "TTTT" * 30]
    path = tmp_path / "r.fastq"
    path.write_bytes(fastq_bytes(reads))
    with native_mod.NativeFastqReader(str(path), width=64) as r:
        got = []
        while True:
            out = r.read_batch(16)
            if out is None:
                break
            codes, lens = out
            got.extend(int(l) for l in lens)
    assert got == [40, 2000, 120]


def test_native_error_paths(tmp_path):
    cases = [
        (b">seq\nACGT\n", "FASTA format"),
        (b"bad\nACGT\n+\nIIII\n", "invalid header"),
        (b"@r\nACGT\nx\nIIII\n", "invalid separator"),
        (b"@r\nACGT\n+\nIII\n", "mismatched sequence"),
        (b"@r\nACGT\n+\n", "missing quality"),
        (b"@r\nACGX\n+\nIIII\n", "Invalid character"),
    ]
    for data, match in cases:
        path = tmp_path / "bad.fastq"
        path.write_bytes(data)
        with native_mod.NativeFastqReader(str(path)) as r:
            with pytest.raises(FastqFormatError, match=match):
                r.read_batch(16)


def test_engine_code_batch_path(tmp_path):
    """Engine totals identical through the native and python paths."""
    from sharkmer_tpu.engine import CountingEngine

    genome = random_genome(2000, seed=33)
    reads = reads_from_genome(genome, 1200, 90, seed=34)
    path = tmp_path / "r.fastq"
    path.write_bytes(fastq_bytes(reads))

    eng_py = CountingEngine(k=17, n_chunks=3, histo_max=50,
                            initial_capacity=1 << 12)
    eng_py.ingest(iter([r.encode() for r in reads]))
    vec_py = eng_py.consolidate()

    eng_nat = CountingEngine(k=17, n_chunks=3, histo_max=50,
                             initial_capacity=1 << 12)
    with native_mod.NativeFastqReader(str(path)) as r:
        while True:
            out = r.read_batch(500)  # uneven batches vs the 1000 cadence
            if out is None:
                break
            eng_nat.ingest_code_batch(*out)
    vec_nat = eng_nat.consolidate()

    assert eng_nat.stats.__dict__ == eng_py.stats.__dict__
    for a, b in zip(vec_py, vec_nat):
        np.testing.assert_array_equal(a, b)
    assert eng_nat.table.to_dict() == eng_py.table.to_dict()


def test_prefetching_batches_order_and_early_stop(tmp_path):
    """The threaded pump yields the same batches in the same order as
    direct reads, and an early consumer break stops+joins the producer
    cleanly (no use of the reader after close)."""
    from sharkmer_tpu.io.native import PrefetchingBatches

    genome = random_genome(3000, seed=41)
    reads = reads_from_genome(genome, 2500, 90, seed=42)
    path = tmp_path / "r.fastq"
    path.write_bytes(fastq_bytes(reads))

    direct = []
    with native_mod.NativeFastqReader(str(path)) as r:
        while True:
            out = r.read_batch(700)
            if out is None:
                break
            direct.append(out)

    with native_mod.NativeFastqReader(str(path)) as r:
        with PrefetchingBatches(r, batch_reads=700) as batches:
            pumped = list(batches)
    assert len(pumped) == len(direct)
    for (dc, dl), (pc, pl) in zip(direct, pumped):
        np.testing.assert_array_equal(dc, pc)
        np.testing.assert_array_equal(dl, pl)

    # early break: consumer leaves after one batch; exit must join
    with native_mod.NativeFastqReader(str(path)) as r:
        with PrefetchingBatches(r, batch_reads=100, depth=2) as batches:
            for _ in batches:
                break
        assert not batches._thread.is_alive()


def test_prefetching_batches_forwards_errors(tmp_path):
    """A format error raised in the producer thread surfaces in the
    consumer."""
    from sharkmer_tpu.io.fastq import FastqFormatError
    from sharkmer_tpu.io.native import PrefetchingBatches

    path = tmp_path / "bad.fastq"
    path.write_bytes(b"@r1\nACGT\nNOT_A_PLUS\nIIII\n")
    with native_mod.NativeFastqReader(str(path), validate_every=1) as r:
        with PrefetchingBatches(r) as batches:
            with pytest.raises(FastqFormatError):
                list(batches)
