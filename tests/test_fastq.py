"""FASTQ reader and writer tests (error paths mirror tests/spcr_18s.rs:559-652)."""

import gzip
import io

import pytest

from sharkmer_tpu.io.fastq import (
    FastqFormatError,
    open_fastq,
    read_fastq_paired,
    read_fastq_records,
)
from sharkmer_tpu.io.writers import (
    write_fasta_record,
    write_final_histo,
    write_incremental_histo,
)

from util import fastq_bytes


def test_read_plain_and_gzip(tmp_path):
    reads = ["ACGTACGT", "TTTTACGT"]
    plain = tmp_path / "r.fastq"
    plain.write_bytes(fastq_bytes(reads))
    gz = tmp_path / "r.fastq.gz"
    gz.write_bytes(fastq_bytes(reads, gzipped=True))
    # gz content without .gz extension: magic sniffing
    sneaky = tmp_path / "r2.fastq"
    sneaky.write_bytes(fastq_bytes(reads, gzipped=True))

    for p in [plain, gz, sneaky]:
        got = [s.decode() for s in read_fastq_records(open_fastq(p))]
        assert got == reads


def test_fasta_input_rejected():
    data = b">seq1\nACGT\n"
    with pytest.raises(FastqFormatError, match="FASTA format"):
        list(read_fastq_records(io.BytesIO(data)))


def test_bad_header_rejected():
    data = b"read1\nACGT\n+\nIIII\n"
    with pytest.raises(FastqFormatError, match="invalid header"):
        list(read_fastq_records(io.BytesIO(data)))


def test_bad_separator_rejected():
    data = b"@read1\nACGT\nX\nIIII\n"
    with pytest.raises(FastqFormatError, match="invalid separator"):
        list(read_fastq_records(io.BytesIO(data)))


def test_quality_length_mismatch_rejected():
    data = b"@read1\nACGT\n+\nIII\n"
    with pytest.raises(FastqFormatError, match="mismatched sequence"):
        list(read_fastq_records(io.BytesIO(data)))


def test_truncated_record_rejected():
    data = b"@read1\nACGT\n+\n"
    with pytest.raises(FastqFormatError, match="missing quality"):
        list(read_fastq_records(io.BytesIO(data)))


def test_validate_every_skips_bad_middle_records():
    # default: only the first record is validated (io.rs:321-331)
    good = b"@r0\nACGT\n+\nIIII\n"
    bad = b"@r1\nACGT\n+\nIII\n"  # bad quality length, index 1
    seqs = list(read_fastq_records(io.BytesIO(good + bad)))
    assert len(seqs) == 2
    # validate_every=1 validates all
    with pytest.raises(FastqFormatError):
        list(read_fastq_records(io.BytesIO(good + bad), validate_every=1))


def test_paired_alternates():
    r1 = fastq_bytes(["AAAA", "CCCC"])
    r2 = fastq_bytes(["GGGG", "TTTT"])
    got = [
        s.decode()
        for s in read_fastq_paired(io.BytesIO(r1), io.BytesIO(r2))
    ]
    assert got == ["AAAA", "GGGG", "CCCC", "TTTT"]


def test_paired_mismatch_warns(caplog):
    r1 = fastq_bytes(["AAAA", "CCCC", "AAAA"])
    r2 = fastq_bytes(["GGGG"])
    import logging

    with caplog.at_level(logging.WARNING, logger="sharkmer"):
        got = list(read_fastq_paired(io.BytesIO(r1), io.BytesIO(r2)))
    assert any("length mismatch" in r.message for r in caplog.records)
    assert len(got) == 3  # AAAA GGGG CCCC; breaks when R2 ends mid-pair


def test_fasta_wrapping(tmp_path):
    path = tmp_path / "x.fasta"
    seq = "A" * 185
    with open(path, "w") as f:
        write_fasta_record(f, "id1", "desc here", seq)
    lines = path.read_text().splitlines()
    assert lines[0] == ">id1 desc here"
    assert [len(l) for l in lines[1:]] == [80, 80, 25]


def test_histo_file_formats(tmp_path):
    import numpy as np

    v1 = np.zeros(12, np.uint64)
    v1[1] = 5
    v1[11] = 2
    v2 = v1.copy()
    v2[2] = 3
    inc = tmp_path / "s.histo"
    fin = tmp_path / "s.final.histo"
    write_incremental_histo(str(inc), [v1, v2], 10, k=21, chunks=2)
    write_final_histo(str(fin), v2, 10, k=21, chunks=2)

    lines = inc.read_text().splitlines()
    assert lines[0].startswith("# sharkmer ")
    assert lines[1] == "count\tchunk_1\tchunk_2"
    assert lines[2] == "1\t5\t5"
    assert lines[3] == "2\t0\t3"
    assert lines[-1] == "11\t2\t2"
    assert len(lines) == 2 + 11  # comment + header + rows 1..11

    flines = fin.read_text().splitlines()
    assert flines[1] == "count\tfrequency"
    assert flines[2] == "1\t5"
    assert flines[-1] == "11\t2"
