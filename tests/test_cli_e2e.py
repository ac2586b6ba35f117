"""End-to-end CLI tests: full pipeline runs over synthetic FASTQ.

Parity targets from the reference integration suite
(/root/reference/tests/spcr_18s.rs): output file presence/absence,
stats.yaml fields, dry-run produces nothing, early-exit flags, error
paths, inline-primer runs recovering an amplicon.
"""

import os

import pytest
import yaml

from sharkmer_tpu.main import main

from data_18s import READ_STRING
from util import random_genome, reads_from_genome, write_fastq


def tiling_reads(seq, read_len=120, step=20):
    return [
        seq[i : i + read_len]
        for i in range(0, len(seq) - read_len + 1, step)
    ]


@pytest.fixture()
def fastq_18s(tmp_path):
    # Tiling reads (6x) plus full-length copies so coverage stays >= the
    # min-count threshold at the amplicon edges.
    path = tmp_path / "reads.fastq"
    write_fastq(path, tiling_reads(READ_STRING) + [READ_STRING] * 5)
    return str(path)


PRIMER_SPEC = (
    "forward=AACCTGGTTGATCCTGCCAGT,reverse=TGATCCTTCTGCAGGTTCACCTAC,"
    "name=18s,max-length=2500,min-count=3"
)


def run_cli(args):
    return main(args)


def test_spcr_recovers_18s(tmp_path, fastq_18s):
    out = tmp_path / "out"
    rc = run_cli([
        fastq_18s, "-s", "samp", "-k", "21", "-o", str(out),
        "--pcr-primers", PRIMER_SPEC,
    ])
    assert rc == 0
    fasta = out / "samp_18s.fasta"
    assert fasta.exists()
    content = fasta.read_text()
    assert content.startswith(">samp_18s_0 ")
    seq = "".join(
        l for l in content.splitlines() if not l.startswith(">")
    )
    assert seq in READ_STRING
    assert len(seq) == 1808

    stats = yaml.safe_load((out / "samp.stats.yaml").read_text())
    assert stats["sample"] == "samp"
    assert stats["kmer_length"] == 21
    assert stats["pcr_results"][0]["status"] == "success"
    assert stats["pcr_results"][0]["n_products"] == 1
    assert stats["pcr_results"][0]["product_lengths"] == [1808]
    # no histograms without --chunks
    assert not (out / "samp.histo").exists()


def test_chunks_produce_histograms(tmp_path):
    genome = random_genome(2000, seed=5)
    path = tmp_path / "r.fastq"
    write_fastq(path, reads_from_genome(genome, 3000, 100, seed=6), gzipped=False)
    out = tmp_path / "out"
    rc = run_cli([
        str(path), "-s", "x", "-k", "17", "--chunks", "5",
        "--histo-max", "100", "-o", str(out),
    ])
    assert rc == 0
    histo = (out / "x.histo").read_text().splitlines()
    assert histo[1] == "count\t" + "\t".join(f"chunk_{i}" for i in range(1, 6))
    assert len(histo) == 2 + 101
    final = (out / "x.final.histo").read_text().splitlines()
    assert final[1] == "count\tfrequency"
    stats = yaml.safe_load((out / "x.stats.yaml").read_text())
    assert stats["chunks"] == 5
    assert stats["n_singleton_kmers"] >= 0
    assert (
        stats["n_multi_kmers"] + stats["n_singleton_kmers"] <= stats["n_kmers"]
    )


def test_chunk_invariance_via_cli(tmp_path):
    genome = random_genome(3000, seed=9)
    path = tmp_path / "r.fastq"
    write_fastq(path, reads_from_genome(genome, 2500, 90, seed=10))
    outs = []
    for chunks in (1, 10):
        out = tmp_path / f"out{chunks}"
        rc = run_cli([
            str(path), "-s", "c", "-k", "19", "--chunks", str(chunks),
            "--histo-max", "50", "-o", str(out),
        ])
        assert rc == 0
        # skip the comment line (it records the chunk count)
        outs.append((out / "c.final.histo").read_text().splitlines()[1:])
    assert outs[0] == outs[1]


def test_dry_run_produces_nothing(tmp_path, fastq_18s, capsys):
    out = tmp_path / "out"
    with pytest.raises(SystemExit) as exc:
        run_cli([
            fastq_18s, "-s", "samp", "-o", str(out), "--dry-run",
            "--pcr-primers", PRIMER_SPEC,
        ])
    assert exc.value.code == 0
    assert not out.exists()
    err = capsys.readouterr().err
    assert "(dry run)" in err
    assert "samp_18s.fasta" in err


def test_list_panels_and_cite(capsys):
    with pytest.raises(SystemExit):
        run_cli(["--list-panels"])
    out = capsys.readouterr().out
    for name in ["cnidaria", "insecta", "metazoa"]:
        assert name in out

    with pytest.raises(SystemExit):
        run_cli(["--cite"])
    assert "10.1093/bioinformatics" in capsys.readouterr().out


def test_export_panel(capsys):
    with pytest.raises(SystemExit):
        run_cli(["--export-panel", "cnidaria"])
    out = capsys.readouterr().out
    assert out.startswith("name: cnidaria")


def test_validate_panels(capsys):
    with pytest.raises(SystemExit):
        run_cli(["--validate-panels", "--pcr-panel", "cnidaria"])
    out = capsys.readouterr().out
    assert "All primers valid." in out
    assert "cnidaria_18S" in out


def test_panel_prefix_naming(tmp_path, fastq_18s):
    out = tmp_path / "out"
    rc = run_cli([
        fastq_18s, "-s", "s2", "-k", "21", "-o", str(out),
        "--pcr-panel-file", "tests/fixtures/test_panel.yaml",
    ])
    assert rc == 0
    stats = yaml.safe_load((out / "s2.stats.yaml").read_text())
    names = [r["gene_name"] for r in stats["pcr_results"]]
    assert names == ["test_panel_18S"]


def test_error_fasta_input(tmp_path):
    path = tmp_path / "x.fasta"
    path.write_text(">seq\nACGT\n")
    rc = run_cli([str(path), "-s", "s", "-o", str(tmp_path / "o")])
    assert rc == 1


def test_error_missing_file(tmp_path):
    rc = run_cli(["/nonexistent.fastq", "-s", "s", "-o", str(tmp_path / "o")])
    assert rc == 1


def test_error_missing_sample(tmp_path, fastq_18s):
    rc = run_cli([fastq_18s, "-o", str(tmp_path / "o")])
    assert rc == 1


def test_error_even_k(tmp_path, fastq_18s):
    rc = run_cli([fastq_18s, "-s", "s", "-k", "20", "-o", str(tmp_path / "o")])
    assert rc == 1


def test_error_duplicate_gene_names(tmp_path, fastq_18s):
    rc = run_cli([
        fastq_18s, "-s", "s", "-o", str(tmp_path / "o"),
        "--pcr-primers", "forward=ACGTACGTAA,reverse=TTGGCCAATT,name=g",
        "--pcr-primers", "forward=ACGTACGTCC,reverse=TTGGCCAAGG,name=g",
    ])
    assert rc == 1


def test_max_reads_cap(tmp_path):
    genome = random_genome(2000, seed=11)
    path = tmp_path / "r.fastq"
    write_fastq(path, reads_from_genome(genome, 500, 80, seed=12))
    out = tmp_path / "out"
    rc = run_cli([
        str(path), "-s", "m", "-k", "15", "-m", "100", "-o", str(out),
    ])
    assert rc == 0
    stats = yaml.safe_load((out / "m.stats.yaml").read_text())
    assert stats["n_reads_read"] == 100


def test_gene_failure_reason_always_set(tmp_path, fastq_18s):
    out = tmp_path / "out"
    rc = run_cli([
        fastq_18s, "-s", "f", "-k", "21", "-o", str(out),
        "--pcr-primers",
        "forward=GGGGGGGGGGGGGGG,reverse=CCCCCCCCCCCCCAA,name=bad,mismatches=0",
    ])
    assert rc == 0
    stats = yaml.safe_load((out / "f.stats.yaml").read_text())
    r = stats["pcr_results"][0]
    assert r["status"] == "fail"
    assert r["failure_reason"]


def test_save_and_load_table(tmp_path, fastq_18s):
    out1 = tmp_path / "o1"
    ckpt = tmp_path / "table.npz"
    rc = run_cli([
        fastq_18s, "-s", "a", "-k", "21", "-o", str(out1),
        "--save-table", str(ckpt),
    ])
    assert rc == 0 and ckpt.exists()

    # re-run sPCR from the checkpoint only (no input reads at all)
    out2 = tmp_path / "o2"
    rc = run_cli([
        "--load-table", str(ckpt), "-s", "b", "-o", str(out2),
        "-k", "21", "--pcr-primers", PRIMER_SPEC,
    ])
    assert rc == 0
    fasta = out2 / "b_18s.fasta"
    assert fasta.exists()
    seq = "".join(
        l for l in fasta.read_text().splitlines() if not l.startswith(">")
    )
    assert len(seq) == 1808
    stats = yaml.safe_load((out2 / "b.stats.yaml").read_text())
    # ingest stats survive the checkpoint round-trip
    assert stats["n_reads_read"] > 0


REVCOMP = str.maketrans("ACGT", "TGCA")


def _rc(s: str) -> str:
    return s.translate(REVCOMP)[::-1]


def test_read_threading_end_to_end(tmp_path, fastq_18s, caplog):
    """--read-threading must execute Pass 2 (main._reread_sequences) and
    the threading->bubble->DFS chain, still recovering the amplicon
    (reference: mod.rs:664-707, io.rs:769-941)."""
    import logging

    out = tmp_path / "out"
    with caplog.at_level(logging.INFO, logger="sharkmer"):
        rc = run_cli([
            fastq_18s, "-s", "t", "-k", "21", "-o", str(out), "-v",
            "--read-threading", "--pcr-primers", PRIMER_SPEC,
        ])
    assert rc == 0
    msgs = [r.getMessage() for r in caplog.records]
    assert any("Pass 2: re-reading sequences" in m for m in msgs)
    collected = [m for m in msgs if m.startswith("Pass 2: collected")]
    assert collected and "0 reads" not in collected[0]
    fasta = out / "t_18s.fasta"
    seq = "".join(
        l for l in fasta.read_text().splitlines() if not l.startswith(">")
    )
    assert len(seq) == 1808
    # the threading->bubble chain actually ran and annotated edges
    threading_msgs = [m for m in msgs if "edges have read support" in m]
    assert threading_msgs, "threading annotation log line missing"
    supported = int(threading_msgs[0].split("Threading: ")[1].split("/")[0])
    assert supported > 0, "no edges received read support"


def test_paired_end_to_end(tmp_path):
    """--paired ingests R1/R2 alternating; totals count both files
    (reference: io.rs:630-697)."""
    genome = random_genome(3000, seed=31)
    r1 = reads_from_genome(genome, 300, 100, seed=32)
    r2 = [_rc(r) for r in reads_from_genome(genome, 300, 100, seed=33)]
    p1, p2 = tmp_path / "R1.fastq", tmp_path / "R2.fastq.gz"
    write_fastq(p1, r1)
    write_fastq(p2, r2, gzipped=True)
    out = tmp_path / "out"
    rc = run_cli([
        str(p1), str(p2), "--paired", "-s", "p", "-k", "17",
        "--chunks", "3", "--histo-max", "60", "-o", str(out),
    ])
    assert rc == 0
    stats = yaml.safe_load((out / "p.stats.yaml").read_text())
    assert stats["n_reads_read"] == 600
    assert stats["n_bases_read"] == 600 * 100

    # paired ingestion is count-equivalent to concatenated single-end
    # (canonical k-mers are strand-invariant)
    flat = tmp_path / "flat.fastq"
    write_fastq(flat, r1 + r2)
    out2 = tmp_path / "out2"
    rc = run_cli([
        str(flat), "-s", "q", "-k", "17", "--chunks", "3",
        "--histo-max", "60", "-o", str(out2),
    ])
    assert rc == 0
    h1 = (out / "p.final.histo").read_text().splitlines()[1:]
    h2 = (out2 / "q.final.histo").read_text().splitlines()[1:]
    assert h1 == h2


def test_paired_max_reads_rounds_to_even(tmp_path):
    genome = random_genome(1500, seed=41)
    r1 = reads_from_genome(genome, 100, 80, seed=42)
    r2 = [_rc(r) for r in r1]
    p1, p2 = tmp_path / "a_R1.fastq", tmp_path / "a_R2.fastq"
    write_fastq(p1, r1)
    write_fastq(p2, r2)
    out = tmp_path / "out"
    rc = run_cli([
        str(p1), str(p2), "--paired", "-s", "e", "-k", "15",
        "-m", "11", "-o", str(out),
    ])
    assert rc == 0
    stats = yaml.safe_load((out / "e.stats.yaml").read_text())
    assert stats["n_reads_read"] == 12  # rounded up to even (io.rs:483-495)


def test_paired_with_read_threading(tmp_path, caplog):
    """Paired Pass 2 rereads assign R1/R2 mates
    (threading.rs:128-192 analog through the CLI)."""
    import logging

    # amplicon-bearing reads split across a synthetic pair
    reads = tiling_reads(READ_STRING) + [READ_STRING] * 5
    r1 = reads[0::2]
    r2 = [_rc(r) for r in reads[1::2]]
    n = min(len(r1), len(r2))
    r1, r2 = r1[:n], r2[:n]
    p1, p2 = tmp_path / "t_R1.fastq", tmp_path / "t_R2.fastq"
    write_fastq(p1, r1)
    write_fastq(p2, r2)
    out = tmp_path / "out"
    with caplog.at_level(logging.INFO, logger="sharkmer"):
        rc = run_cli([
            str(p1), str(p2), "--paired", "--read-threading",
            "-s", "pt", "-k", "21", "-o", str(out), "-v",
            "--pcr-primers", PRIMER_SPEC,
        ])
    assert rc == 0
    msgs = [r.getMessage() for r in caplog.records]
    assert any(m.startswith("Pass 2: collected") for m in msgs)
    stats = yaml.safe_load((out / "pt.stats.yaml").read_text())
    assert stats["pcr_results"][0]["status"] == "success"


@pytest.mark.parametrize("extra", [[], ["--no-mirror"]])
def test_spcr_sharded_cli(tmp_path, fastq_18s, extra):
    """Full CLI with the count table sharded over 4 virtual devices
    (VERDICT r1 item 9): chunked streaming ingest, psum'd spectra, and
    — with --no-mirror — device-resident sharded primer scans and
    graph-extension lookups. Output must equal the single-device run."""
    out = tmp_path / "out"
    rc = run_cli([
        fastq_18s, "-s", "sh", "-k", "21", "-o", str(out),
        "--n-shards", "4", "--chunks", "3",
        "--pcr-primers", PRIMER_SPEC, *extra,
    ])
    assert rc == 0
    seq = "".join(
        l for l in (out / "sh_18s.fasta").read_text().splitlines()
        if not l.startswith(">")
    )
    assert seq in READ_STRING and len(seq) == 1808
    stats = yaml.safe_load((out / "sh.stats.yaml").read_text())
    assert stats["pcr_results"][0]["product_lengths"] == [1808]
