"""Cache + ENA layer tests.

Ports the reference's tempdir cache test matrix
(/root/reference/src/cache.rs:359-604): lookup hit/miss, checksum
self-heal, orphan eviction, partial-vs-complete sufficiency,
truncate-at-max-reads, atomic writes — using ``file://`` URLs so no
network is touched. ENA filereport parsing is fixture-tested against
the TSV shape of /root/reference/src/io.rs:63-134.
"""

import gzip
import json
from pathlib import Path

import pytest

from sharkmer_tpu.io.cache import CacheConfig, _url_key
from sharkmer_tpu.io.ena import parse_ena_filereport


def _write_fastq_gz(path: Path, n_reads: int) -> None:
    with gzip.open(path, "wt") as f:
        for i in range(n_reads):
            f.write(f"@r{i}\nACGTACGTAC\n+\nIIIIIIIIII\n")


@pytest.fixture
def src(tmp_path):
    """A local 10-read gzip FASTQ served via file:// URL."""
    p = tmp_path / "src" / "reads.fastq.gz"
    p.parent.mkdir()
    _write_fastq_gz(p, 10)
    return p.as_uri()  # file:///... ends with .gz -> gz path exercised


@pytest.fixture
def cache(tmp_path):
    return CacheConfig.new(tmp_path / "cache")


def _read_names(path: Path) -> list[str]:
    with gzip.open(path, "rt") as f:
        return [line.strip() for line in f if line.startswith("@")]


def test_lookup_miss_on_empty_cache(cache):
    assert cache.lookup("http://example.com/x.fastq.gz", 0) is None


def test_download_complete_then_hit(cache, src):
    got = cache.download_to_cache(src, max_reads=0)
    assert got.exists()
    meta = json.loads(
        (cache.cache_dir / f"{_url_key(src)}.meta.json").read_text()
    )
    assert meta == {
        "url": src,
        "sha256": meta["sha256"],
        "complete": True,
        "n_reads": 10,
    }
    # complete entries hit regardless of requested depth
    assert cache.lookup(src, 0) == got
    assert cache.lookup(src, 1_000_000) == got
    assert _read_names(got) == [f"@r{i}" for i in range(10)]


def test_download_truncates_at_max_reads(cache, src):
    got = cache.download_to_cache(src, max_reads=4)
    meta = json.loads(
        (cache.cache_dir / f"{_url_key(src)}.meta.json").read_text()
    )
    assert meta["complete"] is False
    assert meta["n_reads"] == 4
    assert _read_names(got) == ["@r0", "@r1", "@r2", "@r3"]


def test_partial_entry_sufficiency(cache, src):
    got = cache.download_to_cache(src, max_reads=4)
    # sufficient: requested depth within the cached prefix
    assert cache.lookup(src, 4) == got
    assert cache.lookup(src, 2) == got
    # insufficient: deeper request evicts the partial entry
    assert cache.lookup(src, 5) is None
    assert not got.exists()
    assert not (cache.cache_dir / f"{_url_key(src)}.meta.json").exists()


def test_partial_entry_never_serves_unbounded_request(cache, src):
    got = cache.download_to_cache(src, max_reads=4)
    # max_reads == 0 means "all reads": a partial entry cannot satisfy it
    assert cache.lookup(src, 0) is None
    assert not got.exists()


def test_checksum_mismatch_evicts(cache, src):
    got = cache.download_to_cache(src, max_reads=0)
    got.write_bytes(b"corrupted payload")
    assert cache.lookup(src, 0) is None
    assert not got.exists()  # self-healed


def test_orphaned_data_evicts(cache, src):
    got = cache.download_to_cache(src, max_reads=0)
    (cache.cache_dir / f"{_url_key(src)}.meta.json").unlink()
    assert cache.lookup(src, 0) is None
    assert not got.exists()


def test_orphaned_meta_evicts(cache, src):
    got = cache.download_to_cache(src, max_reads=0)
    got.unlink()
    assert cache.lookup(src, 0) is None
    assert not (cache.cache_dir / f"{_url_key(src)}.meta.json").exists()


def test_corrupt_meta_evicts(cache, src):
    got = cache.download_to_cache(src, max_reads=0)
    (cache.cache_dir / f"{_url_key(src)}.meta.json").write_text("{not json")
    assert cache.lookup(src, 0) is None
    assert not got.exists()


def test_uncompressed_source(cache, tmp_path):
    p = tmp_path / "plain.fastq"
    p.write_text("@r0\nACGT\n+\nIIII\n@r1\nACGT\n+\nIIII\n")
    url = p.as_uri()  # no .gz suffix -> plain path
    got = cache.download_to_cache(url, max_reads=0)
    assert _read_names(got) == ["@r0", "@r1"]
    assert cache.lookup(url, 0) == got


def test_failed_download_leaves_no_debris(cache):
    bad = "file:///nonexistent/definitely_missing.fastq.gz"
    with pytest.raises(Exception):
        cache.download_to_cache(bad, max_reads=0)
    leftovers = list(cache.cache_dir.iterdir())
    assert leftovers == []


def test_redownload_overwrites_atomically(cache, src):
    cache.download_to_cache(src, max_reads=2)
    got = cache.download_to_cache(src, max_reads=0)
    assert cache.lookup(src, 0) == got
    # exactly one data + one meta file: no stale tmp files
    names = sorted(p.name for p in cache.cache_dir.iterdir())
    assert names == sorted(
        [f"{_url_key(src)}.fastq.gz", f"{_url_key(src)}.meta.json"]
    )


def test_clear(tmp_path, src):
    cache = CacheConfig.new(tmp_path / "c2")
    cache.download_to_cache(src, max_reads=0)
    CacheConfig.clear(tmp_path / "c2")
    assert not (tmp_path / "c2").exists()


# -- ENA filereport parsing ---------------------------------------------------

TSV = (
    "run_accession\tfastq_ftp\tscientific_name\n"
    "ERR571460\tftp.sra.ebi.ac.uk/vol1/x_1.fastq.gz;"
    "ftp.sra.ebi.ac.uk/vol1/x_2.fastq.gz\tPorites lutea\n"
)


def test_ena_parse_paired_order_and_name():
    res = parse_ena_filereport(TSV, "ERR571460")
    # R1 before R2, bare hosts get an http:// scheme (io.rs:96-110)
    assert res.urls == [
        "http://ftp.sra.ebi.ac.uk/vol1/x_1.fastq.gz",
        "http://ftp.sra.ebi.ac.uk/vol1/x_2.fastq.gz",
    ]
    assert res.scientific_name == "Porites lutea"


def test_ena_parse_preserves_explicit_schemes():
    tsv = (
        "run_accession\tfastq_ftp\tscientific_name\n"
        "X\tftp://host/a.gz;https://host/b.gz\tGenus species\n"
    )
    res = parse_ena_filereport(tsv, "X")
    assert res.urls == ["ftp://host/a.gz", "https://host/b.gz"]


def test_ena_no_results_raises():
    with pytest.raises(ValueError, match="no results"):
        parse_ena_filereport("run_accession\tfastq_ftp\n", "BAD123")


def test_ena_missing_ftp_column_raises():
    with pytest.raises(ValueError, match="fastq_ftp"):
        parse_ena_filereport("run_accession\tother\nX\tY\n", "X")


def test_ena_empty_ftp_field_raises():
    tsv = "run_accession\tfastq_ftp\tscientific_name\nX\t\tName\n"
    with pytest.raises(ValueError, match="no FASTQ URLs"):
        parse_ena_filereport(tsv, "X")


def test_ena_missing_scientific_name():
    tsv = "run_accession\tfastq_ftp\nX\thost/a.fastq.gz\n"
    res = parse_ena_filereport(tsv, "X")
    assert res.urls == ["http://host/a.fastq.gz"]
    assert res.scientific_name is None
