"""Viewer tests: histo parsing, peak detection, genome-size math, HTML output."""

import numpy as np
import yaml

from sharkmer_tpu import viewer


def synthetic_histo(n_chunks=6, peak_cov=24, het_cov=12, size=40):
    """Histogram rows 1..size with an error spike, a het peak and a hom peak."""
    rows = np.zeros((size, n_chunks))
    for i in range(n_chunks):
        frac = (i + 1) / n_chunks
        cov_scale = frac
        for c in range(1, size + 1):
            err = 3e6 * np.exp(-c / 1.2)
            het = 4e4 * np.exp(-((c - het_cov * cov_scale) ** 2) / 8)
            hom = 8e4 * np.exp(-((c - peak_cov * cov_scale) ** 2) / 10)
            rows[c - 1, i] = err + het + hom
    return rows.astype(np.int64)


def write_files(tmp_path, histos):
    counts = np.arange(1, histos.shape[0] + 1)
    histo_path = tmp_path / "x.histo"
    with open(histo_path, "w") as f:
        f.write("# sharkmer 0.1.0 k=21 chunks=%d\n" % histos.shape[1])
        f.write("count\t" + "\t".join(
            f"chunk_{i+1}" for i in range(histos.shape[1])) + "\n")
        for i, c in enumerate(counts):
            f.write(str(c) + "\t" + "\t".join(str(int(v)) for v in histos[i]) + "\n")
    stats_path = tmp_path / "x.stats.yaml"
    stats_path.write_text(yaml.safe_dump({"n_bases_read": 1_000_000_000}))
    return str(histo_path), str(stats_path)


def test_load_histo_formats(tmp_path):
    histos = synthetic_histo()
    hp, _ = write_files(tmp_path, histos)
    counts, loaded = viewer.load_histo(hp)
    assert counts[0] == 1
    np.testing.assert_array_equal(loaded, histos)

    # legacy headerless format
    legacy = tmp_path / "legacy.histo"
    with open(legacy, "w") as f:
        for i in range(histos.shape[0]):
            f.write(f"{i+1}\t" + "\t".join(str(int(v)) for v in histos[i]) + "\n")
    counts2, loaded2 = viewer.load_histo(str(legacy))
    np.testing.assert_array_equal(loaded2, histos)


def test_find_peaks_and_valleys():
    y = np.array([0, 10000, 0, 0, 50000, 0], dtype=float)
    assert viewer.find_peaks(y) == [1, 4]
    assert viewer.find_valleys(-y) == [1, 4]
    # below threshold: ignored
    y2 = np.array([0, 500, 0], dtype=float)
    assert viewer.find_peaks(y2) == []


def test_genome_size_estimates():
    histos = synthetic_histo().astype(np.float64)
    est = viewer.genome_size_estimates(histos)
    assert est, "expected estimates from a peaked spectrum"
    last = [e for e in est if e["sample"] == histos.shape[1] - 1]
    hom = [e for e in last if e["peak_type"] == "homozygous"]
    het = [e for e in last if e["peak_type"] == "heterozygous"]
    assert hom and het
    # hom peak at coverage ~24: size = n_kmers / 24
    assert hom[0]["peak_coverage"] in range(20, 29)


def test_create_report_writes_html(tmp_path, capsys):
    histos = synthetic_histo()
    hp, sp = write_files(tmp_path, histos)
    out = str(tmp_path / "out")
    rc = viewer.create_report(hp, sp, out, "testrun")
    assert rc == 0
    html = (tmp_path / "out.html").read_text()
    assert "testrun" in html and "polyline" in html.lower() or "DATA" in html
    assert (tmp_path / "out_genome_size.html").exists()
    assert "peaks found" in capsys.readouterr().out


def test_viewer_cli(tmp_path):
    histos = synthetic_histo()
    hp, sp = write_files(tmp_path, histos)
    rc = viewer.main(["-d", hp, "-s", sp, "-n", "run1"])
    assert rc == 0
    assert (tmp_path / "x.html").exists()
