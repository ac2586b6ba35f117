"""Validation/benchmark tooling tests (offline parts).

Covers the result model, report generation with the three-position
score code, sweep summary aggregation, primer degeneracy analysis,
and an end-to-end runner invocation against a local FASTQ (the
network-free path: panel file + local reads via a patched command).
"""

import sys
from pathlib import Path

import yaml

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from sharkmer_validate import primer_analysis, report, results, runner  # noqa: E402
from sweep_summary import build_tables, summarize_result  # noqa: E402


def fake_run(max_reads=1000, genes=None):
    return {
        "accession": "SRRTEST", "max_reads": max_reads,
        "wall_time_seconds": 12.5, "success": True, "returncode": 0,
        "stats": {"n_reads_read": max_reads},
        "genes": genes or [],
    }


def gene_entry(name, status="success", lengths=(500,), seqs=("ACGT" * 200,)):
    return {
        "gene": name, "status": status,
        "n_products": len(lengths) if status == "success" else 0,
        "product_lengths": list(lengths) if status == "success" else [],
        "sequences": list(seqs) if status == "success" else [],
    }


PANEL = {
    "name": "toy",
    "panel_version": "1.0.0",
    "primers": [
        {"gene": "18S", "forward_seq": "AACCTGGTTGATCCTGCCAGT",
         "reverse_seq": "TGATCCTTCTGCAGGTTCACCTAC", "trim": 15},
    ],
    "references": [
        {"gene": "18S", "sequences": [
            {"taxon": "Xenia sp.", "accession": "X1", "sequence": "ACGT" * 100},
        ]},
    ],
}


def test_build_result_shape(tmp_path):
    sample = {"accession": "SRRTEST", "taxon": "Xenia sp."}
    runs = [fake_run(genes=[gene_entry("toy_18S")])]
    result = results.build_result(
        Path("panel.yaml"), PANEL, [(sample, runs)], "0.1.0",
        machine_info={"platform": "test"}, sweep_label="sweep_k_21",
        extra_args=["-k", "21"],
    )
    assert result["panel"] == "toy"
    assert result["sweep_label"] == "sweep_k_21"
    assert result["parameters"]["extra_args"] == ["-k", "21"]
    s = result["samples"][0]
    assert s["accession"] == "SRRTEST"
    assert s["depths"][0]["genes"][0]["gene"] == "toy_18S"

    path = results.write_result(result, tmp_path)
    assert path.exists()
    loaded = results.load_result(path)
    assert loaded["panel"] == "toy"


def test_gene_score_codes():
    ok = {"status": "success", "blast": {"on_target": True, "same_taxon": True}}
    assert report.gene_score(ok, True, True) == "+**"
    other = {"status": "success",
             "blast": {"on_target": True, "same_taxon": False}}
    assert report.gene_score(other, True, False) == "+++"
    norefs = {"status": "success"}
    assert report.gene_score(norefs, False, False) == "+--"
    fail = {"status": "fail"}
    assert report.gene_score(fail, True, True) == "-*-"
    assert report.gene_score(fail, False, False) == "---"


def test_report_generation():
    sample = {"accession": "SRRTEST", "taxon": "Xenia sp."}
    genes = [gene_entry("toy_18S")]
    genes[0]["blast"] = {"on_target": True, "same_taxon": True,
                         "identity": 0.998}
    runs = [fake_run(genes=genes)]
    result = results.build_result(Path("p.yaml"), PANEL, [(sample, runs)],
                                  "0.1.0")
    # blast annotations must survive into the result
    md = report.generate_report(result, PANEL)
    assert "Xenia sp." in md
    assert "`+**` 500bp 99.8%" in md
    assert "Scoring" in md


def test_sweep_summary():
    def mk(label, recovered, wall):
        sample = {"accession": "A"}
        genes = [gene_entry("toy_18S",
                            status="success" if recovered else "fail")]
        runs = [dict(fake_run(genes=genes), wall_time_seconds=wall)]
        return results.build_result(Path("p.yaml"), PANEL, [(sample, runs)],
                                    "0.1.0", sweep_label=label)

    summaries = [
        summarize_result(mk("sweep_k_19", True, 100.0)),
        summarize_result(mk("sweep_k_21", False, 80.0)),
    ]
    table = build_tables(summaries)
    assert "sweep_k_19" in table and "sweep_k_21" in table
    assert "**Winner:** `sweep_k_19`" in table


def test_primer_analysis():
    amplicon = (
        "GTTGATCCTGCCAGT" + "A" * 400 +
        primer_analysis.revcomp("GCAGGTTCACCTAC"[-15:])
    )
    sample = {"accession": "S", "taxon": "T"}
    runs = [fake_run(genes=[gene_entry("toy_18S", seqs=(amplicon,))])]
    analyses = primer_analysis.analyze_primer_bindings(
        PANEL, [(sample, runs)], ["toy_18S"]
    )
    assert len(analyses) == 1
    a = analyses[0]
    assert a["gene"] == "toy_18S"
    fwd_rows = a["forward"]
    assert all(r["observed_code"] in "ACGTRYSWKMBDHVN-" for r in fwd_rows)
    # non-degenerate positions observed exactly
    assert fwd_rows[0]["primer_code"] == "G"
    assert fwd_rows[0]["observed"] == "G"


def test_runner_fasta_parse(tmp_path):
    fasta = tmp_path / "x.fasta"
    fasta.write_text(">a d\nACGT\nTTTT\n>b\nGGGG\n")
    assert runner.read_fasta_sequences(str(fasta)) == ["ACGTTTTT", "GGGG"]


def test_runner_derive_gene_name():
    assert runner.derive_gene_name({"gene": "CO1"}) == "CO1"
    assert runner.derive_gene_name({"gene": "18S", "region": "V9"}) == "18S-V9"
    assert runner.derive_gene_name({"gene": "X", "index": 2}) == "X_2"


def test_bootstrap_from_runs_collection(tmp_path):
    """Offline helpers of bootstrap_from_runs: best-amplicon collection
    (panel-prefix stripping, per-(gene,sample) dedup, deepest-first),
    run-dir reuse parsing, and BLAST XML top-hit extraction."""
    import bootstrap_from_runs as bfr

    runs = [
        {
            "accession": "SRR1", "taxon": "Xenia sp.", "max_reads": 2000,
            "success": True,
            "genes": [
                gene_entry("pan_18S", seqs=("A" * 500,)),
                gene_entry("pan_CO1", status="failure", seqs=()),
            ],
        },
        {   # shallower run for the same sample: must NOT override 18S
            "accession": "SRR1", "taxon": "Xenia sp.", "max_reads": 1000,
            "success": True,
            "genes": [gene_entry("pan_18S", seqs=("C" * 300,))],
        },
        {"accession": "SRR2", "max_reads": 1000, "success": False,
         "genes": [gene_entry("pan_18S")]},
    ]
    amps = bfr.best_amplicons(runs, "pan")
    assert len(amps) == 1
    assert amps[0]["gene"] == "18S"  # prefix stripped
    assert amps[0]["sequence"] == "A" * 500
    assert amps[0]["accession"] == "SRR1"

    # reuse_runs: parse stats.yaml + fasta back into run records
    run_dir = tmp_path
    (run_dir / "SRR1_2000.stats.yaml").write_text(yaml.dump({
        "pcr_results": [
            {"gene_name": "pan_18S", "status": "success"},
        ],
    }))
    (run_dir / "SRR1_2000_pan_18S.fasta").write_text(">x\nACGTACGT\n")
    panel_data = {
        "validation": {"samples": [
            {"accession": "SRR1", "taxon": "Xenia sp.",
             "max_reads": [1000, 2000]},
        ]},
    }
    recs = bfr.reuse_runs(panel_data, "pan", run_dir)
    assert len(recs) == 1
    assert recs[0]["max_reads"] == 2000  # deepest available chosen
    assert recs[0]["genes"][0]["sequences"] == ["ACGTACGT"]

    xml = """<BlastOutput><BlastOutput_iterations><Iteration><Iteration_hits>
      <Hit><Hit_accession>AB1</Hit_accession><Hit_def>d</Hit_def>
      <Hit_hsps><Hsp><Hsp_identity>99</Hsp_identity>
      <Hsp_align-len>100</Hsp_align-len></Hsp></Hit_hsps></Hit>
      </Iteration_hits></Iteration></BlastOutput_iterations></BlastOutput>"""
    hit = bfr.top_hit(xml)
    assert hit == {
        "accession": "AB1", "description": "d",
        "pct_identity": 99.0, "align_length": 100,
    }
    assert bfr.top_hit("<garbage") is None


def test_genomescope_movie_offline(tmp_path):
    """Offline parts of genomescope_movie: chunk splitting of the
    multi-column .histo and summary.txt parsing / TSV aggregation."""
    import genomescope_movie as gm

    histo = tmp_path / "s.histo"
    histo.write_text(
        "# sharkmer incremental histogram\n"
        "count\tchunk_1\tchunk_2\n"
        "1\t10\t20\n"
        "2\t5\t9\n"
    )
    out = tmp_path / "gs"
    paths = gm.split_chunks(histo, out)
    assert [p.name for p in paths] == ["chunk_0001.histo", "chunk_0002.histo"]
    assert paths[0].read_text() == "1\t10\n2\t5\n"
    assert paths[1].read_text() == "1\t20\n2\t9\n"

    summary = tmp_path / "chunk_0001_summary.txt"
    summary.write_text(
        "GenomeScope version 2.0\n"
        "property                      min               max\n"
        "Heterozygosity                0.47%             0.49%\n"
        "Genome Haploid Length         215,000,000 bp    216,500,000 bp\n"
        "Model Fit                     92.1%             97.3%\n"
    )
    parsed = gm.parse_summary(summary)
    assert parsed["heterozygosity_min"] == "0.47%"
    assert parsed["genome_haploid_length_max"] == "216,500,000 bp"

    tsv = gm.write_stats_tsv(out, [(1, parsed)], "s")
    lines = tsv.read_text().splitlines()
    assert lines[0].startswith("chunk\t")
    assert lines[1].startswith("1\t")
