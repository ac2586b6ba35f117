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
