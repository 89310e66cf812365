"""Smoke tests for the benchmark harness (benchmarks/): dataset
registry, one end-to-end scored case per source, and the regression
gate semantics (reference benchmark.yml:104-131)."""

import json

from benchmarks import gate, scoring
from benchmarks.datasets import load_cases, materialize, dssim_cases
from conftest import DATA


def test_dataset_registry():
    cases = load_cases("all", DATA)
    assert len(cases) >= 20
    assert len({c.category for c in cases}) >= 8
    names = [c.name for c in cases]
    assert len(names) == len(set(names))


def test_dssim_case_materializes_and_scores():
    case = dssim_cases()[0]
    seqs, names, gold_rows, gold_names = materialize(case)
    assert len(gold_rows) == len(seqs)
    assert all(r.replace("-", "") == s for r, s in zip(gold_rows, seqs))
    r = scoring.score_kalign(seqs, names, gold_rows, gold_names,
                             "fast", "host", 1)
    assert 0.5 < r["sp"] <= 1.0


def test_balibase_case_materializes():
    cases = load_cases("balibase", DATA)
    assert len(cases) == 3
    seqs, names, gold_rows, gold_names = materialize(cases[0])
    assert len(seqs) == len(names)
    assert len(set(len(r) for r in gold_rows)) == 1


def test_gate_detects_regression():
    base = {"categories": [{"category": "x", "cases": 1,
                            "mean_sp": 0.90, "mean_tc": 0.80,
                            "total_wall_s": 10.0}],
            "summary": {"total_wall_s": 10.0}}
    ok = {"categories": [{"category": "x", "cases": 1,
                          "mean_sp": 0.88, "mean_tc": 0.78,
                          "total_wall_s": 10.5}],
          "summary": {"total_wall_s": 10.5}}
    bad = {"categories": [{"category": "x", "cases": 1,
                           "mean_sp": 0.80, "mean_tc": 0.80,
                           "total_wall_s": 10.0}],
           "summary": {"total_wall_s": 10.0}}
    assert gate.compare(ok, base, 0.05) == []
    fails = gate.compare(bad, base, 0.05)
    assert fails and "mean_sp" in fails[0]


def test_committed_baseline_is_current_format():
    b = json.load(open("benchmarks/baseline.json"))
    assert "categories" in b and "summary" in b
    assert {c["category"] for c in b["categories"]} >= {
        "balibase", "dssim-prot-easy", "dssim-prot-hard"}


def test_report_renders(tmp_path):
    from benchmarks import report
    payload = {"engine": "host", "mode": "default",
               "summary": {"cases": 1, "mean_sp": 0.9, "mean_tc": 0.8,
                           "total_wall_s": 1.0},
               "categories": [{"category": "x", "cases": 1, "mean_sp": 0.9,
                               "mean_tc": 0.8, "total_wall_s": 1.0}],
               "results": [{"case": "c", "category": "x", "n_seqs": 4,
                            "sp": 0.9, "tc": 0.8, "precision": 0.9,
                            "f1": 0.9, "wall_s": 1.0}]}
    html_out = report.render(payload)
    assert "Per category" in html_out and "0.9000" in html_out
