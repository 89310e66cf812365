"""Benchmark analysis layer (benchmarks/analysis.py + stats.py): the
full-comparison/significance equivalent of the reference's
benchmarks/full_comparison.py + analysis.py."""

import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_stats_match_scipy_and_handle_degenerates():
    from benchmarks.stats import (wilcoxon_paired, paired_ttest,
                                  holm_bonferroni, bootstrap_ci)
    from scipy.stats import wilcoxon, ttest_rel
    a = [0.9, 0.8, 0.95, 0.7, 0.85, 0.81, 0.77, 0.92]
    b = [0.88, 0.82, 0.9, 0.72, 0.8, 0.8, 0.75, 0.9]
    assert abs(wilcoxon_paired(a, b)["p_value"] - wilcoxon(a, b)[1]) < 1e-12
    assert abs(paired_ttest(a, b)["p_value"] - ttest_rel(a, b)[1]) < 1e-12
    # identical outputs (byte-parity engines) must read "no difference"
    assert wilcoxon_paired(a, a)["p_value"] == 1.0
    assert paired_ttest(a, a)["p_value"] == 1.0
    assert holm_bonferroni([0.01, 0.04, 0.03]) == [0.03, 0.06, 0.06]
    lo, hi = bootstrap_ci(a)
    assert lo < float(np.mean(a)) < hi


def test_gap_stats():
    from benchmarks.analysis import gap_stats
    g = gap_stats(["AC--G", "A---G"])
    assert g["alnlen"] == 5
    assert g["gap_frac"] == 0.5            # 5 gaps / 10 chars
    assert g["runs_per_seq"] == 1.0        # one run per row
    assert g["mean_run_len"] == 2.5


def test_parse_configs():
    from benchmarks.analysis import parse_configs
    cfgs = parse_configs("host:default,tpu-fast:fast,kalign-ref,mafft")
    assert cfgs[0] == ("host:default", "self",
                      dict(engine="host", mode="default"))
    assert cfgs[2] == ("kalign-ref", "external", dict(tool="kalign-ref"))


@pytest.mark.slow
def test_analysis_end_to_end(tmp_path):
    """Two self configs over the committed BAliBASE cases: rows, per
    category, overall and the significance table all materialize; a
    config compared against itself is never significant."""
    from benchmarks import analysis
    out = tmp_path / "a.json"
    rc = analysis.main(["--dataset", "balibase",
                        "--configs", "host:default,host:fast",
                        "--baseline", "host:default",
                        "--json", str(out)])
    assert rc == 0
    payload = json.loads(out.read_text())
    cfgs = {r["config"] for r in payload["overall"]}
    assert cfgs == {"host:default", "host:fast"}
    assert payload["baseline"] == "host:default"
    sig = payload["significance"]
    assert {s["metric"] for s in sig} == {"sp", "tc"}
    for s in sig:
        assert s["config"] == "host:fast"
        assert 0.0 <= s["wilcoxon_p_holm"] <= 1.0
    # gap-structure columns present on every row
    for r in payload["rows"]:
        assert "gap_frac" in r and "alnlen" in r and "gold_alnlen" in r
