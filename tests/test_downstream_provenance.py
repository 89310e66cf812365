"""Provenance capture + summary figure generation."""

import json
import os

import pytest


def test_provenance_record_shape():
    from benchmarks.downstream.provenance import collect, result_name
    rec = collect(parameters={"x": 1}, devices=False)
    for key in ("timestamp", "kalign_tpu_version", "git_commit",
                "cpu_model", "cpu_cores", "ram_gb", "python_version",
                "tool_versions", "parameters"):
        assert key in rec, key
    assert rec["parameters"] == {"x": 1}
    # the reference binary (when a refbuild exists) is versioned too;
    # absent tools are recorded as None, never invented
    for tool in ("clustalo", "mafft", "muscle"):
        assert tool in rec["tool_versions"]
    name = result_name("analysis", tag="r05")
    assert name.startswith("analysis_20") and name.endswith("_r05.json")


def test_summary_figure(tmp_path):
    from benchmarks.downstream.figures import make_summary_figure
    payload = dict(
        per_category=[
            dict(config="a", category="c1", mean_sp=0.9, mean_tc=0.5,
                 total_wall_s=1.0),
            dict(config="b", category="c1", mean_sp=0.8, mean_tc=0.4,
                 total_wall_s=0.5)],
        overall=[dict(config="a", mean_sp=0.9, mean_tc=0.5,
                      total_wall_s=1.0),
                 dict(config="b", mean_sp=0.8, mean_tc=0.4,
                      total_wall_s=0.5)],
        significance=[dict(config="b", metric="sp",
                           significant_0=False)],
        baseline="a")
    out = make_summary_figure(payload, str(tmp_path / "f.png"))
    assert os.path.getsize(out) > 10000
