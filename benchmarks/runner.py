"""Accuracy + throughput benchmark harness.

Mirrors the reference's benchmarks module (/root/reference/benchmarks/
runner.py:15-80, scoring.py, datasets.py): a dataset registry
(committed BAliBASE families + a 24-family DSSim divergence sweep with
ground-truth alignments), a process-pool case runner, per-category
SP/TC aggregation, optional external-tool comparison, and JSON results
consumed by the regression gate (benchmarks/gate.py — the reference
CI's >5% alert semantics, .github/workflows/benchmark.yml:104-131).

Usage:
    python -m benchmarks                          # all datasets, host
    python -m benchmarks --dataset dssim --engine tpu-fast
    python -m benchmarks --external               # + clustalo/mafft if installed
    python -m benchmarks --json results.json --jobs 4
    python -m benchmarks.gate results.json benchmarks/baseline.json
"""

import argparse
import json
import os
import sys
import time
from collections import defaultdict
from concurrent.futures import ProcessPoolExecutor

from benchmarks.datasets import load_cases, materialize
from benchmarks import scoring


def run_case(case, mode, engine, n_threads, external):
    seqs, names, gold_rows, gold_names = materialize(case)
    r = dict(category=case.category, case=case.name, mode=mode,
             engine=engine, n_seqs=len(seqs))
    r.update(scoring.score_kalign(seqs, names, gold_rows, gold_names,
                                  mode, engine, n_threads))
    if external:
        ext = []
        for tool in scoring.available_external_tools():
            e = scoring.score_external(tool, seqs, names, gold_rows,
                                       gold_names)
            if e:
                ext.append(e)
        if ext:
            r["external"] = ext
    return r


def _worker(args):
    case, mode, engine, n_threads, external = args
    # each pool worker pins jax to CPU (the benchmark device run goes
    # through --jobs 1 in the main process)
    try:
        import jax
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    return run_case(case, mode, engine, n_threads, external)


def aggregate(results):
    cats = defaultdict(list)
    for r in results:
        cats[r["category"]].append(r)
    table = []
    for cat in sorted(cats):
        rs = cats[cat]
        table.append(dict(
            category=cat, cases=len(rs),
            mean_sp=round(sum(r["sp"] for r in rs) / len(rs), 4),
            mean_tc=round(sum(r["tc"] for r in rs) / len(rs), 4),
            total_wall_s=round(sum(r["wall_s"] for r in rs), 3)))
    return table


def run_throughput(engine="host", n_families=8, n_seq=64, length=300,
                   n_threads=1):
    """Alignments/s on DSSim-simulated families (the scaling metric from
    BASELINE.json)."""
    from kalign_tpu.api import align, generate_test_sequences
    fams = [generate_test_sequences(n_seq, 10, False, length, seed=100 + i)
            for i in range(n_families)]
    align(fams[0][0], names=fams[0][1], mode="fast", engine=engine,
          n_threads=n_threads)  # warmup
    t0 = time.time()
    for seqs, names in fams:
        align(seqs, names=names, mode="fast", engine=engine,
              n_threads=n_threads)
    wall = time.time() - t0
    return {
        "metric": "alignments_per_s", "engine": engine,
        "families": n_families, "n_seq": n_seq, "length": length,
        "value": round(n_families / wall, 3), "wall_s": round(wall, 3),
    }


def main(argv=None):
    p = argparse.ArgumentParser(prog="kalign-tpu-bench")
    p.add_argument("--dataset", default="all",
                   choices=["all", "balibase", "dssim"])
    p.add_argument("--data", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "data"))
    p.add_argument("--mode", default="default",
                   choices=["default", "fast", "precise"])
    p.add_argument("--engine", default="host",
                   choices=["host", "tpu", "tpu-fast"])
    p.add_argument("--threads", type=int, default=1)
    p.add_argument("--jobs", type=int, default=1,
                   help="process-pool width over cases")
    p.add_argument("--external", action="store_true",
                   help="also score clustalo/mafft/muscle if installed")
    p.add_argument("--throughput", action="store_true")
    p.add_argument("--json", metavar="FILE", default=None,
                   help="write full results JSON for benchmarks.gate")
    args = p.parse_args(argv)

    cases = load_cases(args.dataset, args.data)
    work = [(c, args.mode, args.engine, args.threads, args.external)
            for c in cases]
    results = []
    if args.jobs > 1:
        with ProcessPoolExecutor(max_workers=args.jobs) as pool:
            for r in pool.map(_worker, work):
                results.append(r)
                print(json.dumps(r))
    else:
        for w in work:
            r = run_case(*w)
            results.append(r)
            print(json.dumps(r))

    table = aggregate(results)
    for row in table:
        print(json.dumps(row))
    summary = dict(
        summary=True, cases=len(results),
        mean_sp=round(sum(r["sp"] for r in results) / max(len(results), 1), 4),
        mean_tc=round(sum(r["tc"] for r in results) / max(len(results), 1), 4),
        total_wall_s=round(sum(r["wall_s"] for r in results), 3))
    print(json.dumps(summary))

    payload = dict(results=results, categories=table, summary=summary,
                   engine=args.engine, mode=args.mode)
    if args.throughput:
        payload["throughput"] = run_throughput(args.engine,
                                               n_threads=args.threads)
        print(json.dumps(payload["throughput"]))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(payload, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
