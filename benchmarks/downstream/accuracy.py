"""Pipeline: alignment accuracy across methods (downstream layer).

Reference: benchmarks/downstream/alignment_accuracy.py — score every
method (kalign, kalign_cons, kalign_ens3, mafft, muscle, clustalo)
against reference alignments on BAliBASE (core-block-weighted columns)
and BRAliBASE, per-category and overall.

This port keeps the method matrix and the per-case record shape but
swaps the data sources for what this environment actually has:

  * the committed BAliBASE families (tests/data, gold MSF columns with
    >=20% occupancy as the scored mask — core.cmp's contract);
  * the NEW tree-simulated families (downstream/simulation.py): known
    true alignment AND known topology, so each record also carries the
    Robinson-Foulds distance of the NJ tree built from the method's
    alignment — the "does alignment quality propagate into the tree"
    question the reference answers with its INDELible pipeline.

External tools (clustalo/mafft/muscle, the reference kalign binary)
join the matrix automatically when installed (benchmarks/scoring.py);
absent tools are SKIPPED and listed, never faked.

Usage::

    python -m benchmarks.downstream.accuracy [-j 8] [--quick]
        [--engine host] [--json FILE]
"""

import argparse
import json
import os
import sys
import time
from collections import defaultdict
from concurrent.futures import ProcessPoolExecutor, as_completed

# method name -> how to run it.  kalign-ens3 / kalign-cons mirror the
# reference's kalign_ens3 (3-run POAR selection) / kalign_cons
# (consensus from the POAR table, min_support voting).
FRAMEWORK_METHODS = ("kalign", "kalign-fast", "kalign-ens3", "kalign-cons")
EXTERNAL_METHODS = ("kalign-ref", "clustalo", "mafft", "muscle")


def _align_method(method, seqs, names, engine="host"):
    """Returns (rows, row_names, wall_s) or None if unavailable."""
    if method in ("kalign", "kalign-fast"):
        from kalign_tpu.api import align
        t0 = time.time()
        rows = align(seqs, names=names, engine=engine,
                     mode="fast" if method == "kalign-fast" else None)
        return rows, list(names), time.time() - t0
    if method in ("kalign-ens3", "kalign-cons"):
        from kalign_tpu.core.msa import Msa
        from kalign_tpu.ensemble import ensemble_align
        m = Msa.from_sequences(list(seqs), list(names))
        m.quiet = True
        t0 = time.time()
        m = ensemble_align(m, n_runs=3, engine=engine,
                           min_support=2 if method == "kalign-cons" else 0)
        wall = time.time() - t0
        order = sorted(m.sequences, key=lambda s: names.index(s.name))
        return [s.seq for s in order], [s.name for s in order], wall
    from benchmarks import scoring
    return scoring.align_external(method, seqs, names)


def _one_case(case_kind, payload, method, engine):
    """Worker: align one (case, method) pair and score it."""
    from kalign_tpu.core.cmp import msa_compare_detailed

    if case_kind == "balibase":
        from benchmarks.datasets import Case, materialize
        case = Case(**payload)
        seqs, names, gold_rows, gold_names = materialize(case)
        extra = {}
    else:  # simulated tree family
        from benchmarks.downstream.simulation import simulate_family
        fam = simulate_family(**payload)
        seqs, names = fam.seqs, fam.names
        gold_rows, gold_names = fam.true_rows, fam.names
        extra = {"fam": fam}

    a = _align_method(method, seqs, names, engine=engine)
    if a is None:
        return None
    rows, row_names, wall = a
    d = msa_compare_detailed(gold_rows, rows, gold_names, row_names, 0.2)
    rec = dict(method=method, sp=round(d.recall, 4), tc=round(d.tc, 4),
               precision=round(d.precision, 4), wall_s=round(wall, 3))
    if case_kind == "sim":
        from benchmarks.downstream.phylo import phylo_accuracy_vs_true
        fam = extra["fam"]
        # reorder the method's rows to leaf order for the NJ build
        by_name = dict(zip(row_names, rows))
        ordered = [by_name[n] for n in fam.names]
        rec.update(phylo_accuracy_vs_true(ordered, fam.true_splits,
                                          fam.n_leaves))
    return rec


def build_cases(quick=False, data_dir=None):
    """(kind, category, name, payload) tuples for the full matrix."""
    from benchmarks.datasets import balibase_cases
    data_dir = data_dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "tests", "data")
    cases = []
    for c in balibase_cases(data_dir):
        cases.append(("balibase", c.category, c.name, c._asdict()))
    depths = (0.5,) if quick else (0.3, 0.6, 1.0)
    i = 0
    n_fams = 2 if quick else 6
    for f in range(n_fams):
        d = depths[f % len(depths)]
        cases.append(("sim", f"sim-depth{d}", f"sim-{f}",
                      dict(n_taxa=12 + 4 * (f % 3), length=180,
                           seed=4200 + f, target_depth=d,
                           indel_rate=0.02 + 0.02 * (f % 2))))
        i += 1
    if quick:
        cases = [c for c in cases if c[0] == "sim"] + \
            [c for c in cases if c[0] == "balibase"][:3]
    return cases


def run_accuracy(methods=None, engine="host", jobs=1, quick=False,
                 data_dir=None):
    from benchmarks import scoring
    skipped = []
    if methods is None:
        # default matrix: framework set + whatever externals exist
        methods = list(FRAMEWORK_METHODS)
        for t in EXTERNAL_METHODS:
            if scoring._tool_available(t):
                methods.append(t)
            else:
                skipped.append(t)
    else:
        methods = list(methods)
    cases = build_cases(quick=quick, data_dir=data_dir)
    records = []
    work = [(kind, cat, name, payload, m)
            for (kind, cat, name, payload) in cases for m in methods]
    if jobs > 1:
        with ProcessPoolExecutor(max_workers=jobs) as ex:
            futs = {ex.submit(_one_case, k, p, m, engine): (k, c, n, m)
                    for (k, c, n, p, m) in work}
            for fu in as_completed(futs):
                k, c, n, m = futs[fu]
                rec = fu.result()
                if rec is not None:
                    rec.update(kind=k, category=c, case=n)
                    records.append(rec)
    else:
        for (k, c, n, p, m) in work:
            rec = _one_case(k, p, m, engine)
            if rec is not None:
                rec.update(kind=k, category=c, case=n)
                records.append(rec)
    return records, skipped


def summarize(records):
    """Per-(method, category) and per-method means, reference
    alignment_accuracy table shape."""
    by = defaultdict(list)
    for r in records:
        by[(r["method"], r["category"])].append(r)
        by[(r["method"], "ALL")].append(r)
    out = {}
    for (m, cat), rs in sorted(by.items()):
        row = dict(n=len(rs),
                   sp=round(sum(r["sp"] for r in rs) / len(rs), 4),
                   tc=round(sum(r["tc"] for r in rs) / len(rs), 4),
                   wall_s=round(sum(r["wall_s"] for r in rs), 1))
        rfs = [r["rf_true"] for r in rs if "rf_true" in r]
        if rfs:
            row["rf_true"] = round(sum(rfs) / len(rfs), 4)
        out.setdefault(m, {})[cat] = row
    return out


def main(argv=None):
    p = argparse.ArgumentParser(prog="benchmarks.downstream.accuracy")
    p.add_argument("-j", "--jobs", type=int, default=1)
    p.add_argument("--quick", action="store_true")
    p.add_argument("--engine", default="host",
                   choices=["host", "tpu", "tpu-fast"])
    p.add_argument("--methods", default=None,
                   help="comma list; default: framework set + installed "
                        "external tools")
    p.add_argument("--json", default=None)
    args = p.parse_args(argv)

    methods = args.methods.split(",") if args.methods else None
    records, skipped = run_accuracy(methods=methods, engine=args.engine,
                                    jobs=args.jobs, quick=args.quick)
    summary = summarize(records)
    for m, cats in summary.items():
        for cat, row in cats.items():
            print(json.dumps({"method": m, "category": cat, **row}))
    if skipped:
        print(json.dumps({"skipped_tools": skipped}), file=sys.stderr)
    if args.json:
        with open(args.json, "w") as fh:
            json.dump({"records": records, "summary": summary,
                       "skipped_tools": skipped}, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
