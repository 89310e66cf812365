"""Full cross-aligner comparison + significance + gap-structure analysis.

The equivalent of the reference's analysis/comparison layer
(/root/reference/benchmarks/full_comparison.py — all configs x all
metrics with per-category tables; analysis.py — gap-structure metrics;
external_balibase.py — external tools on BAliBASE), redesigned around
this framework's case registry and engines:

  * every config (this framework's modes/engines, the reference kalign
    binary, clustalo/mafft/muscle when installed) aligns every registry
    case; SP(=recall)/TC/precision/F1/wall are scored against the gold,
    and gap-structure metrics (alignment length vs gold, gap fraction,
    gap-run count and length) are computed from the alignments;
  * per-category and overall mean tables;
  * the significance table the reference paper's accuracy claim rests
    on (doc/paper/kalign3.org:72): paired Wilcoxon + paired t-test of
    each config against a baseline config on per-case SP and TC, with
    Cliff's delta effect sizes and Holm-Bonferroni family-wise
    correction over the whole table.

Usage:
    python -m benchmarks.analysis                      # host default vs all
    python -m benchmarks.analysis --configs host:default,host:fast \\
        --baseline kalign-ref --dataset balibase --json out.json
Absent external tools are SKIPPED (never faked); the reference binary
is found via $KALIGN_REF_BIN, .refbuild, or PATH (benchmarks/scoring).
"""

import argparse
import json
import os
import sys
import time
from collections import defaultdict

from benchmarks.datasets import load_cases, materialize
from benchmarks import scoring
from benchmarks.stats import (wilcoxon_paired, paired_ttest,
                              holm_bonferroni, bootstrap_ci)

RESULTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "results")


# ---------------------------------------------------------------------------
# gap structure (reference analysis.py's concern: HOW alignments differ)
# ---------------------------------------------------------------------------

def gap_stats(rows) -> dict:
    """Structural metrics of one alignment: length, gap fraction, gap
    runs per sequence, mean run length."""
    if not rows:
        return dict(alnlen=0, gap_frac=0.0, runs_per_seq=0.0,
                    mean_run_len=0.0)
    alnlen = len(rows[0])
    total = 0
    gaps = 0
    runs = 0
    run_len_sum = 0
    for r in rows:
        total += len(r)
        in_run = False
        for ch in r:
            if ch == "-":
                gaps += 1
                if not in_run:
                    runs += 1
                    in_run = True
                run_len_sum += 1
            else:
                in_run = False
    return dict(alnlen=alnlen,
                gap_frac=round(gaps / max(total, 1), 4),
                runs_per_seq=round(runs / len(rows), 3),
                mean_run_len=round(run_len_sum / max(runs, 1), 3))


# ---------------------------------------------------------------------------
# configs
# ---------------------------------------------------------------------------

def parse_configs(spec: str):
    """"host:default,host:fast,tpu-fast:default,kalign-ref,mafft" ->
    [(name, kind, params)].  engine:mode pairs run this framework;
    bare tool names run external binaries."""
    out = []
    for item in spec.split(","):
        item = item.strip()
        if not item:
            continue
        if ":" in item:
            engine, mode = item.split(":", 1)
            out.append((item, "self", dict(engine=engine, mode=mode)))
        else:
            out.append((item, "external", dict(tool=item)))
    return out


def _align_config(kind, params, seqs, names):
    """Returns (rows, row_names, wall_s) or None (tool unavailable)."""
    if kind == "self":
        from kalign_tpu.api import align
        mode = params["mode"]
        t0 = time.time()
        rows = align(seqs, names=names,
                     mode=None if mode == "default" else mode,
                     engine=params["engine"], n_threads=1)
        return rows, list(names), time.time() - t0
    return scoring.align_external(params["tool"], seqs, names)


def run_analysis(cases, configs, jobs=1):
    """Per-(case, config) rows: scores + gap structure.  Absent tools
    record a single 'skipped' marker instead of per-case rows."""
    rows = []
    skipped = set()
    for case in cases:
        seqs, names, gold_rows, gold_names = materialize(case)
        gold_gaps = gap_stats(gold_rows)
        for cname, kind, params in configs:
            if cname in skipped:
                continue
            a = _align_config(kind, params, seqs, names)
            if a is None:
                skipped.add(cname)
                continue
            arows, anames, wall = a
            d = scoring._detailed(gold_rows, gold_names, arows, anames)
            g = gap_stats(arows)
            rows.append(dict(
                case=case.name, category=case.category, config=cname,
                sp=round(d.recall, 4), tc=round(d.tc, 4),
                precision=round(d.precision, 4), f1=round(d.f1, 4),
                wall_s=round(wall, 3),
                alnlen=g["alnlen"], gold_alnlen=gold_gaps["alnlen"],
                gap_frac=g["gap_frac"], gold_gap_frac=gold_gaps["gap_frac"],
                runs_per_seq=g["runs_per_seq"],
                mean_run_len=g["mean_run_len"]))
    return rows, sorted(skipped)


# ---------------------------------------------------------------------------
# aggregation + significance
# ---------------------------------------------------------------------------

def summarize(rows):
    """Per (config, category) and per config overall means."""
    by_cc = defaultdict(list)
    by_c = defaultdict(list)
    for r in rows:
        by_cc[(r["config"], r["category"])].append(r)
        by_c[r["config"]].append(r)

    def _mean(rs, k):
        return round(sum(r[k] for r in rs) / len(rs), 4)

    per_cat = [dict(config=c, category=cat, cases=len(rs),
                    mean_sp=_mean(rs, "sp"), mean_tc=_mean(rs, "tc"),
                    mean_precision=_mean(rs, "precision"),
                    mean_f1=_mean(rs, "f1"),
                    total_wall_s=round(sum(r["wall_s"] for r in rs), 2),
                    mean_alnlen_ratio=round(
                        sum(r["alnlen"] / max(r["gold_alnlen"], 1)
                            for r in rs) / len(rs), 3),
                    mean_gap_frac=_mean(rs, "gap_frac"))
               for (c, cat), rs in sorted(by_cc.items())]
    overall = []
    for c, rs in sorted(by_c.items()):
        sps = [r["sp"] for r in rs]
        lo, hi = bootstrap_ci(sps)
        overall.append(dict(
            config=c, cases=len(rs), mean_sp=_mean(rs, "sp"),
            sp_ci95=[round(lo, 4), round(hi, 4)],
            mean_tc=_mean(rs, "tc"), mean_precision=_mean(rs, "precision"),
            mean_f1=_mean(rs, "f1"),
            total_wall_s=round(sum(r["wall_s"] for r in rs), 2)))
    return per_cat, overall


def significance_table(rows, baseline: str):
    """Paired tests of every config against `baseline` on per-case SP
    and TC, Holm-corrected across the whole table (the family is all
    config x metric comparisons, as in the reference downstream
    suite's adjudication)."""
    per_case = defaultdict(dict)   # case -> config -> row
    for r in rows:
        per_case[r["case"]][r["config"]] = r
    configs = sorted({r["config"] for r in rows} - {baseline})
    table = []
    for cfg in configs:
        shared = [c for c in per_case
                  if baseline in per_case[c] and cfg in per_case[c]]
        if len(shared) < 2:
            continue
        for metric in ("sp", "tc"):
            a = [per_case[c][cfg][metric] for c in shared]
            b = [per_case[c][baseline][metric] for c in shared]
            w = wilcoxon_paired(a, b)
            t = paired_ttest(a, b)
            table.append(dict(
                config=cfg, baseline=baseline, metric=metric,
                n=len(shared),
                mean_diff=round(t["mean_diff"], 4),
                cliffs_delta=round(w["cliffs_delta"], 3),
                wilcoxon_p=round(w["p_value"], 5),
                ttest_p=round(t["p_value"], 5)))
    adj = holm_bonferroni([row["wilcoxon_p"] for row in table])
    for row, p in zip(table, adj):
        row["wilcoxon_p_holm"] = round(p, 5)
        row["significant_0.05"] = bool(p < 0.05)
    return table


def print_tables(per_cat, overall, sig, skipped):
    def _p(d):
        print(json.dumps(d))
    print("# overall")
    for row in overall:
        _p(row)
    print("# per-category")
    for row in per_cat:
        _p(row)
    print("# significance (paired vs baseline, Holm-corrected)")
    for row in sig:
        _p(row)
    if skipped:
        print(f"# skipped (not installed): {', '.join(skipped)}")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="benchmarks.analysis",
                                 description=__doc__)
    ap.add_argument("--dataset", default="all",
                    choices=["all", "balibase", "dssim"])
    ap.add_argument("--data", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "data"))
    ap.add_argument("--configs",
                    default="host:default,host:fast,kalign-ref,"
                            "clustalo,mafft,muscle")
    ap.add_argument("--baseline", default=None,
                    help="config name the significance table compares "
                         "against (default: kalign-ref if available, "
                         "else the first config)")
    ap.add_argument("--json", default=None, metavar="FILE")
    args = ap.parse_args(argv)

    cases = load_cases(args.dataset, args.data)
    configs = parse_configs(args.configs)
    rows, skipped = run_analysis(cases, configs)
    if not rows:
        print(json.dumps({"error": "no config produced any alignment"}))
        return 1
    per_cat, overall = summarize(rows)
    have = {r["config"] for r in rows}
    baseline = args.baseline
    if baseline is None:
        baseline = "kalign-ref" if "kalign-ref" in have \
            else configs[0][0]
    sig = significance_table(rows, baseline)
    print_tables(per_cat, overall, sig, skipped)
    if args.json:
        from benchmarks.downstream.provenance import collect
        with open(args.json, "w") as fh:
            json.dump(dict(rows=rows, per_category=per_cat,
                           overall=overall, significance=sig,
                           baseline=baseline, skipped=skipped,
                           provenance=collect(
                               parameters=dict(dataset=args.dataset,
                                               configs=args.configs),
                               devices=False)), fh,
                      indent=1)
            fh.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
