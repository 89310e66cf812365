"""Downstream-impact runner: for each DSSim family, align with this
framework and measure phylogenetic accuracy (NJ + Robinson-Foulds vs
the gold tree), detection AUC (train/test split + PSSM), and — with
--calibration — ensemble confidence calibration.

    python -m benchmarks.downstream [--engine host] [--calibration]
"""

import argparse
import json
import sys

import numpy as np


def main(argv=None):
    argv = sys.argv[1:] if argv is None else list(argv)
    # subcommand dispatch (reference __main__.py shape:
    # `python -m benchmarks.downstream alignment_accuracy -j 8`)
    if argv and argv[0] in ("accuracy", "alignment_accuracy"):
        from benchmarks.downstream.accuracy import main as acc_main
        return acc_main(argv[1:])
    p = argparse.ArgumentParser(prog="benchmarks.downstream")
    p.add_argument("--engine", default="host",
                   choices=["host", "tpu", "tpu-fast"])
    p.add_argument("--families", type=int, default=4)
    p.add_argument("--calibration", action="store_true",
                   help="also run the (10x slower) ensemble calibration")
    args = p.parse_args(argv)

    from kalign_tpu.api import align
    from kalign_tpu.dssim import generate_test_alignment
    from benchmarks.downstream import (detection_auc,
                                       confidence_calibration)
    from benchmarks.downstream.phylo import (evolve_family,
                                             phylo_accuracy_vs_true)

    results = []
    for fam in range(args.families):
        seqs, names, gold = generate_test_alignment(
            n_seq=24, n_obs=8, length=220, seed=7000 + fam,
            match_err_p=0.08)
        r = {"family": fam, "engine": args.engine}

        # phylo: tree-structured family with KNOWN topology
        tseqs, true_splits, n_leaves = evolve_family(
            depth=4, length=200, seed=500 + fam)
        tnames = [str(i + 1) for i in range(len(tseqs))]
        trows = align(tseqs, names=tnames, engine=args.engine)
        r["phylo"] = phylo_accuracy_vs_true(trows, true_splits, n_leaves)

        # positive selection: codon family with known selected sites
        from benchmarks.downstream.selection import (
            simulate_selected_family, selection_detection)
        dna, sel_mask, sel_gold, ref_sites = \
            simulate_selected_family(seed=900 + fam)
        dnames = [str(i + 1) for i in range(len(dna))]
        drows = align(dna, names=dnames, engine=args.engine)
        r["selection"] = selection_detection(drows, sel_mask, ref_sites)
        r["selection_gold_alignment"] = selection_detection(
            sel_gold, sel_mask, ref_sites)

        # detection: train on the first 16, test on the held-out 8
        train_rows = align(seqs[:16], names=names[:16], engine=args.engine)
        r["detection"] = detection_auc(train_rows, seqs[16:],
                                       rng=np.random.default_rng(fam))
        # baseline: profile from the TRUE alignment of the same split
        gold_train = [g for g in gold[:16]]
        r["detection_gold_profile"] = detection_auc(
            gold_train, seqs[16:], rng=np.random.default_rng(fam))

        if args.calibration:
            from kalign_tpu.core.msa import Msa
            from kalign_tpu.ensemble import ensemble_align
            m = Msa.from_sequences(seqs, names)
            m.quiet = True
            m = ensemble_align(m, n_runs=3, consistency_anchors=5,
                               engine=args.engine)
            rows = [s.seq for s in sorted(m.sequences,
                                          key=lambda s: int(s.name))]
            r["calibration"] = confidence_calibration(
                m.col_confidence, rows, gold)
        results.append(r)
        print(json.dumps(r))

    mean_rf = np.mean([r["phylo"]["rf_true"] for r in results])
    mean_auc = np.mean([r["detection"]["auc"] for r in results])
    mean_auc_gold = np.mean([r["detection_gold_profile"]["auc"]
                             for r in results])
    sel_aucs = [r["selection"]["auc"] for r in results
                if r["selection"]["auc"] is not None]
    print(json.dumps({"summary": True, "families": len(results),
                      "mean_rf": round(float(mean_rf), 4),
                      "mean_detection_auc": round(float(mean_auc), 4),
                      "gold_profile_auc": round(float(mean_auc_gold), 4),
                      "mean_selection_auc": round(float(np.mean(sel_aucs)), 4)
                      if sel_aucs else None}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
