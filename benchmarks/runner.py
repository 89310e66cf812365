"""Accuracy + throughput benchmark harness.

Mirrors the reference's benchmarks module (benchmarks/runner.py,
scoring.py): discovers (input, gold) pairs — BAliBASE-style directories
with .tfa inputs and .msf gold alignments — aligns each case, scores
SP/TC against gold, and reports per-case and aggregate results.

Without network access the default dataset is the in-repo BAliBASE
families plus DSSim-simulated families (self-consistency scored).

Usage:
    python -m benchmarks                   # default dataset, host engine
    python -m benchmarks --engine tpu
    python -m benchmarks --data DIR --mode precise
"""

import argparse
import glob
import json
import os
import sys
import time


def discover_cases(data_dir):
    cases = []
    for tfa in sorted(glob.glob(os.path.join(data_dir, "*.tfa"))):
        stem = os.path.splitext(tfa)[0]
        gold = stem + ".msf"
        if os.path.exists(gold):
            cases.append((os.path.basename(stem), tfa, gold))
    return cases


def _gold_rows(path):
    from kalign_tpu.core import io as kio
    m = kio.read_alignment(path)
    if m.aligned == 2:
        m.finalise()
    return [s.seq for s in m.sequences], [s.name for s in m.sequences]


def run_case(name, tfa, gold, mode="default", engine="host", n_threads=1):
    from kalign_tpu.core import io as kio
    from kalign_tpu.core.cmp import msa_compare_detailed
    from kalign_tpu import engine as E
    from kalign_tpu.api import _resolve_mode

    consistency, ensemble, realign = _resolve_mode(
        None if mode == "default" else mode, None, 0, 0)
    msa = kio.read_inputs([tfa])
    msa.quiet = True
    t0 = time.time()
    if ensemble:
        from kalign_tpu.ensemble import ensemble_align
        msa = ensemble_align(msa, n_threads=n_threads, n_runs=ensemble,
                             realign=realign,
                             consistency_anchors=consistency, engine=engine)
    else:
        msa = E.align_msa(msa, n_threads=n_threads,
                          consistency_anchors=consistency,
                          realign=realign, engine=engine)
    wall = time.time() - t0
    gr, gn = _gold_rows(gold)
    d = msa_compare_detailed(gr, msa.aligned_rows(), gn,
                             [s.name for s in msa.sequences], 0.2)
    return {
        "case": name, "mode": mode, "engine": engine,
        "n_seqs": msa.numseq, "alnlen": msa.alnlen,
        "wall_s": round(wall, 3),
        "sp": round(d.recall, 4), "tc": round(d.tc, 4),
        "precision": round(d.precision, 4), "f1": round(d.f1, 4),
    }


def run_throughput(engine="host", n_families=8, n_seq=64, length=300,
                   n_threads=1):
    """Alignments/s on DSSim-simulated families (the scaling metric from
    BASELINE.json)."""
    from kalign_tpu.api import align, generate_test_sequences
    fams = [generate_test_sequences(n_seq, 10, False, length, seed=100 + i)
            for i in range(n_families)]
    # warmup
    align(fams[0][0], names=fams[0][1], mode="fast", engine=engine,
          n_threads=n_threads)
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
    p.add_argument("--data", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "data"))
    p.add_argument("--mode", default="default",
                   choices=["default", "fast", "precise"])
    p.add_argument("--engine", default="host", choices=["host", "tpu", "tpu-fast"])
    p.add_argument("--threads", type=int, default=1)
    p.add_argument("--throughput", action="store_true")
    p.add_argument("--json", action="store_true")
    args = p.parse_args(argv)

    results = []
    for name, tfa, gold in discover_cases(args.data):
        r = run_case(name, tfa, gold, args.mode, args.engine, args.threads)
        results.append(r)
        print(json.dumps(r))
    if results:
        sp = sum(r["sp"] for r in results) / len(results)
        tc = sum(r["tc"] for r in results) / len(results)
        wall = sum(r["wall_s"] for r in results)
        print(json.dumps({"summary": True, "cases": len(results),
                          "mean_sp": round(sp, 4), "mean_tc": round(tc, 4),
                          "total_wall_s": round(wall, 3)}))
    if args.throughput:
        print(json.dumps(run_throughput(args.engine,
                                        n_threads=args.threads)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
