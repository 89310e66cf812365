"""Ensemble alignment (--precise core).

N alignment runs with per-run gap-penalty presets and optionally noisy
guide trees, POAR pair-support extraction, run selection vs union-find
consensus, and a post-selection REFINE_CONFIDENT pass
(reference: lib/src/ensemble.c).

On a TPU pod the runs are embarrassingly parallel: each host aligns a
subset of runs and POAR tables merge via collectives (see
kalign_tpu.parallel); here runs execute sequentially like the reference.
"""

from typing import List, Optional

import numpy as np

from kalign_tpu.core import params as P
from kalign_tpu.core.msa import Msa
from kalign_tpu import engine as E
from kalign_tpu.poar import PoarTable, pos_matrix
from kalign_tpu.consensus import build_consensus, residue_confidence

# per-run gap-penalty presets (ensemble.c:32-46):
# (gpo_scale, gpe_scale, tgpe_scale, tree_noise_sigma)
RUN_PARAMS = [
    (1.0, 1.0, 1.0, 0.00),
    (0.5, 1.5, 0.8, 0.20),
    (1.5, 0.5, 1.2, 0.20),
    (0.7, 0.7, 0.5, 0.25),
    (1.4, 1.4, 1.5, 0.25),
    (0.8, 1.2, 1.0, 0.30),
    (1.3, 0.8, 0.7, 0.30),
    (0.6, 1.0, 1.3, 0.15),
    (1.0, 0.6, 0.6, 0.15),
    (1.8, 1.0, 1.0, 0.35),
    (1.0, 1.8, 1.8, 0.35),
    (0.4, 0.4, 0.3, 0.20),
]


def resolve_run_params(base_gpo, base_gpe, base_tgpe, k, seed):
    if k == 0:
        return base_gpo, base_gpe, base_tgpe, 0, 0.0
    gpo_s, gpe_s, tgpe_s, noise = RUN_PARAMS[k % len(RUN_PARAMS)]
    return (np.float32(base_gpo * np.float32(gpo_s)),
            np.float32(base_gpe * np.float32(gpe_s)),
            np.float32(base_tgpe * np.float32(tgpe_s)),
            seed + k, noise)


def _align_one_run(msa: Msa, k: int, base, seed, n_threads, type_, refine,
                   dist_scale, vsm_amax, realign, use_seq_weights,
                   consistency_anchors, consistency_weight, engine) -> Msa:
    base_gpo, base_gpe, base_tgpe = base
    run_gpo, run_gpe, run_tgpe, run_seed, run_noise = resolve_run_params(
        base_gpo, base_gpe, base_tgpe, k, seed)
    copy = msa.copy()
    copy.quiet = True
    if realign > 0:
        return E.align_msa(copy, n_threads=n_threads, type_=type_,
                           gpo=run_gpo, gpe=run_gpe, tgpe=run_tgpe,
                           refine=refine, dist_scale=dist_scale,
                           vsm_amax=vsm_amax, realign=realign,
                           use_seq_weights=use_seq_weights,
                           consistency_anchors=consistency_anchors,
                           consistency_weight=consistency_weight,
                           engine=engine)
    return E.align_msa(copy, n_threads=n_threads, type_=type_,
                       gpo=run_gpo, gpe=run_gpe, tgpe=run_tgpe,
                       refine=refine,
                       tree_seed=run_seed, tree_noise=run_noise,
                       dist_scale=dist_scale, vsm_amax=vsm_amax,
                       use_seq_weights=use_seq_weights,
                       consistency_anchors=consistency_anchors,
                       consistency_weight=consistency_weight,
                       engine=engine)


def ensemble_run_subset(msa: Msa, run_ids, n_threads=1, type_=0,
                        gpo=-1.0, gpe=-1.0, tgpe=-1.0, seed=42,
                        refine=P.REFINE_NONE, dist_scale=0.0, vsm_amax=-1.0,
                        realign=0, use_seq_weights=0.0,
                        consistency_anchors=0, consistency_weight=2.0,
                        engine="host"):
    """Align a subset of ensemble runs (the distributed unit of work).

    Runs are embarrassingly parallel: run k's parameters depend only on
    (k, seed) (resolve_run_params), so any partition of 0..n_runs-1
    across processes reproduces the sequential ensemble bit-exactly.
    Returns (partial PoarTable with each run's support bit set at its
    GLOBAL index, {k: aligned row strings})."""
    msa.essential_input_check()
    if msa.biotype == 2:
        msa.detect_alphabet()
    base_ap = P.aln_param_init(msa.biotype, type_, gpo, gpe, tgpe, n_threads)
    base = (base_ap.gpo, base_ap.gpe, base_ap.tgpe)
    poar = PoarTable(msa.numseq)
    rows_by_k = {}
    for k in run_ids:
        aligned = _align_one_run(msa, k, base, seed, n_threads, type_,
                                 refine, dist_scale, vsm_amax, realign,
                                 use_seq_weights, consistency_anchors,
                                 consistency_weight, engine)
        rows = aligned.aligned_rows()
        poar.extract(pos_matrix(rows), k)
        rows_by_k[k] = rows
    return poar, rows_by_k


def ensemble_align(msa: Msa, n_threads: int = 1, type_: int = 0,
                   n_runs: int = 3, gpo: float = -1.0, gpe: float = -1.0,
                   tgpe: float = -1.0, seed: int = 42, min_support: int = 0,
                   save_poar: Optional[str] = None,
                   refine: int = P.REFINE_NONE,
                   dist_scale: float = 0.0, vsm_amax: float = -1.0,
                   realign: int = 0, use_seq_weights: float = -1.0,
                   consistency_anchors: int = 0,
                   consistency_weight: float = 2.0,
                   engine: str = "host") -> Msa:
    assert n_runs >= 1
    if use_seq_weights < 0.0:
        use_seq_weights = 0.0

    msa.essential_input_check()
    if msa.biotype == 2:
        msa.detect_alphabet()

    base_ap = P.aln_param_init(msa.biotype, type_, gpo, gpe, tgpe, n_threads)
    base = (base_ap.gpo, base_ap.gpe, base_ap.tgpe)

    poar, rows_by_k = ensemble_run_subset(
        msa, range(n_runs), n_threads=n_threads, type_=type_, gpo=gpo,
        gpe=gpe, tgpe=tgpe, seed=seed, refine=refine, dist_scale=dist_scale,
        vsm_amax=vsm_amax, realign=realign, use_seq_weights=use_seq_weights,
        consistency_anchors=consistency_anchors,
        consistency_weight=consistency_weight, engine=engine)

    # score each run: prefer run 0 unless >5% improvement (ensemble.c:116-124)
    scores = [poar.score_alignment(pos_matrix(rows_by_k[k]))
              for k in range(n_runs)]
    return _ensemble_finalize(
        msa, poar, rows_by_k, scores, base, seed, n_threads, type_,
        min_support, save_poar, dist_scale, vsm_amax, use_seq_weights,
        consistency_anchors, consistency_weight, engine)


def _ensemble_finalize(msa: Msa, poar: PoarTable, rows_by_k, scores,
                       base, seed, n_threads, type_, min_support,
                       save_poar, dist_scale, vsm_amax, use_seq_weights,
                       consistency_anchors, consistency_weight,
                       engine) -> Msa:
    """Selection / consensus / post-refinement over the merged POAR
    table and the full set of run alignments (ensemble.c:84-466)."""
    n_runs = len(scores)
    best_k = 0
    baseline = scores[0]
    for k in range(1, n_runs):
        if scores[k] > scores[best_k] and scores[k] > baseline * 1.05:
            best_k = k

    if save_poar:
        poar.write(save_poar)

    ungapped = [a.replace("-", "") for a in rows_by_k[0]]

    use_consensus = False
    consensus_rows = None
    if min_support > 0:
        consensus_rows = build_consensus(poar, ungapped, min_support)
        use_consensus = True
    else:
        min_sup = max(2, (n_runs + 2) // 3)
        consensus_rows = build_consensus(poar, ungapped, min_sup)
        consensus_score = poar.score_alignment(pos_matrix(consensus_rows))
        if consensus_score > scores[best_k]:
            use_consensus = True
        else:
            consensus_rows = None

    winner_rows = rows_by_k[best_k]
    if not use_consensus:
        # post-selection refinement with REFINE_CONFIDENT (ensemble.c:403-451)
        refined = _align_one_run(msa, best_k, base, seed, n_threads, type_,
                                 P.REFINE_CONFIDENT, dist_scale, vsm_amax,
                                 0, use_seq_weights, consistency_anchors,
                                 consistency_weight, engine)
        refined_score = poar.score_alignment(
            pos_matrix(refined.aligned_rows()))
        if refined_score > scores[best_k]:
            winner_rows = refined.aligned_rows()

    # install winner into the input msa (original input order preserved:
    # each run's result was rank-restored)
    if use_consensus:
        winner_rows = consensus_rows
    for sq, row in zip(msa.sequences, winner_rows):
        sq.seq = row
    msa.alnlen = len(winner_rows[0])
    msa.aligned = 3  # FINAL

    conf, col_conf = residue_confidence(poar, winner_rows)
    for i, sq in enumerate(msa.sequences):
        sq.confidence = conf[i].tolist()
    msa.col_confidence = col_conf
    return msa


def ensemble_worker(msa: Msa, worker: int, workers: int, scratch: str,
                    n_runs: int = 3, **kwargs) -> List[int]:
    """Distributed ensemble, map phase: align this worker's share of the
    runs (k % workers == worker) and persist the partial POAR table and
    per-run aligned rows into `scratch`.  Any process/host can run any
    worker id; results are bit-identical to the sequential ensemble.
    kwargs are forwarded to ensemble_run_subset."""
    import os
    os.makedirs(scratch, exist_ok=True)
    run_ids = [k for k in range(n_runs) if k % workers == worker]
    poar, rows_by_k = ensemble_run_subset(msa, run_ids, **kwargs)
    poar.write(os.path.join(scratch, f"poar.w{worker}.bin"))
    for k, rows in rows_by_k.items():
        with open(os.path.join(scratch, f"run{k:03d}.rows.txt"), "w") as f:
            f.write("\n".join(rows) + "\n")
    return run_ids


def ensemble_merge(msa: Msa, scratch: str, n_runs: int = 3,
                   n_threads: int = 1, type_: int = 0,
                   gpo: float = -1.0, gpe: float = -1.0, tgpe: float = -1.0,
                   seed: int = 42, min_support: int = 0,
                   save_poar: Optional[str] = None,
                   dist_scale: float = 0.0, vsm_amax: float = -1.0,
                   use_seq_weights: float = 0.0,
                   consistency_anchors: int = 0,
                   consistency_weight: float = 2.0,
                   engine: str = "host") -> Msa:
    """Distributed ensemble, reduce phase: OR-merge the workers' partial
    POAR tables, reload every run's alignment, then run the sequential
    selection / consensus / refinement logic."""
    import glob
    import os
    from kalign_tpu.parallel.distributed import merge_poar_tables

    msa.essential_input_check()
    if msa.biotype == 2:
        msa.detect_alphabet()
    base_ap = P.aln_param_init(msa.biotype, type_, gpo, gpe, tgpe, n_threads)
    base = (base_ap.gpo, base_ap.gpe, base_ap.tgpe)

    parts = sorted(glob.glob(os.path.join(scratch, "poar.w*.bin")))
    if not parts:
        raise FileNotFoundError(f"no partial POAR tables in {scratch}")
    poar = merge_poar_tables([PoarTable.read(p) for p in parts])
    poar.n_alignments = n_runs

    rows_by_k = {}
    for k in range(n_runs):
        path = os.path.join(scratch, f"run{k:03d}.rows.txt")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"run {k} missing from {scratch} (incomplete workers?)")
        with open(path) as f:
            rows_by_k[k] = f.read().splitlines()
    scores = [poar.score_alignment(pos_matrix(rows_by_k[k]))
              for k in range(n_runs)]
    return _ensemble_finalize(
        msa, poar, rows_by_k, scores, base, seed, n_threads, type_,
        min_support, save_poar, dist_scale, vsm_amax, use_seq_weights,
        consistency_anchors, consistency_weight, engine)


def consensus_from_poar(msa: Msa, poar_path: str, min_support: int) -> Msa:
    """Re-threshold a saved POAR table without re-aligning
    (kalign_consensus_from_poar, ensemble.c:500-543)."""
    msa.essential_input_check()
    poar = PoarTable.read(poar_path)
    if poar.numseq != msa.numseq:
        raise ValueError(f"POAR file has {poar.numseq} sequences, "
                         f"input has {msa.numseq}")
    ungapped = [sq.seq.replace("-", "") for sq in msa.sequences]
    rows = build_consensus(poar, ungapped, min_support)
    for sq, row in zip(msa.sequences, rows):
        sq.seq = row
    msa.alnlen = len(rows[0])
    msa.aligned = 3
    conf, col_conf = residue_confidence(poar, rows)
    for i, sq in enumerate(msa.sequences):
        sq.confidence = conf[i].tolist()
    msa.col_confidence = col_conf
    return msa
