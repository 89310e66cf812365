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
    numseq = msa.numseq
    if msa.biotype == 2:
        msa.detect_alphabet()

    base_ap = P.aln_param_init(msa.biotype, type_, gpo, gpe, tgpe, n_threads)
    base_gpo, base_gpe, base_tgpe = base_ap.gpo, base_ap.gpe, base_ap.tgpe

    poar = PoarTable(numseq)
    alignments: List[Msa] = []

    for k in range(n_runs):
        run_gpo, run_gpe, run_tgpe, run_seed, run_noise = resolve_run_params(
            base_gpo, base_gpe, base_tgpe, k, seed)
        copy = msa.copy()
        copy.quiet = True
        if realign > 0:
            aligned = E.align_msa(copy, n_threads=n_threads, type_=type_,
                                  gpo=run_gpo, gpe=run_gpe, tgpe=run_tgpe,
                                  refine=refine, dist_scale=dist_scale,
                                  vsm_amax=vsm_amax, realign=realign,
                                  use_seq_weights=use_seq_weights,
                                  consistency_anchors=consistency_anchors,
                                  consistency_weight=consistency_weight,
                                  engine=engine)
        else:
            aligned = E.align_msa(copy, n_threads=n_threads, type_=type_,
                                  gpo=run_gpo, gpe=run_gpe, tgpe=run_tgpe,
                                  refine=refine,
                                  tree_seed=run_seed, tree_noise=run_noise,
                                  dist_scale=dist_scale, vsm_amax=vsm_amax,
                                  use_seq_weights=use_seq_weights,
                                  consistency_anchors=consistency_anchors,
                                  consistency_weight=consistency_weight,
                                  engine=engine)
        poar.extract(pos_matrix(aligned.aligned_rows()), k)
        alignments.append(aligned)

    # score each run: prefer run 0 unless >5% improvement (ensemble.c:116-124)
    scores = [poar.score_alignment(pos_matrix(a.aligned_rows()))
              for a in alignments]
    best_k = 0
    baseline = scores[0]
    for k in range(1, n_runs):
        if scores[k] > scores[best_k] and scores[k] > baseline * 1.05:
            best_k = k

    if save_poar:
        poar.write(save_poar)

    ungapped = [a.replace("-", "") for a in alignments[0].aligned_rows()]

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

    if not use_consensus:
        # post-selection refinement with REFINE_CONFIDENT (ensemble.c:403-451)
        ref_gpo, ref_gpe, ref_tgpe, ref_seed, ref_noise = resolve_run_params(
            base_gpo, base_gpe, base_tgpe, best_k, seed)
        copy = msa.copy()
        copy.quiet = True
        refined = E.align_msa(copy, n_threads=n_threads, type_=type_,
                              gpo=ref_gpo, gpe=ref_gpe, tgpe=ref_tgpe,
                              refine=P.REFINE_CONFIDENT,
                              tree_seed=ref_seed, tree_noise=ref_noise,
                              dist_scale=dist_scale, vsm_amax=vsm_amax,
                              use_seq_weights=use_seq_weights,
                              consistency_anchors=consistency_anchors,
                              consistency_weight=consistency_weight,
                              engine=engine)
        refined_score = poar.score_alignment(pos_matrix(refined.aligned_rows()))
        if refined_score > scores[best_k]:
            alignments[best_k] = refined

    # install winner into the input msa (original input order preserved:
    # each run's result was rank-restored)
    winner_rows = consensus_rows if use_consensus \
        else alignments[best_k].aligned_rows()
    for sq, row in zip(msa.sequences, winner_rows):
        sq.seq = row
    msa.alnlen = len(winner_rows[0])
    msa.aligned = 3  # FINAL

    conf, col_conf = residue_confidence(poar, winner_rows)
    for i, sq in enumerate(msa.sequences):
        sq.confidence = conf[i].tolist()
    msa.col_confidence = col_conf
    return msa


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
