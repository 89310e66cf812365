"""Smoke + semantics tests for the downstream-impact suite
(benchmarks/downstream): NJ/Robinson-Foulds machinery, tree-structured
family simulation, PSSM detection, confidence calibration."""

import numpy as np

from benchmarks.downstream.phylo import (evolve_family, neighbor_joining,
                                         p_distance_matrix,
                                         phylo_accuracy_vs_true,
                                         robinson_foulds)
from benchmarks.downstream.detection import (build_pssm, detection_auc,
                                             roc_auc, score_sequence)
from benchmarks.downstream.calibration import (column_correctness,
                                               confidence_calibration)


def test_nj_recovers_clean_tree():
    """A noiseless additive distance matrix of a balanced quartet tree
    must be reconstructed exactly."""
    #   ((0,1),(2,3)) with unit branches
    dm = np.array([[0, 2, 4, 4],
                   [2, 0, 4, 4],
                   [4, 4, 0, 2],
                   [4, 4, 2, 0]], float)
    splits = neighbor_joining(dm)
    assert splits == {frozenset({0, 1})}
    assert robinson_foulds(splits, {frozenset({0, 1})}, 4) == 0.0


def test_evolved_family_tree_recoverable():
    seqs, true_splits, n = evolve_family(depth=3, length=150, seed=1)
    assert len(seqs) == 8 and n == 8
    from kalign_tpu.api import align
    rows = align(seqs, names=[str(i) for i in range(8)])
    r = phylo_accuracy_vs_true(rows, true_splits, n)
    assert r["rf_true"] <= 0.4  # most true splits recovered


def test_pssm_detection_separates_decoys():
    seqs, true_splits, _ = evolve_family(depth=4, length=150, seed=2)
    from kalign_tpu.api import align
    rows = align(seqs[:12], names=[str(i) for i in range(12)])
    r = detection_auc(rows, seqs[12:], rng=np.random.default_rng(0))
    assert r["auc"] > 0.8


def test_roc_auc_basics():
    assert roc_auc([1.0, 2.0], [0.0, 0.5]) == 1.0
    assert roc_auc([0.0], [1.0]) == 0.0
    assert roc_auc([1.0], [1.0]) == 0.5


def test_column_correctness_and_calibration():
    gold = ["AC-D", "A-CD"]
    # test alignment pairs the C's together (wrong per gold)
    test = ["ACD", "ACD"]
    corr = column_correctness(test, gold)
    assert corr[0] == 1.0        # A-A pair correct
    assert corr[1] == 0.0        # C-C pair not paired in gold
    assert corr[2] == 1.0
    cal = confidence_calibration([0.9, 0.2, 0.8], test, gold, n_bins=2)
    assert cal["brier"] is not None
    assert len(cal["bins"]) >= 1


def test_selection_dnds_detects_selected_sites():
    from benchmarks.downstream.selection import (simulate_selected_family,
                                                 selection_detection)
    dna, mask, gold, ref_sites = simulate_selected_family(seed=3)
    assert all(g.replace("-", "") == s for g, s in zip(gold, dna))
    r = selection_detection(gold, mask, ref_sites)
    assert r["auc"] is not None and r["auc"] > 0.8
    assert r["mean_dnds_selected"] > r["mean_dnds_neutral"]


def test_selection_tool_alignment_end_to_end():
    from benchmarks.downstream.selection import (simulate_selected_family,
                                                 selection_detection)
    from kalign_tpu.api import align
    dna, mask, gold, ref_sites = simulate_selected_family(seed=4)
    rows = align(dna, names=[str(i) for i in range(len(dna))])
    r = selection_detection(rows, mask, ref_sites)
    assert r["auc"] is not None and r["auc"] > 0.6
