"""Tree-simulation + accuracy-pipeline tests (downstream/simulation.py,
downstream/accuracy.py — reference benchmarks/downstream/
{simulation,alignment_accuracy}.py equivalents)."""

import numpy as np
import pytest

from benchmarks.downstream.simulation import (Tree, birth_death_tree,
                                              simulate_family)


def test_birth_death_tree_shape():
    t = birth_death_tree(16, seed=5)
    assert t.n_leaves == 16
    assert len(t.parent) == 2 * 16 - 1        # binary: n leaves, n-1 internals
    assert (t.parent < 0).sum() == 1          # one root
    assert (t.blen[: t.n_leaves] > 0).all()
    # every non-root node's parent is an internal node
    for i, p in enumerate(t.parent):
        if p >= 0:
            assert p >= t.n_leaves
    # newick round-trip sanity: balanced parens, all leaf names present
    nwk = t.newick()
    assert nwk.count("(") == nwk.count(")") == 15
    for i in range(16):
        assert f"{i + 1}:" in nwk


def test_birth_death_target_depth():
    t = birth_death_tree(12, seed=3, target_depth=0.7)
    ch = t.children()
    depths = {}

    def walk(v, d):
        depths[v] = d
        for c in ch.get(v, []):
            walk(c, d + t.blen[c])

    walk(t.root, 0.0)
    mean = np.mean([depths[i] for i in range(t.n_leaves)])
    assert abs(mean - 0.7) < 1e-6


def test_simulated_family_true_alignment_contract():
    f = simulate_family(n_taxa=10, length=150, seed=11)
    L = len(f.true_rows[0])
    assert all(len(r) == L for r in f.true_rows)          # rectangular
    # ungapping a row gives exactly the aligner input
    assert [r.replace("-", "") for r in f.true_rows] == f.seqs
    # every column has at least one residue (genealogy keeps only
    # columns present in >= 1 leaf)
    cols = np.array([list(r) for r in f.true_rows])
    assert (cols != "-").any(axis=0).all()
    assert len(f.site_classes) == L
    assert set(f.site_classes) <= {0, 1}
    # the known topology has the right split count for a binary tree
    assert len(f.true_splits) == f.n_leaves - 3


def test_simulated_family_deterministic():
    a = simulate_family(n_taxa=8, length=100, seed=42)
    b = simulate_family(n_taxa=8, length=100, seed=42)
    assert a.true_rows == b.true_rows and a.newick == b.newick


def test_fast_sites_evolve_faster():
    f = simulate_family(n_taxa=14, length=300, seed=2,
                        target_depth=0.4, fast_multiplier=6.0)
    cols = np.array([list(r) for r in f.true_rows])
    classes = np.array(f.site_classes)
    # per-column residue diversity (distinct non-gap chars)
    def diversity(mask):
        sub = cols[:, mask]
        out = []
        for j in range(sub.shape[1]):
            c = sub[:, j]
            c = c[c != "-"]
            if len(c) >= 4:
                out.append(len(set(c.tolist())))
        return np.mean(out)

    assert diversity(classes == 1) > diversity(classes == 0)


def test_alignment_recovers_simulated_truth():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from kalign_tpu.api import align
    from kalign_tpu.core.cmp import msa_compare_detailed
    f = simulate_family(n_taxa=10, length=150, seed=7, target_depth=0.3)
    rows = align(f.seqs, names=f.names)
    d = msa_compare_detailed(f.true_rows, rows, f.names, f.names, 0.2)
    assert d.recall > 0.85                    # shallow family: easy


def test_accuracy_pipeline_quick():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from benchmarks.downstream.accuracy import (run_accuracy, summarize,
                                                FRAMEWORK_METHODS)
    records, skipped = run_accuracy(methods=["kalign", "kalign-fast"],
                                    quick=True, jobs=1)
    assert records, "no records produced"
    kinds = {r["kind"] for r in records}
    assert "sim" in kinds and "balibase" in kinds
    # sim records carry the RF column, balibase records don't
    for r in records:
        assert ("rf_true" in r) == (r["kind"] == "sim")
    s = summarize(records)
    assert set(s) == {"kalign", "kalign-fast"}
    assert "ALL" in s["kalign"]
    assert 0.0 <= s["kalign"]["ALL"]["sp"] <= 1.0
