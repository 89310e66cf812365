"""Statistics for the benchmark analysis layer.

The reference paper's headline accuracy claim is statistical:
"no significant difference to MUSCLE / Clustal-Omega (t-test)" on
BAliBASE categories (/root/reference/doc/paper/kalign3.org:72), and
its downstream suite adjudicates tool comparisons with paired Wilcoxon
+ Holm-Bonferroni (/root/reference/benchmarks/downstream/utils.py:338,
hmmer_detection.py:952-987).  This module provides the same decisions
for benchmarks/analysis.py: paired tests with effect sizes and
family-wise correction over a table of comparisons.
"""

from __future__ import annotations

import numpy as np


def cliffs_delta(a, b) -> float:
    """Paired Cliff's delta: (#a>b - #a<b) / n — a sign-based effect
    size in [-1, 1] that is robust to the score scale."""
    a = np.asarray(a, float)
    b = np.asarray(b, float)
    n = len(a)
    if n == 0:
        return 0.0
    return float((np.sum(a > b) - np.sum(a < b)) / n)


def wilcoxon_paired(a, b) -> dict:
    """Wilcoxon signed-rank test on paired observations.

    Returns {statistic, p_value, cliffs_delta, n_nonzero}.  Degenerate
    inputs (all differences zero, or n < 2) return p_value 1.0 — "no
    evidence of a difference" is the right call for identical outputs,
    which happen routinely here (byte-parity engines)."""
    a = np.asarray(a, float)
    b = np.asarray(b, float)
    d = a - b
    nz = int(np.sum(d != 0))
    out = dict(statistic=0.0, p_value=1.0, cliffs_delta=cliffs_delta(a, b),
               n_nonzero=nz)
    if nz < 2:
        return out
    from scipy.stats import wilcoxon
    try:
        stat, p = wilcoxon(a, b)
    except ValueError:
        return out
    out["statistic"] = float(stat)
    out["p_value"] = float(p)
    return out


def paired_ttest(a, b) -> dict:
    """Paired t-test (the reference paper's test).  Degenerate inputs
    return p_value 1.0."""
    a = np.asarray(a, float)
    b = np.asarray(b, float)
    d = a - b
    if len(d) < 2 or np.allclose(d.std(ddof=1), 0.0):
        return dict(t=0.0, p_value=1.0, mean_diff=float(d.mean())
                    if len(d) else 0.0)
    from scipy.stats import ttest_rel
    t, p = ttest_rel(a, b)
    return dict(t=float(t), p_value=float(p), mean_diff=float(d.mean()))


def holm_bonferroni(p_values) -> list:
    """Step-down Holm adjustment; returns adjusted p-values in input
    order (monotone, capped at 1)."""
    m = len(p_values)
    if m == 0:
        return []
    order = sorted(range(m), key=lambda i: p_values[i])
    adjusted = [0.0] * m
    running = 0.0
    for rank, idx in enumerate(order):
        running = max(running, p_values[idx] * (m - rank))
        adjusted[idx] = min(running, 1.0)
    return adjusted


def bootstrap_ci(values, n_bootstrap: int = 10000, alpha: float = 0.05,
                 seed: int = 42) -> tuple:
    """Percentile bootstrap CI for the mean (seeded, vectorized)."""
    arr = np.asarray(values, float)
    if len(arr) == 0:
        return (float("nan"), float("nan"))
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, len(arr), size=(n_bootstrap, len(arr)))
    means = arr[idx].mean(axis=1)
    return (float(np.percentile(means, 100 * alpha / 2)),
            float(np.percentile(means, 100 * (1 - alpha / 2))))
