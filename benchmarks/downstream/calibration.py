"""Confidence calibration: ensemble per-column confidence should track
actual per-column correctness against the simulated ground truth
(reference: benchmarks/downstream/calibration.py)."""

import numpy as np


def column_correctness(test_rows, gold_rows):
    """Per test-alignment column: fraction of its residue pairs that
    are also paired in the gold alignment (1.0 = fully correct column,
    gap-only / single-residue columns -> nan)."""
    n = len(test_rows)
    # residue -> gold column index per sequence
    gold_col = []
    for r in gold_rows:
        cols = [j for j, ch in enumerate(r) if ch != "-"]
        gold_col.append(cols)
    tcols = len(test_rows[0])
    correct = np.full(tcols, np.nan)
    pos = [0] * n
    for c in range(tcols):
        members = []
        for i in range(n):
            if test_rows[i][c] != "-":
                members.append((i, pos[i]))
                pos[i] += 1
        if len(members) < 2:
            continue
        pairs = 0
        good = 0
        for x in range(len(members)):
            i, pi = members[x]
            gi = gold_col[i][pi]
            for y in range(x + 1, len(members)):
                j, pj = members[y]
                pairs += 1
                if gold_col[j][pj] == gi:
                    good += 1
        correct[c] = good / pairs
    return correct


def confidence_calibration(col_confidence, test_rows, gold_rows,
                           n_bins=5):
    """Bin columns by reported confidence; report mean actual
    correctness per bin + the confidence-weighted Brier score and the
    confidence/correctness Pearson correlation."""
    conf = np.asarray(col_confidence, float)
    corr = column_correctness(test_rows, gold_rows)
    ok = ~np.isnan(corr)
    conf, corr = conf[ok], corr[ok]
    if len(conf) == 0:
        return {"bins": [], "brier": None, "pearson": None}
    edges = np.linspace(0, 1, n_bins + 1)
    bins = []
    for k in range(n_bins):
        sel = (conf >= edges[k]) & (conf <= edges[k + 1]
                                    if k == n_bins - 1 else
                                    conf < edges[k + 1])
        if sel.sum():
            bins.append({"lo": round(float(edges[k]), 2),
                         "hi": round(float(edges[k + 1]), 2),
                         "n": int(sel.sum()),
                         "mean_conf": round(float(conf[sel].mean()), 4),
                         "mean_correct": round(float(corr[sel].mean()), 4)})
    brier = float(np.mean((conf - corr) ** 2))
    if conf.std() > 0 and corr.std() > 0:
        pearson = float(np.corrcoef(conf, corr)[0, 1])
    else:
        pearson = None
    return {"bins": bins, "brier": round(brier, 4),
            "pearson": None if pearson is None else round(pearson, 4)}
