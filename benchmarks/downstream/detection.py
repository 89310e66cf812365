"""Homology-detection impact: a profile built from a better alignment
separates family members from decoys better (reference:
benchmarks/downstream/hmmer_detection.py, without the hmmer binary
dependency — a log-odds PSSM with Dirichlet pseudocounts stands in for
the profile HMM)."""

import numpy as np

_ALPHA = "ACDEFGHIKLMNPQRSTVWY"
_BG = np.array([0.075520, 0.016973, 0.053029, 0.063204, 0.040762,
                0.068448, 0.022406, 0.057284, 0.059398, 0.093399,
                0.023569, 0.045293, 0.049262, 0.040231, 0.051573,
                0.072214, 0.057454, 0.065252, 0.012513, 0.031985])
_BG = _BG / _BG.sum()
_IDX = {c: i for i, c in enumerate(_ALPHA)}


def build_pssm(aligned_rows, min_occupancy=0.5, pseudo=1.0):
    """Log-odds PSSM over the alignment's well-occupied columns."""
    n = len(aligned_rows)
    L = len(aligned_rows[0])
    counts = np.zeros((L, 20))
    occ = np.zeros(L)
    for row in aligned_rows:
        for j, ch in enumerate(row):
            k = _IDX.get(ch)
            if k is not None:
                counts[j, k] += 1
                occ[j] += 1
    keep = occ >= min_occupancy * n
    counts = counts[keep]
    freqs = (counts + pseudo * _BG) / (counts.sum(axis=1, keepdims=True)
                                       + pseudo)
    return np.log(freqs / _BG)          # [L_core, 20]


def score_sequence(pssm, seq):
    """Best ungapped-window PSSM score, length-normalized."""
    codes = np.array([_IDX.get(c, -1) for c in seq])
    L = pssm.shape[0]
    n = len(codes)
    if n == 0 or L == 0:
        return 0.0
    best = -np.inf
    if n >= L:
        for off in range(0, n - L + 1):
            w = codes[off:off + L]
            ok = w >= 0
            s = pssm[np.arange(L)[ok], w[ok]].sum()
            if s > best:
                best = s
    else:
        for off in range(0, L - n + 1):
            ok = codes >= 0
            s = pssm[off + np.arange(n)[ok], codes[ok]].sum()
            if s > best:
                best = s
    return float(best) / L


def roc_auc(pos_scores, neg_scores):
    """Exact AUC by rank statistic."""
    pos = np.asarray(pos_scores)
    neg = np.asarray(neg_scores)
    total = 0.0
    for p in pos:
        total += (p > neg).sum() + 0.5 * (p == neg).sum()
    return float(total / (len(pos) * len(neg)))


def detection_auc(train_rows, test_seqs, rng=None, n_decoys_per=2):
    """AUC separating held-out family members from shuffled decoys
    using a profile built from the tool's alignment of the training
    split.  Higher = the alignment preserved more family signal."""
    rng = rng or np.random.default_rng(0)
    pssm = build_pssm(train_rows)
    pos = [score_sequence(pssm, s) for s in test_seqs]
    neg = []
    for s in test_seqs:
        for _ in range(n_decoys_per):
            sh = list(s)
            rng.shuffle(sh)
            neg.append(score_sequence(pssm, "".join(sh)))
    return {"auc": round(roc_auc(pos, neg), 4),
            "n_pos": len(pos), "n_neg": len(neg),
            "core_cols": int(pssm.shape[0])}
