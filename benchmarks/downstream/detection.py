"""Homology-detection impact: a profile built from a better alignment
separates family members from decoys better (reference:
benchmarks/downstream/hmmer_detection.py).

Two backends:

  * "hmmer" — the real thing, used automatically when hmmbuild +
    hmmsearch are on PATH (the reference suite's dependency): profile
    HMM from the tool's training alignment, full-sequence bit scores
    from hmmsearch --tblout.
  * "pssm"  — dependency-free stand-in (log-odds PSSM with Dirichlet
    pseudocounts), used when hmmer is not installed so the suite always
    runs.
"""

import os
import shutil
import subprocess
import tempfile

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


def hmmer_available():
    return (shutil.which("hmmbuild") is not None
            and shutil.which("hmmsearch") is not None
            and not os.environ.get("KALIGN_DOWNSTREAM_NO_HMMER"))


def _hmmer_scores(train_rows, seqs, timeout=600):
    """Full-sequence bit scores of `seqs` against a profile HMM built
    from the training alignment.  Sequences without a reported hit get
    the floor score (below every hit)."""
    with tempfile.TemporaryDirectory(prefix="kal_hmmer_") as d:
        aln = os.path.join(d, "train.afa")
        with open(aln, "w") as fh:
            for i, row in enumerate(train_rows):
                fh.write(f">t{i}\n{row}\n")
        hmm = os.path.join(d, "prof.hmm")
        subprocess.run(["hmmbuild", "--amino", hmm, aln], check=True,
                       capture_output=True, timeout=timeout)
        db = os.path.join(d, "db.fa")
        with open(db, "w") as fh:
            for i, s in enumerate(seqs):
                fh.write(f">q{i}\n{s}\n")
        tbl = os.path.join(d, "hits.tbl")
        subprocess.run(["hmmsearch", "--tblout", tbl, "--max", "-E",
                        "1000000", hmm, db], check=True,
                       capture_output=True, timeout=timeout)
        hits = {}
        with open(tbl) as fh:
            for line in fh:
                if line.startswith("#"):
                    continue
                parts = line.split()
                if len(parts) > 5:
                    # tblout: target, t-acc, query, q-acc, E, SCORE, ...
                    hits[parts[0]] = float(parts[5])
        floor = min(hits.values(), default=0.0) - 100.0
        return [hits.get(f"q{i}", floor) for i in range(len(seqs))]


def detection_auc(train_rows, test_seqs, rng=None, n_decoys_per=2,
                  backend="auto"):
    """AUC separating held-out family members from shuffled decoys
    using a profile built from the tool's alignment of the training
    split.  Higher = the alignment preserved more family signal.

    backend: "hmmer" (real hmmbuild/hmmsearch), "pssm" (dependency-free
    stand-in), or "auto" (hmmer when installed)."""
    rng = rng or np.random.default_rng(0)
    if backend == "auto":
        backend = "hmmer" if hmmer_available() else "pssm"
    decoys = []
    for s in test_seqs:
        for _ in range(n_decoys_per):
            sh = list(s)
            rng.shuffle(sh)
            decoys.append("".join(sh))
    if backend == "hmmer":
        scores = _hmmer_scores(train_rows, list(test_seqs) + decoys)
        pos = scores[:len(test_seqs)]
        neg = scores[len(test_seqs):]
        return {"auc": round(roc_auc(pos, neg), 4), "backend": "hmmer",
                "n_pos": len(pos), "n_neg": len(neg)}
    pssm = build_pssm(train_rows)
    pos = [score_sequence(pssm, s) for s in test_seqs]
    neg = [score_sequence(pssm, s) for s in decoys]
    return {"auc": round(roc_auc(pos, neg), 4), "backend": "pssm",
            "n_pos": len(pos), "n_neg": len(neg),
            "core_cols": int(pssm.shape[0])}
