"""Performance smoke bounds (reference: tests/python/test_performance.py
— e.g. 10x400bp DNA must align in well under 10 s on one CPU core)."""

import time

import numpy as np

from kalign_tpu import api


def _dna(n, length, seed):
    rng = np.random.default_rng(seed)
    base = "".join(rng.choice(list("ACGT"), size=length))
    seqs = []
    for _ in range(n):
        mut = list(base)
        for _ in range(length // 20):
            p = rng.integers(0, len(mut))
            mut[p] = rng.choice(list("ACGT"))
        seqs.append("".join(mut))
    return seqs


def test_dna_smoke_time():
    seqs = _dna(10, 400, 3)
    t0 = time.time()
    rows = api.align(seqs)
    assert time.time() - t0 < 10.0
    assert len(set(map(len, rows))) == 1


def test_protein_100_smoke_time():
    from kalign_tpu.dssim import generate_test_sequences
    seqs, names = generate_test_sequences(n_seq=100, length=250, seed=4)
    t0 = time.time()
    rows = api.align(seqs, names=names)
    assert time.time() - t0 < 30.0
    assert len(set(map(len, rows))) == 1
