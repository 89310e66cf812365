"""Ensemble / POAR / consensus tests (modeled on the reference
tests/kalign_ensemble_test.c)."""

import os
import numpy as np
import pytest

from kalign_tpu.core import io as kio
from kalign_tpu import api
from kalign_tpu.poar import PoarTable, pos_matrix
from kalign_tpu.consensus import build_consensus, build_consensus_py

from conftest import DATA


def _seqs():
    msa = kio.read_alignment(os.path.join(DATA, "small.fa"))
    return [sq.seq for sq in msa.sequences], [sq.name for sq in msa.sequences]


def test_ensemble_runs_and_confidence():
    seqs, names = _seqs()
    rows = api.align(seqs, names=names, ensemble=3, consistency=5)
    assert len(set(len(r) for r in rows)) == 1
    for r, s in zip(rows, seqs):
        assert r.replace("-", "") == s.replace("-", "")


def test_poar_roundtrip(tmp_path):
    seqs, names = _seqs()
    from kalign_tpu.core.msa import Msa
    from kalign_tpu.ensemble import ensemble_align
    msa = Msa.from_sequences(seqs, names)
    path = str(tmp_path / "t.poar")
    ensemble_align(msa, n_runs=3, consistency_anchors=5, save_poar=path)
    t = PoarTable.read(path)
    assert t.numseq == len(seqs)
    assert t.n_alignments == 3
    # round-trip write produces identical bytes
    path2 = str(tmp_path / "t2.poar")
    t.write(path2)
    assert open(path, "rb").read() == open(path2, "rb").read()


def test_native_consensus_matches_python():
    seqs, names = _seqs()
    from kalign_tpu.core.msa import Msa
    from kalign_tpu.ensemble import ensemble_align
    from kalign_tpu.poar import PoarTable
    msa = Msa.from_sequences(seqs, names)
    import tempfile, os as _os
    with tempfile.TemporaryDirectory() as d:
        p = _os.path.join(d, "x.poar")
        ensemble_align(msa, n_runs=3, consistency_anchors=0, save_poar=p)
        t = PoarTable.read(p)
    ungapped = [s.replace("-", "") for s in seqs]
    a = build_consensus(t, ungapped, 2)
    b = build_consensus_py(t, ungapped, 2)
    assert a == b


def test_residue_confidence_bounds():
    seqs, names = _seqs()
    from kalign_tpu.core.msa import Msa
    from kalign_tpu.ensemble import ensemble_align
    msa = Msa.from_sequences(seqs, names)
    msa = ensemble_align(msa, n_runs=3, consistency_anchors=5)
    for sq in msa.sequences:
        assert sq.confidence is not None
        arr = np.asarray(sq.confidence)
        assert np.all(arr >= 0.0) and np.all(arr <= 1.0)
    assert msa.col_confidence is not None
    assert np.all(msa.col_confidence >= 0.0)
    assert np.all(msa.col_confidence <= 1.0)
