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


def test_distributed_ensemble_matches_sequential(tmp_path):
    """Worker/merge partitioning (any number of workers) reproduces the
    sequential ensemble byte-for-byte."""
    from kalign_tpu.core.msa import Msa
    from kalign_tpu.ensemble import (ensemble_align, ensemble_merge,
                                     ensemble_worker)
    seqs, names = _seqs()

    msa_seq = Msa.from_sequences(seqs, names)
    msa_seq = ensemble_align(msa_seq, n_runs=3, consistency_anchors=5)
    ref_rows = [sq.seq for sq in msa_seq.sequences]
    ref_conf = msa_seq.col_confidence.copy()

    scratch = str(tmp_path / "ens")
    for w in range(2):  # 2 workers, 3 runs: worker 0 -> {0, 2}, 1 -> {1}
        m = Msa.from_sequences(seqs, names)
        ensemble_worker(m, w, 2, scratch, n_runs=3,
                        consistency_anchors=5)
    msa_d = Msa.from_sequences(seqs, names)
    msa_d = ensemble_merge(msa_d, scratch, n_runs=3,
                           consistency_anchors=5)
    assert [sq.seq for sq in msa_d.sequences] == ref_rows
    assert np.allclose(msa_d.col_confidence, ref_conf)


def test_distributed_ensemble_cli(tmp_path):
    """The --ensemble-worker / --ensemble-merge CLI flow produces the
    same file as the single-process --ensemble run."""
    from kalign_tpu import cli
    inp = os.path.join(DATA, "BB11001.tfa")
    out_seq = str(tmp_path / "seq.afa")
    out_dist = str(tmp_path / "dist.afa")
    scratch = str(tmp_path / "scratch")
    assert cli.main(["-i", inp, "-o", out_seq, "--ensemble", "3",
                     "-q"]) == 0
    for w in range(3):
        assert cli.main(["-i", inp, "--ensemble", "3",
                         "--ensemble-scratch", scratch,
                         "--ensemble-worker", str(w),
                         "--ensemble-workers", "3", "-q"]) == 0
    assert cli.main(["-i", inp, "-o", out_dist, "--ensemble", "3",
                     "--ensemble-scratch", scratch, "--ensemble-merge",
                     "-q"]) == 0
    assert open(out_seq).read() == open(out_dist).read()
