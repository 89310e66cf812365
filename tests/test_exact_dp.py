"""Differential tests for the bit-exact device DP (tpu/exact.py) against
the native single-merge oracle (kt_run_align_single): identical raw
paths and meetup margin statistics across all three operand modes, with
consistency bonuses, VSM offsets and flip perturbation.

Reference semantics: aln_controller.c:21-436, aln_seqseq.c:241-419."""

import numpy as np
import pytest

import kalign_tpu.native as native
from kalign_tpu.core import params as P
from kalign_tpu.tpu.exact import ExactAligner


@pytest.fixture(scope="module")
def setup():
    L = native.lib()
    ap = P.aln_param_init(P.BIOTYPE_PROTEIN, P.KALIGN_TYPE_PROTEIN,
                          -1.0, -1.0, -1.0, 1)
    subm = np.ascontiguousarray(ap.subm.astype(np.float32).reshape(-1))
    return L, subm, (np.float32(ap.gpo), np.float32(ap.gpe),
                     np.float32(ap.tgpe))


def _leaf(L, subm, g, seq):
    out = np.zeros((len(seq) + 2) * 64, np.float32)
    L.kt_leaf_profile(subm, g[0], g[1], g[2], seq, len(seq), out)
    return out


def _merged(L, subm, g, rng, n):
    a = rng.integers(0, 23, n).astype(np.uint8)
    b = rng.integers(0, 23, n).astype(np.uint8)
    steps = np.zeros(n + 2, np.int32)
    steps[0] = n
    steps[n + 1] = 3
    out = np.zeros((n + 2) * 64, np.float32)
    L.kt_merge_profiles(_leaf(L, subm, g, a), _leaf(L, subm, g, b),
                        subm, g[0], g[1], g[2], steps, 1, 1, 0.0, out)
    return out


@pytest.mark.parametrize("mode", [0, 1, 2])
def test_exact_matches_native_oracle(setup, mode):
    L, subm, g = setup
    gpo, gpe, tgpe = g
    rng = np.random.default_rng(42 + mode)
    for trial in range(12):
        la = int(rng.integers(1 if mode == 0 else 2, 50))
        lb = int(rng.integers(la, 70))
        s1 = s2 = p1 = p2 = None
        s1p = s2p = p1p = p2p = None
        sip = 0
        if mode == 0:
            s1 = rng.integers(0, 23, la).astype(np.uint8)
            s2 = rng.integers(0, 23, lb).astype(np.uint8)
            s1p, s2p = s1.ctypes.data, s2.ctypes.data
        else:
            p1 = _merged(L, subm, g, rng, la)
            L.kt_scale_gaps(p1, la, 2 if mode == 2 else 1)
            p1p = p1.ctypes.data
            if mode == 1:
                s2 = rng.integers(0, 23, lb).astype(np.uint8)
                s2p = s2.ctypes.data
                sip = 2
            else:
                p2 = _merged(L, subm, g, rng, lb)
                L.kt_scale_gaps(p2, lb, 2)
                p2p = p2.ctypes.data
        soff = np.float32(rng.choice([0.0, 0.9]))
        bonus = bptr = None
        if trial % 3 == 0:
            bonus = (rng.random(la * lb + 1) * 0.5).astype(np.float32)
            bptr = bonus.ctypes.data
        if trial % 4 == 3:
            fthr, ftr, fstr = np.float32(2.5), 1 + trial % 3, 4
        else:
            fthr, ftr, fstr = np.float32(0.0), 0, 1

        path_ref = np.full(max(la, lb) + 2, -1, np.int32)
        info_ref = np.zeros(3, np.float32)
        L.kt_run_align_single(mode, s1p, s2p, p1p, p2p, la, lb, sip,
                              subm, gpo, gpe, tgpe, soff, bptr, lb,
                              fthr, ftr, fstr, 0, path_ref, info_ref)

        aln = ExactAligner(mode, s1, s2, p1, p2, la, lb, sip,
                           subm.reshape(23, 23) if mode == 0 else None,
                           gpo, gpe, tgpe, soff, bonus, fthr, ftr, fstr)
        path_tpu = np.full(la + 2, -1, np.int32)
        msum, mcount, _ = aln.run(path_tpu)

        assert np.array_equal(path_ref[:la + 2], path_tpu), \
            f"path mismatch mode={mode} trial={trial}"
        assert np.float32(msum) == info_ref[0]
        assert mcount == int(info_ref[1])


def test_failing_hook_raises_cleanly():
    """A DP backend failure (device OOM, JAX error) must surface as a
    clean Python error — never as native memory corruption from the
    all-(-1) placeholder path (kt_align.cpp invoke_dp bail-outs)."""
    import os

    import kalign_tpu.native as native
    from kalign_tpu.core import io as kio
    from kalign_tpu import engine as E
    from conftest import DATA

    calls = {"n": 0}

    def broken_hook(*args):
        calls["n"] += 1
        return 1  # simulate backend failure

    cb = native.DP_HOOK_TYPE(broken_hook)
    native.set_dp_hook(cb)
    try:
        msa = kio.read_inputs([os.path.join(DATA, "small.fa")])
        msa.quiet = True
        with pytest.raises(RuntimeError):
            E.align_msa(msa, consistency_anchors=5)
        assert calls["n"] >= 1
        # the error path must not poison later runs
        native.set_dp_hook(None)
        msa2 = kio.read_inputs([os.path.join(DATA, "small.fa")])
        msa2.quiet = True
        out = E.align_msa(msa2, consistency_anchors=5)
        assert out.alnlen > 0
    finally:
        native.set_dp_hook(None)


def test_failing_hook_without_consistency():
    """Same, on the progressive pass itself (consistency off)."""
    import os

    import kalign_tpu.native as native
    from kalign_tpu.core import io as kio
    from kalign_tpu import engine as E
    from conftest import DATA

    cb = native.DP_HOOK_TYPE(lambda *a: 1)
    native.set_dp_hook(cb)
    try:
        msa = kio.read_inputs([os.path.join(DATA, "small.fa")])
        msa.quiet = True
        with pytest.raises(RuntimeError):
            E.align_msa(msa, consistency_anchors=0)
    finally:
        native.set_dp_hook(None)


def test_bonus_stride_differs_from_width(setup):
    """The bonus matrix stride is an independent ABI parameter
    (kt_dp_fn bstride); verify the device DP honors it when it differs
    from the DP width."""
    L, subm, g = setup
    gpo, gpe, tgpe = g
    rng = np.random.default_rng(7)
    la, lb, stride = 30, 44, 51
    s1 = rng.integers(0, 23, la).astype(np.uint8)
    s2 = rng.integers(0, 23, lb).astype(np.uint8)
    bonus = (rng.random(la * stride + 1) * 0.5).astype(np.float32)

    path_ref = np.full(max(la, lb) + 2, -1, np.int32)
    info_ref = np.zeros(3, np.float32)
    L.kt_run_align_single(0, s1.ctypes.data, s2.ctypes.data, None, None,
                          la, lb, 0, subm, gpo, gpe, tgpe, 0.0,
                          bonus.ctypes.data, stride, 0.0, 0, 1, 0,
                          path_ref, info_ref)

    from kalign_tpu.tpu.exact import ExactAligner
    aln = ExactAligner(0, s1, s2, None, None, la, lb, 0,
                       subm.reshape(23, 23), gpo, gpe, tgpe, 0.0, bonus,
                       bstride=stride)
    path_tpu = np.full(la + 2, -1, np.int32)
    msum, mcount, _ = aln.run(path_tpu)
    assert np.array_equal(path_ref[:la + 2], path_tpu)
    assert np.float32(msum) == info_ref[0]


def test_pairwise_batch_backend_used_and_exact():
    """The consistency pre-pass must route ALL NxK anchor pairwise
    alignments through ONE batched device callback (SURVEY 2.2) and
    stay byte-identical (golden: BB12006 default mode)."""
    import os

    import kalign_tpu.tpu.exact as X
    from kalign_tpu.core import io as kio
    from kalign_tpu import engine as E
    from conftest import DATA, GOLDEN

    stats = {"batches": 0, "pairs": 0}
    orig = X.ExactPairBatch.run

    def patched(self, paths):
        stats["batches"] += 1
        stats["pairs"] += len(self.pairs)
        return orig(self, paths)

    X.ExactPairBatch.run = patched
    try:
        msa = kio.read_inputs([os.path.join(DATA, "BB12006.tfa")])
        msa.quiet = True
        out = kio.write_fasta(E.align_msa(msa, consistency_anchors=5,
                                          engine="tpu"))
    finally:
        X.ExactPairBatch.run = orig
    ref = open(os.path.join(GOLDEN, "BB12006.default.afa")).read()
    assert out == ref
    assert stats["batches"] >= 1
    # BB12006 has 4 sequences -> K = 4 anchors -> 4*4 - 4 identity pairs
    assert stats["pairs"] == 12


@pytest.mark.slow
@pytest.mark.parametrize("mode", [0, 1, 2])
def test_exact_matches_native_oracle_large(setup, mode):
    """Deeper-recursion differential: larger randomized problems hit
    window geometries (many recursion depths, uneven meets, long gap
    runs) that the small-size trials cannot."""
    L, subm, g = setup
    gpo, gpe, tgpe = g
    rng = np.random.default_rng(77 + mode)
    for trial in range(4):
        la = int(rng.integers(120, 260))
        lb = int(rng.integers(la, 380))
        s1 = s2 = p1 = p2 = None
        s1p = s2p = p1p = p2p = None
        sip = 0
        if mode == 0:
            s1 = rng.integers(0, 23, la).astype(np.uint8)
            s2 = rng.integers(0, 23, lb).astype(np.uint8)
            s1p, s2p = s1.ctypes.data, s2.ctypes.data
        else:
            p1 = _merged(L, subm, g, rng, la)
            L.kt_scale_gaps(p1, la, 2 if mode == 2 else 1)
            p1p = p1.ctypes.data
            if mode == 1:
                s2 = rng.integers(0, 23, lb).astype(np.uint8)
                s2p = s2.ctypes.data
                sip = 2
            else:
                p2 = _merged(L, subm, g, rng, lb)
                L.kt_scale_gaps(p2, lb, 2)
                p2p = p2.ctypes.data
        soff = np.float32(rng.choice([0.0, 1.1]))
        fthr, ftr, fstr = (np.float32(2.0), 1 + trial % 4, 4) \
            if trial % 2 else (np.float32(0.0), 0, 1)

        path_ref = np.full(max(la, lb) + 2, -1, np.int32)
        info_ref = np.zeros(3, np.float32)
        L.kt_run_align_single(mode, s1p, s2p, p1p, p2p, la, lb, sip,
                              subm, gpo, gpe, tgpe, soff, None, lb,
                              fthr, ftr, fstr, 0, path_ref, info_ref)

        from kalign_tpu.tpu.exact import ExactAligner
        aln = ExactAligner(mode, s1, s2, p1, p2, la, lb, sip,
                           subm.reshape(23, 23) if mode == 0 else None,
                           gpo, gpe, tgpe, soff, None, fthr, ftr, fstr)
        path_tpu = np.full(la + 2, -1, np.int32)
        msum, mcount, _ = aln.run(path_tpu)
        assert np.array_equal(path_ref[:la + 2], path_tpu), \
            f"mode={mode} trial={trial} la={la} lb={lb}"
        assert np.float32(msum) == info_ref[0]
        assert mcount == int(info_ref[1])


@pytest.mark.parametrize("mode", [0, 2])
def test_flip_trials_lockstep_matches_sequential(setup, mode):
    """run_flip_trials (K trials lockstep, shared grids) must reproduce
    each trial's sequential ExactAligner.run exactly — paths, margins,
    counts."""
    from kalign_tpu.tpu.exact import ExactAligner, run_flip_trials

    L, subm, g = setup
    gpo, gpe, tgpe = g
    rng = np.random.default_rng(5 + mode)
    la, lb = 40, 55
    if mode == 0:
        s1 = rng.integers(0, 23, la).astype(np.uint8)
        s2 = rng.integers(0, 23, lb).astype(np.uint8)
        p1 = p2 = None
    else:
        s1 = s2 = None
        p1 = _merged(L, subm, g, rng, la)
        L.kt_scale_gaps(p1, la, 2)
        p2 = _merged(L, subm, g, rng, lb)
        L.kt_scale_gaps(p2, lb, 2)
    sm = subm.reshape(23, 23) if mode == 0 else None

    def mk(trial):
        return ExactAligner(mode, s1, s2, p1, p2, la, lb, 0, sm,
                            gpo, gpe, tgpe, 0.0, None,
                            np.float32(2.5), trial, 4)

    K = 4
    seq_paths = []
    seq_stats = []
    for k in range(1, K + 1):
        aln = mk(k)
        path = np.full(la + 2, -1, np.int32)
        msum, mcount, _ = aln.run(path)
        seq_paths.append(path)
        seq_stats.append((msum, mcount))

    aligners = [mk(k) for k in range(1, K + 1)]
    lock_paths = [np.full(la + 2, -1, np.int32) for _ in range(K)]
    lock_stats = run_flip_trials(aligners, lock_paths)

    for k in range(K):
        assert np.array_equal(seq_paths[k], lock_paths[k]), f"trial {k+1}"
        assert np.float32(lock_stats[k][0]) == np.float32(seq_stats[k][0])
        assert lock_stats[k][1] == seq_stats[k][1]
