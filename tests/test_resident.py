"""Differential tests for the device-resident progressive pass
(kalign_tpu/tpu/resident.py) against the host-assembled tpu-fast
engine.

The resident pass keeps profiles and gap state on device between guide
-tree levels; its per-merge semantics (assembly values, DP, merge
arithmetic, weave integer ops) mirror the host-assembled path exactly,
so on a fixed backend the outputs are byte-identical today.  The weave
kernel additionally gets a property test against the numpy
implementation (the reference's weave_alignment.c semantics).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp


def _run(resident, path, monkeypatch):
    from kalign_tpu.core import io as kio
    from kalign_tpu import engine as E
    if resident:
        monkeypatch.delenv("KALIGN_TPU_NO_RESIDENT", raising=False)
    else:
        monkeypatch.setenv("KALIGN_TPU_NO_RESIDENT", "1")
    m = kio.read_alignment(path)
    m.quiet = True
    out = E.align_msa(m, consistency_anchors=0, engine="tpu-fast")
    return out


@pytest.mark.parametrize("case", ["BB11001", "BB12006"])
def test_resident_matches_host_assembled(case, monkeypatch, tmp_path):
    from kalign_tpu.core import io as kio
    from conftest import DATA
    path = os.path.join(DATA, case + ".tfa")
    a = kio.write_fasta(_run(False, path, monkeypatch))
    b = kio.write_fasta(_run(True, path, monkeypatch))
    assert a == b


def test_resident_preserves_residues(monkeypatch):
    from kalign_tpu.core import io as kio
    from conftest import DATA
    path = os.path.join(DATA, "BB12006.tfa")
    out = _run(True, path, monkeypatch)
    raw = kio.read_alignment(path)
    src = {s.name: s.seq.replace("-", "") for s in raw.sequences}
    for s, row in zip(out.sequences, out.aligned_rows()):
        assert "".join(ch for ch in row if ch != "-") == src[s.name]


def test_resident_weave_matches_numpy():
    """Property test: _weave_apply + _bucket_gap_profiles reproduce
    weave_steps (weave_alignment.c:41-112) exactly on random valid
    paths and gap states."""
    from kalign_tpu.tpu import resident as R
    from kalign_tpu.tpu.profile import weave_steps
    import copy

    rng = np.random.default_rng(7)

    def rand_gaps(prof_len):
        lm = int(rng.integers(1, prof_len + 1))
        g = np.zeros(lm + 1, np.int64)
        for _ in range(prof_len - lm):
            g[rng.integers(0, lm + 1)] += 1
        return lm, g.tolist()

    for _ in range(60):
        la = int(rng.integers(3, 15))
        lb = int(rng.integers(3, 15))
        steps, i, j = [], 0, 0
        while i < la or j < lb:
            c = rng.integers(0, 3)
            if c == 0 and i < la and j < lb:
                steps.append(0); i += 1; j += 1
            elif c == 1 and j < lb:
                steps.append(1); j += 1
            elif i < la:
                steps.append(2); i += 1
        steps = np.asarray(steps, np.int8)
        n = len(steps)
        lens_m, gaps = [], []
        for prof_len, count in ((la, 2), (lb, 1)):
            for _ in range(count):
                lm, g = rand_gaps(prof_len)
                lens_m.append(lm)
                gaps.append(g)
        g_np = copy.deepcopy(gaps)
        weave_steps(steps, g_np, [0, 1], [2])

        S = n + 3
        steps_pad = np.full((1, S), 3, np.int8)
        steps_pad[0, :n] = steps
        gap_ab = R._bucket_gap_profiles(jnp.asarray(steps_pad),
                                        jnp.asarray([n], dtype=jnp.int32))
        Lg = max(lens_m) + 1
        gbuf = np.zeros((3, Lg), np.int32)
        for s in range(3):
            gbuf[s, :len(gaps[s])] = gaps[s]
        out = np.asarray(R._weave_apply(
            jnp.asarray(gbuf), gap_ab,
            jnp.asarray(np.asarray([0, 1, 2], np.int32)),
            jnp.asarray(np.asarray([0, 0, 1], np.int32)),
            jnp.asarray(np.asarray(lens_m, np.int32))))
        for s in range(3):
            assert out[s, :len(g_np[s])].tolist() == g_np[s]


def test_resident_quality_on_simulated_family(monkeypatch):
    """Resident and host-assembled paths produce equally good
    alignments on a DSSim family with known ground truth."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from benchmarks.datasets import dssim_cases, materialize
    from benchmarks import scoring

    case = [c for c in dssim_cases() if c.name == "prot-medium-n16-L150"][0]
    seqs, names, gold_rows, gold_names = materialize(case)
    tcs = {}
    for res in (False, True):
        if res:
            monkeypatch.delenv("KALIGN_TPU_NO_RESIDENT", raising=False)
        else:
            monkeypatch.setenv("KALIGN_TPU_NO_RESIDENT", "1")
        r = scoring.score_kalign(seqs, names, gold_rows, gold_names,
                                 "fast", "tpu-fast", 1)
        tcs[res] = r["tc"]
    assert tcs[True] >= tcs[False] - 1e-9


@pytest.mark.parametrize("case", ["BB12006", "BB30014"])
def test_resident_consistency_mode_matches(case, monkeypatch):
    """DEFAULT mode (consistency_anchors=5): the resident pass votes
    per-merge bonus arrays on device from the resident gap state and
    must reproduce the host-assembled engine byte-for-byte."""
    from kalign_tpu.core import io as kio
    from kalign_tpu import engine as E
    from conftest import DATA
    monkeypatch.setenv("KALIGN_TPU_NO_AUTOROUTE", "1")
    path = os.path.join(DATA, case + ".tfa")
    outs = {}
    for res in (False, True):
        if res:
            monkeypatch.delenv("KALIGN_TPU_NO_RESIDENT", raising=False)
        else:
            monkeypatch.setenv("KALIGN_TPU_NO_RESIDENT", "1")
        m = kio.read_alignment(path)
        m.quiet = True
        outs[res] = kio.write_fasta(E.align_msa(m, engine="tpu-fast"))
    assert outs[True] == outs[False]


def test_node_positions_device_matches_host():
    """Property test: _node_positions_device == ConsistencyTable's host
    voting (incl. the cols-side last-wins dedup) on random gap states
    and position maps."""
    from kalign_tpu.tpu import resident as R
    from kalign_tpu.tpu.consistency import ConsistencyTable

    rng = np.random.default_rng(11)
    for _ in range(25):
        n = int(rng.integers(3, 8))
        K = int(rng.integers(1, 4))
        Lt = int(rng.integers(6, 12))
        lens = rng.integers(3, Lt, n)
        pos_maps = []
        for i in range(n):
            for k in range(K):
                m = np.full(lens[i], -1, np.int64)
                p = 0
                for r in range(lens[i]):
                    if rng.random() < 0.7 and p < Lt:
                        m[r] = p
                        p += int(rng.integers(1, 3))
                pos_maps.append(m)
        ct = ConsistencyTable(K=K, weight=2.0, anchor_ids=list(range(K)),
                              pos_maps=pos_maps, numseq=n)
        members = list(rng.permutation(n)[:rng.integers(1, n + 1)])
        Lpn = int(max(lens[m] for m in members) + rng.integers(0, 4))
        gaps_all = []
        for i in range(n):
            gaps_all.append([0] * (int(lens[i]) + 1))
        for m in members:
            extra = Lpn - lens[m]
            g = np.zeros(lens[m] + 1, np.int64)
            for _ in range(extra):
                g[rng.integers(0, lens[m] + 1)] += 1
            gaps_all[m] = g.tolist()
        apos_h, conf_h = ct._node_positions_all(
            0, Lpn, {0: members}, {0: 2}, gaps_all, lens)
        Lg = int(lens.max()) + 5
        gbuf = np.zeros((n, Lg), np.int32)
        for i in range(n):
            gbuf[i, :len(gaps_all[i])] = gaps_all[i]
        pmap = np.full((n, K, Lt), -1, np.int32)
        for i in range(n):
            for k in range(K):
                pmap[i, k, :lens[i]] = pos_maps[i * K + k]
        pos_d, conf_d = R._node_positions_device(
            jnp.asarray(gbuf), jnp.asarray(pmap),
            jnp.asarray(lens.astype(np.int32)),
            jnp.asarray(np.asarray(members, np.int32)),
            jnp.asarray(np.zeros(len(members), np.int32)),
            jnp.asarray(np.arange(len(members), dtype=np.int32)),
            n_nodes=1, Lp=Lpn, K=K, dedup=False)
        assert np.array_equal(apos_h.astype(np.int64),
                              np.asarray(pos_d)[0].astype(np.int64))
        assert np.allclose(conf_h, np.asarray(conf_d)[0])


def test_node_positions_device_long_sequences():
    """Regression (ADVICE r3): the missing-position sentinel used a
    fixed 1<<20 multiplier that overflowed int32 once Lt >= 2048,
    collapsing pos/conf to -1/0 whenever any node member lacked a
    mapping — silently dropping the consistency bonus on long inputs."""
    from kalign_tpu.tpu import resident as R
    from kalign_tpu.tpu.consistency import ConsistencyTable

    rng = np.random.default_rng(7)
    n, K, Lt = 4, 1, 2176          # (1<<20) * (Lt+1) >> 2^31
    lens = np.full(n, Lt - 16, np.int64)
    pos_maps = []
    for i in range(n):
        m = np.full(lens[i], -1, np.int64)
        # every second sequence maps NOTHING -> sentinel keys in play
        if i % 2 == 0:
            step = rng.integers(1, 3, lens[i])
            m[:] = np.minimum(np.cumsum(step) - 1, Lt - 1)
        pos_maps.append(m)
    ct = ConsistencyTable(K=K, weight=2.0, anchor_ids=[0],
                          pos_maps=pos_maps, numseq=n)
    members = list(range(n))
    Lpn = int(lens.max()) + 8
    gaps_all = []
    for i in range(n):
        g = np.zeros(int(lens[i]) + 1, np.int64)
        for _ in range(Lpn - int(lens[i])):
            g[rng.integers(0, lens[i] + 1)] += 1
        gaps_all.append(g.tolist())
    apos_h, conf_h = ct._node_positions_all(
        0, Lpn, {0: members}, {0: 2}, gaps_all, lens)
    assert (apos_h >= 0).any(), "host voting produced no positions"
    gbuf = np.zeros((n, int(lens.max()) + 2), np.int32)
    for i in range(n):
        gbuf[i, :len(gaps_all[i])] = gaps_all[i]
    pmap = np.full((n, K, Lt), -1, np.int32)
    for i in range(n):
        pmap[i, 0, :lens[i]] = pos_maps[i]
    pos_d, conf_d = R._node_positions_device(
        jnp.asarray(gbuf), jnp.asarray(pmap),
        jnp.asarray(lens.astype(np.int32)),
        jnp.asarray(np.asarray(members, np.int32)),
        jnp.asarray(np.zeros(len(members), np.int32)),
        jnp.asarray(np.arange(len(members), dtype=np.int32)),
        n_nodes=1, Lp=Lpn, K=K, dedup=False)
    assert np.array_equal(apos_h.astype(np.int64),
                          np.asarray(pos_d)[0].astype(np.int64))
    assert np.allclose(conf_h, np.asarray(conf_d)[0])


def test_sp_scores_device_matches_host():
    """Device _sp_scores (trial selection) vs the host
    sp_score_from_profiles on random paths, profiles and gap states."""
    import jax
    from kalign_tpu.tpu import resident as R
    from kalign_tpu.tpu.profile import sp_score_from_profiles, Profile
    from kalign_tpu.tpu.engine import _terminal_mask

    rng = np.random.default_rng(41)
    B, L1p, L2p = 6, 48, 56
    S = L1p + L2p + 2
    subm = rng.normal(scale=2.0, size=(23, 23)).astype(np.float32)
    subm = (subm + subm.T) / 2
    gpo, gpe, tgpe = 5.5, 2.0, 1.0
    base_pen = np.tile(np.array([gpo, gpe, tgpe], np.float32), (B, 1))

    steps = np.full((B, S), R.STEP_PAD, np.int8)
    nsteps = np.zeros(B, np.int32)
    r_counts = np.zeros((B, L1p, 23), np.float32)
    c_counts = np.zeros((B, L2p, 23), np.float32)
    gaps_r = np.zeros((B, L1p), np.int32)
    gaps_c = np.zeros((B, L2p), np.int32)
    nsip_r = rng.integers(1, 6, size=B).astype(np.int32)
    nsip_c = rng.integers(1, 6, size=B).astype(np.int32)

    host = np.zeros(B)
    for k in range(B):
        la = int(rng.integers(8, L1p))
        lb = int(rng.integers(8, L2p))
        # random valid path consuming exactly (la rows, lb cols):
        # step 0 consumes both, 1 consumes a col, 2 consumes a row
        m = int(rng.integers(1, min(la, lb)))
        path = [0] * m + [1] * (lb - m) + [2] * (la - m)
        rng.shuffle(path)
        n = len(path)
        steps[k, :n] = path
        nsteps[k] = n
        cr = rng.random((la, 23)).astype(np.float32) * nsip_r[k]
        cc = rng.random((lb, 23)).astype(np.float32) * nsip_c[k]
        r_counts[k, :la] = cr
        c_counts[k, :lb] = cc
        gr = rng.integers(0, nsip_r[k] + 1, size=la).astype(np.int64)
        gc = rng.integers(0, nsip_c[k] + 1, size=lb).astype(np.int64)
        gaps_r[k, :la] = gr
        gaps_c[k, :lb] = gc
        pa = Profile(counts=cr, subrows=cr, pen=np.zeros((la + 2, 3),
                                                          np.float32))
        pb = Profile(counts=cc, subrows=cc, pen=np.zeros((lb + 2, 3),
                                                          np.float32))
        st = np.asarray(path, np.int8)
        host[k] = sp_score_from_profiles(
            pa, pb, st, _terminal_mask(st), int(nsip_r[k]),
            int(nsip_c[k]), gr, gc, subm, gpo, gpe, tgpe)

    dev = np.asarray(R._sp_scores(
        jnp.asarray(steps), jnp.asarray(nsteps), jnp.asarray(r_counts),
        jnp.asarray(c_counts), jnp.asarray(gaps_r), jnp.asarray(gaps_c),
        jnp.asarray(nsip_r), jnp.asarray(nsip_c), jnp.asarray(subm),
        jnp.asarray(base_pen), L1p, L2p, S))
    for k in range(B):
        assert dev[k] == pytest.approx(host[k], rel=2e-5), \
            (k, dev[k], host[k])


def test_node_gap_counts_device_matches_host(monkeypatch):
    """Residue/gap counts from the resident gap state vs the host
    column_gap_counts on a real mid-alignment state."""
    from kalign_tpu.tpu import resident as R
    from kalign_tpu.tpu.profile import column_gap_counts

    rng = np.random.default_rng(9)
    n, Lg = 7, 30
    lens = rng.integers(5, Lg - 1, size=n).astype(np.int32)
    gaps = []
    gaps_buf = np.zeros((n, Lg), np.int32)
    for i in range(n):
        g = rng.integers(0, 3, size=lens[i] + 1).astype(np.int64)
        gaps.append(g.tolist())
        gaps_buf[i, :lens[i] + 1] = g
    # nodes: {0,1,2} and {3,4}, plus leaf {6}
    nodes = [[0, 1, 2], [3, 4], [6]]
    mem_seq, mem_node = [], []
    for kk, mem in enumerate(nodes):
        for m in mem:
            mem_seq.append(m)
            mem_node.append(kk)
    # real callers always size the profile to cover every member's
    # residue columns (weave invariants) — mirror that here
    Lp = 1 + max(int(np.max(np.cumsum(np.asarray(gaps[i][:-1]) + 1) - 1))
                 for i in range(n))
    res = np.asarray(R._node_gap_counts_device(
        jnp.asarray(gaps_buf), jnp.asarray(lens),
        jnp.asarray(np.asarray(mem_seq, np.int32)),
        jnp.asarray(np.asarray(mem_node, np.int32)),
        n_nodes=len(nodes), Lp=Lp))
    for kk, mem in enumerate(nodes):
        want_gaps = column_gap_counts(Lp, len(mem), mem, lens, gaps)
        got_gaps = len(mem) - res[kk]
        assert np.array_equal(got_gaps, want_gaps), kk


@pytest.mark.parametrize("case", ["BB11001", "BB12006"])
@pytest.mark.parametrize("refine_name", ["all", "confident"])
def test_resident_refine_matches_host_assembled(refine_name, case,
                                                monkeypatch):
    """refine=all/confident through the multi-candidate resident pass
    vs the host-assembled path.  Candidate selection compares SP in f32
    on device vs float64 on host, so assert alignment equality (no ties
    on these families) — if this ever flakes on a near-tie, compare
    SP."""
    from kalign_tpu.core import io as kio
    from kalign_tpu.core import params as P
    from kalign_tpu import engine as E
    from conftest import DATA

    outs = {}
    for resident in (False, True):
        if resident:
            monkeypatch.delenv("KALIGN_TPU_NO_RESIDENT", raising=False)
        else:
            monkeypatch.setenv("KALIGN_TPU_NO_RESIDENT", "1")
        m = kio.read_alignment(os.path.join(DATA, case + ".tfa"))
        m.quiet = True
        mode = (P.REFINE_ALL if refine_name == "all"
                else P.REFINE_CONFIDENT)
        out = E.align_msa(m, consistency_anchors=0, engine="tpu-fast",
                          refine=mode)
        outs[resident] = kio.write_fasta(out)
    assert outs[True] == outs[False]


@pytest.mark.slow
def test_resident_refine_with_consistency_matches_host_assembled(
        monkeypatch):
    """refine=confident + default consistency (K=5): the resident pass
    must thread consistency bonuses through BOTH the probe and the
    targeted-replay passes identically to the host-assembled path."""
    from conftest import DATA
    from kalign_tpu.core import io as kio
    from kalign_tpu.core import params as P
    from kalign_tpu import engine as E

    outs = {}
    for resident in (True, False):
        monkeypatch.delenv("KALIGN_TPU_NO_RESIDENT", raising=False)
        if not resident:
            monkeypatch.setenv("KALIGN_TPU_NO_RESIDENT", "1")
        m = kio.read_alignment(os.path.join(DATA, "BB11001.tfa"))
        m.quiet = True
        out = E.align_msa(m, engine="tpu-fast", refine=P.REFINE_CONFIDENT)
        outs[resident] = kio.write_fasta(out)
    assert outs[True] == outs[False]


@pytest.mark.slow
def test_live_store_compaction_parity(monkeypatch):
    """The live-profile store must shrink-compact when the cap grows
    with mostly-free rows (at 100k seqs the level-1 row count times the
    root-level cap would be tens of GB of HBM) — and compaction must
    not change the alignment."""
    from kalign_tpu import dssim
    from kalign_tpu.core.msa import Msa
    from kalign_tpu.core import io as kio
    from kalign_tpu import engine as E
    import kalign_tpu.tpu.resident as R

    seqs, names = dssim.generate_test_sequences(256, n_obs=10, dna=True,
                                                length=150, seed=5)
    outs = {}
    before = R._compactions
    for resident in (True, False):
        monkeypatch.delenv("KALIGN_TPU_NO_RESIDENT", raising=False)
        if not resident:
            monkeypatch.setenv("KALIGN_TPU_NO_RESIDENT", "1")
        m = Msa.from_sequences(seqs, names)
        m.quiet = True
        out = E.align_msa(m, consistency_anchors=0, engine="tpu-fast")
        outs[resident] = kio.write_fasta(out)
    assert R._compactions > before          # the path actually ran
    assert outs[True] == outs[False]
