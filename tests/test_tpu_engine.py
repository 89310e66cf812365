"""TPU engine tests (run on CPU backend; conftest forces jax_platforms=cpu)."""

import os
import numpy as np
import pytest

from kalign_tpu.core import io as kio
from kalign_tpu.core import params as P
from kalign_tpu import engine as E
from kalign_tpu.core.cmp import msa_compare_detailed

from conftest import DATA


def _gold(path):
    m = kio.read_alignment(path)
    if m.aligned == 2:
        m.finalise()
    return [s.seq for s in m.sequences], [s.name for s in m.sequences]


def test_pairwise_scores_optimal():
    """TPU DP paths must score >= host paths under the reference model
    (the host reproduces kalign's Hirschberg, which can be slightly
    suboptimal due to its midpoint bias)."""
    import random
    from kalign_tpu.tpu.engine import TpuEngine
    from kalign_tpu.tpu.profile import leaf_profile

    def score(s1, s2, steps, subm, gpo, gpe, tgpe):
        n = len(steps)
        term = np.zeros(n, bool)
        i = 0
        while i < n and steps[i] != 0:
            term[i] = True
            i += 1
        i = n - 1
        while i >= 0 and steps[i] != 0:
            term[i] = True
            i -= 1
        sc, p1, p2, prev = 0.0, 0, 0, 0
        for c in range(n):
            s = steps[c]
            if s == 0:
                if prev != 0:
                    sc -= gpo
                sc += float(subm[s1[p1], s2[p2]])
                p1 += 1
                p2 += 1
            else:
                if term[c]:
                    sc -= tgpe
                elif s != prev:
                    sc -= gpo
                else:
                    sc -= gpe
                if s == 1:
                    p2 += 1
                else:
                    p1 += 1
            prev = s
        return sc

    rng = random.Random(11)
    ap = P.aln_param_init(P.BIOTYPE_PROTEIN, 0)
    eng = TpuEngine()
    host = E.get_engine("host")
    for _ in range(8):
        l1 = rng.randint(30, 120)
        s1 = np.array([rng.randrange(20) for _ in range(l1)], np.uint8)
        s2 = s1.copy().tolist()
        for _ in range(l1 // 4):
            pos = rng.randrange(len(s2))
            r = rng.random()
            if r < .5:
                s2[pos] = rng.randrange(20)
            elif r < .75 and len(s2) > 10:
                del s2[pos]
            else:
                s2.insert(pos, rng.randrange(20))
        s2 = np.array(s2, np.uint8)
        tasks = np.array([[0, 1, 2]], np.int32)
        gaps, _ = host.align([s1, s2], tasks, ap, None, 0)

        def gcols(g):
            g = np.asarray(g)
            return np.cumsum(g[:-1] + 1) - 1
        c1, c2 = gcols(gaps[0]), gcols(gaps[1])
        ncol = max(int(c1.max()), int(c2.max())) + 1
        m1 = np.zeros(ncol, bool)
        m1[c1] = True
        m2 = np.zeros(ncol, bool)
        m2[c2] = True
        steps_h = np.where(m1 & m2, 0, np.where(m2, 1, 2)).astype(np.int8)
        sc_h = score(s1, s2, steps_h, ap.subm, ap.gpo, ap.gpe, ap.tgpe)

        pa = leaf_profile(s1, ap.subm, ap.gpo, ap.gpe, ap.tgpe, 0.0)
        pb = leaf_profile(s2, ap.subm, ap.gpo, ap.gpe, ap.tgpe, 0.0)
        if len(s1) <= len(s2):
            st, _ = eng._dp(pa, pb, 1, 1, None)
        else:
            st0, _ = eng._dp(pb, pa, 1, 1, None)
            st = np.where(st0 == 1, 2, np.where(st0 == 2, 1, 0)).astype(np.int8)
        sc_t = score(s1, s2, st, ap.subm, ap.gpo, ap.gpe, ap.tgpe)
        # allow tiny slack for the centering regularizer
        assert sc_t >= sc_h - 0.5


@pytest.mark.parametrize("bb", ["BB11001", "BB12006", "BB30014"])
def test_balibase_quality_close_to_host(bb):
    gr, gn = _gold(os.path.join(DATA, f"{bb}.msf")) if \
        os.path.exists(os.path.join(DATA, f"{bb}.msf")) else (None, None)
    if gr is None:
        pytest.skip("no gold file")
    m_h = kio.read_inputs([os.path.join(DATA, f"{bb}.tfa")])
    m_h = E.align_msa(m_h, consistency_anchors=0, vsm_amax=0.0)
    m_t = kio.read_inputs([os.path.join(DATA, f"{bb}.tfa")])
    m_t = E.align_msa(m_t, consistency_anchors=0, vsm_amax=0.0, engine="tpu-fast")
    d_h = msa_compare_detailed(gr, m_h.aligned_rows(), gn,
                               [s.name for s in m_h.sequences], 0.2)
    d_t = msa_compare_detailed(gr, m_t.aligned_rows(), gn,
                               [s.name for s in m_t.sequences], 0.2)
    # with VSM off the TPU engine tracks the host engine closely
    assert d_t.recall >= d_h.recall - 0.02
    assert d_t.tc >= d_h.tc - 0.05


@pytest.mark.parametrize("refine", [0, 1, 2, 3])
def test_tpu_refine_modes_run(refine):
    m = kio.read_inputs([os.path.join(DATA, "BB12006.tfa")])
    m = E.align_msa(m, consistency_anchors=5, refine=refine, engine="tpu-fast")
    rows = m.aligned_rows()
    assert len(set(len(r) for r in rows)) == 1


@pytest.mark.parametrize("bb", ["BB12006", "BB30014"])
def test_tpu_default_mode_quality(bb):
    """Default mode (consistency on): TPU engine tracks host quality,
    including TC on the divergent RV30 family (map-centering bias)."""
    gr, gn = _gold(os.path.join(DATA, f"{bb}.msf"))
    m_h = kio.read_inputs([os.path.join(DATA, f"{bb}.tfa")])
    m_h = E.align_msa(m_h, consistency_anchors=5)
    m_t = kio.read_inputs([os.path.join(DATA, f"{bb}.tfa")])
    m_t = E.align_msa(m_t, consistency_anchors=5, engine="tpu-fast")
    d_h = msa_compare_detailed(gr, m_h.aligned_rows(), gn,
                               [s.name for s in m_h.sequences], 0.2)
    d_t = msa_compare_detailed(gr, m_t.aligned_rows(), gn,
                               [s.name for s in m_t.sequences], 0.2)
    assert d_t.recall >= d_h.recall - 0.03
    assert d_t.tc >= d_h.tc - 0.03


def test_tpu_invariants():
    m = kio.read_inputs([os.path.join(DATA, "BB11001.tfa")])
    originals = {s.name: s.seq for s in m.sequences}
    m = E.align_msa(m, consistency_anchors=5, engine="tpu-fast")
    rows = m.aligned_rows()
    assert len(set(len(r) for r in rows)) == 1
    for sq in m.sequences:
        assert sq.seq.replace("-", "") == originals[sq.name]


def test_device_anchor_distances_bit_exact():
    """Device BPM anchor distances must equal the native host kernel
    bit-for-bit (same blocked-Myers semantics + length bias)."""
    import numpy as np
    from kalign_tpu.tpu.engine import TpuEngine

    rng = np.random.default_rng(17)
    codes = [np.asarray(rng.integers(0, 13, size=rng.integers(40, 700)),
                        np.uint8) for _ in range(24)]
    anchors = [0, 5, 11, 23]
    eng = TpuEngine(use_pallas=True)   # force the device path (XLA on CPU)
    d_dev = eng.anchor_distances(codes, anchors)
    d_host = eng.host.anchor_distances(codes, anchors)
    assert d_dev.shape == d_host.shape
    assert np.array_equal(d_dev, d_host), \
        np.argwhere(d_dev != d_host)[:5]


def test_leaf_assemble_bitwise_matches_host():
    """Device-side leaf operand assembly (_leaf_assemble) must be
    BITWISE identical to the host assembly in _dp_leaf_batch — the
    device path ships only int32 index vectors at 10^5 scale, and byte
    parity of consistency maps depends on the operands being the same
    bits."""
    import jax.numpy as jnp
    from kalign_tpu.tpu.engine import _leaf_assemble

    rng = np.random.default_rng(0)
    n, Lmax, B = 50, 137, 16
    lens = rng.integers(20, Lmax + 1, size=n).astype(np.int32)
    pad = np.zeros((n, Lmax), np.uint8)
    for i in range(n):
        pad[i, :lens[i]] = rng.integers(0, 23, size=lens[i])
    subm = rng.normal(size=(23, 23)).astype(np.float32)
    penv = np.array([-5.5, -2.0, -1.0], np.float32)
    rows = rng.integers(0, n, size=B).astype(np.int32)
    cols = rng.integers(0, n, size=B).astype(np.int32)
    la, lb = lens[rows], lens[cols]
    L1p = L2p = 256
    got = _leaf_assemble(jnp.asarray(pad), jnp.asarray(subm),
                         jnp.asarray(penv), jnp.asarray(rows),
                         jnp.asarray(cols), jnp.asarray(la),
                         jnp.asarray(lb), L1p=L1p, L2p=L2p)
    Lr, Lc = min(L1p, Lmax), min(L2p, Lmax)
    valid_r = (np.arange(Lr)[None, :] < la[:, None])[:, :, None]
    valid_c = (np.arange(Lc)[None, :] < lb[:, None])[:, :, None]
    lhs = np.zeros((B, L1p, 23), np.float32)
    lhs[:, :Lr] = (pad[rows, :Lr, None] ==
                   np.arange(23)[None, None, :]) * valid_r
    rhs = np.zeros((B, L2p, 23), np.float32)
    rhs[:, :Lc] = subm[pad[cols, :Lc]] * valid_c
    colsv = np.arange(L2p + 1)[None, :]
    pc = np.where((colsv >= 1) & (colsv <= lb[:, None]),
                  1.0, 0.0)[:, None, :] * penv[None, :, None]
    rowsv = np.arange(L1p + 1)[None, :]
    pr = np.where((rowsv >= 1) & (rowsv <= la[:, None]),
                  1.0, 0.0)[:, None, :] * penv[None, :, None]
    for name, d, h in (("lhs", got[0], lhs), ("rhs", got[1], rhs),
                       ("pc", got[2], pc.astype(np.float32)),
                       ("pr", got[3], pr.astype(np.float32))):
        assert np.array_equal(np.asarray(d), h), name


def test_consistency_leaf_device_assembly_byte_parity(monkeypatch):
    """Default-mode alignment with the device-assembled consistency
    pairwise batch (KALIGN_TPU_LEAF_DEVICE=1 forces it on the XLA
    backend) must be byte-identical to the host-assembled path."""
    outs = {}
    for flag in (False, True):
        monkeypatch.delenv("KALIGN_TPU_LEAF_DEVICE", raising=False)
        if flag:
            monkeypatch.setenv("KALIGN_TPU_LEAF_DEVICE", "1")
        m = kio.read_alignment(os.path.join(DATA, "BB12006.tfa"))
        m.quiet = True
        out = E.align_msa(m, engine="tpu-fast")
        outs[flag] = kio.write_fasta(out)
    assert outs[True] == outs[False]


def test_consistency_leaf_device_multichunk_parity(monkeypatch):
    """The multi-chunk branch of the device leaf batch (only reached
    above ~4096 pairs per bucket at default caps — i.e. at 10^4-10^5
    sequence scale) must be byte-identical to the single-chunk path;
    forced here by shrinking the launch cap."""
    from kalign_tpu.tpu.engine import TpuEngine

    monkeypatch.setenv("KALIGN_TPU_LEAF_DEVICE", "1")
    outs = {}
    for cap in (None, 1 << 18):
        if cap:
            monkeypatch.setattr(TpuEngine, "MAX_MATCH_BYTES", cap)
        m = kio.read_alignment(os.path.join(DATA, "BB12006.tfa"))
        m.quiet = True
        outs[cap] = kio.write_fasta(E.align_msa(m, engine="tpu-fast"))
    assert outs[None] == outs[1 << 18]
