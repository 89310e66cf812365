"""Integration wiring tests for the lanewise-kernel route
(KALIGN_TPU_LANEWISE): the engine's bucket dispatch and the
device-assembled leaf batch must produce the same alignments through
the problem-per-lane kernel as through the default path.

The two paths round the gap-in-row state differently (direct
recurrence vs scan transform), so a few near-score-tie problems may
legitimately pick different optimal paths; scores must agree to float
noise everywhere and the step paths on all but a small fixed set of
near-ties."""

import numpy as np
import pytest

import jax.numpy as jnp

from kalign_tpu.core import params as P
from kalign_tpu.tpu.engine import TpuEngine


def _bucket_problem(seed, B, L1p, L2p):
    rng = np.random.default_rng(seed)
    lhs = np.zeros((B, L1p, 23), np.float32)
    toks = rng.integers(0, 20, size=(B, L1p))
    lhs[np.arange(B)[:, None], np.arange(L1p)[None, :], toks] = 1.0
    subm = np.asarray(P.aln_param_init(P.BIOTYPE_PROTEIN, 0).subm,
                      np.float32)
    rhs = subm[rng.integers(0, 20, size=(B, L2p))].astype(np.float32)
    la = rng.integers(L1p // 2, L1p + 1, size=B).astype(np.int32)
    lb = rng.integers(L2p // 2, L2p + 1, size=B).astype(np.int32)
    pos_r = np.arange(L1p)[None, :]
    pos_c = np.arange(L2p)[None, :]
    lhs *= (pos_r < la[:, None])[:, :, None]
    rhs *= (pos_c < lb[:, None])[:, :, None]
    penv = np.array([-5.5, -2.0, -1.0], np.float32)
    colsv = np.arange(L2p + 1)[None, :]
    pc = (np.where((colsv >= 1) & (colsv <= lb[:, None]), 1.0, 0.0)
          [:, None, :] * penv[None, :, None]).astype(np.float32)
    rowsv = np.arange(L1p + 1)[None, :]
    pr = (np.where((rowsv >= 1) & (rowsv <= la[:, None]), 1.0, 0.0)
          [:, None, :] * penv[None, :, None]).astype(np.float32)
    eps = np.full(B, 1e-3, np.float32)
    return lhs, rhs, pc, pr, la, lb, eps


def test_dispatch_bucket_lanewise_route(monkeypatch):
    B, L1p, L2p = 1024, 24, 24
    lhs, rhs, pc, pr, la, lb, eps = _bucket_problem(5, B, L1p, L2p)

    monkeypatch.setenv("KALIGN_TPU_LANEWISE", "0")
    eng0 = TpuEngine(use_pallas=False)
    steps0, scores0 = eng0._run_bucket(lhs, rhs, pc, pr, la, lb, eps, None)

    monkeypatch.setenv("KALIGN_TPU_LANEWISE", "interpret")
    eng1 = TpuEngine(use_pallas=False)
    assert eng1._lanewise_ok(B, L1p, L2p)
    steps1, scores1 = eng1._run_bucket(lhs, rhs, pc, pr, la, lb, eps, None)

    np.testing.assert_allclose(scores0, scores1, rtol=2e-5, atol=2e-4)
    diff = sum(1 for a, b in zip(steps0, steps1)
               if not np.array_equal(np.asarray(a), np.asarray(b)))
    # near-ties only; with this seed the paths agree everywhere
    assert diff <= 3, diff
    # structural validity of the lanewise walks
    for s, a, b in zip(steps1, la, lb):
        s = np.asarray(s)
        assert ((s == 0) | (s == 2)).sum() == a
        assert ((s == 0) | (s == 1)).sum() == b


def test_dispatch_bucket_lanewise_with_bonus(monkeypatch):
    B, L1p, L2p = 1024, 16, 16
    lhs, rhs, pc, pr, la, lb, eps = _bucket_problem(9, B, L1p, L2p)
    rng = np.random.default_rng(10)
    bonus = (rng.random((B, L1p, L2p)) < 0.05).astype(np.float32) * 2.0

    monkeypatch.setenv("KALIGN_TPU_LANEWISE", "0")
    steps0, scores0 = TpuEngine(use_pallas=False)._run_bucket(
        lhs, rhs, pc, pr, la, lb, eps, bonus)
    monkeypatch.setenv("KALIGN_TPU_LANEWISE", "interpret")
    steps1, scores1 = TpuEngine(use_pallas=False)._run_bucket(
        lhs, rhs, pc, pr, la, lb, eps, bonus)
    np.testing.assert_allclose(scores0, scores1, rtol=2e-5, atol=2e-4)
    diff = sum(1 for a, b in zip(steps0, steps1)
               if not np.array_equal(np.asarray(a), np.asarray(b)))
    assert diff <= 3, diff


def test_sub_tile_batches_keep_row_path(monkeypatch):
    monkeypatch.setenv("KALIGN_TPU_LANEWISE", "interpret")
    eng = TpuEngine(use_pallas=False)
    assert not eng._lanewise_ok(512, 128, 128)
    assert not eng._lanewise_ok(1536, 128, 128)


@pytest.mark.slow
def test_leaf_batch_device_lanewise(monkeypatch):
    """_dp_leaf_batch_device routes full-tile chunks through the
    lanewise kernel (the consistency-map workload at scale)."""
    rng = np.random.default_rng(21)
    n = 80
    codes = [rng.integers(0, 20, size=rng.integers(40, 100)).astype(np.uint8)
             for _ in range(n)]
    anchors = list(range(16))
    pairs = [(i, a) for i in range(n) for a in anchors]   # 1280 pairs
    ap = P.aln_param_init(P.BIOTYPE_PROTEIN, 0)

    monkeypatch.setenv("KALIGN_TPU_LEAF_DEVICE", "1")
    monkeypatch.setenv("KALIGN_TPU_LANEWISE", "0")
    out0 = TpuEngine(use_pallas=False)._dp_leaf_batch(codes, pairs, ap)
    monkeypatch.setenv("KALIGN_TPU_LANEWISE", "interpret")
    out1 = TpuEngine(use_pallas=False)._dp_leaf_batch(codes, pairs, ap)
    diff = sum(1 for a, b in zip(out0, out1)
               if not np.array_equal(np.asarray(a), np.asarray(b)))
    assert diff <= len(pairs) // 100, diff


def test_resident_forward_traceback_lanewise():
    """resident._forward_traceback with lanewise="interpret" matches the
    XLA-scan path on scores and (modulo near-ties) on step paths."""
    import jax.numpy as jnp
    from kalign_tpu.tpu import resident

    rng = np.random.default_rng(17)
    B, L1p, L2p = 1024, 16, 16
    match = jnp.asarray((rng.normal(size=(B, L1p, L2p)) * 3)
                        .astype(np.float32))
    penv = np.array([-5.5, -2.0, -1.0], np.float32)
    la = rng.integers(L1p // 2, L1p + 1, size=B).astype(np.int32)
    lb = rng.integers(L2p // 2, L2p + 1, size=B).astype(np.int32)
    colsv = np.arange(L2p + 1)[None, :]
    pc = jnp.asarray((np.where((colsv >= 1) & (colsv <= lb[:, None]),
                               1.0, 0.0)[:, None, :]
                      * penv[None, :, None]).astype(np.float32))
    rowsv = np.arange(L1p + 1)[None, :]
    pr = jnp.asarray((np.where((rowsv >= 1) & (rowsv <= la[:, None]),
                               1.0, 0.0)[:, None, :]
                      * penv[None, :, None]).astype(np.float32))
    la_d, lb_d = jnp.asarray(la), jnp.asarray(lb)
    slope = lb_d.astype(jnp.float32) / jnp.maximum(
        la_d.astype(jnp.float32), 1.0)
    eps = jnp.full((B,), 1e-3, jnp.float32)
    S = L1p + L2p + 2
    s0, n0, sc0 = resident._forward_traceback(
        match, None, None, pc, pr, la_d, lb_d, slope, eps,
        L1p, L2p, S, False, 8, 8, lanewise="off")
    s1, n1, sc1 = resident._forward_traceback(
        match, None, None, pc, pr, la_d, lb_d, slope, eps,
        L1p, L2p, S, False, 8, 8, lanewise="interpret")
    np.testing.assert_allclose(np.asarray(sc0), np.asarray(sc1),
                               rtol=2e-5, atol=2e-4)
    diff = (~(np.asarray(s0) == np.asarray(s1)).all(axis=1)).sum()
    assert diff <= 3, diff
