"""Differential tests for the FUSED-operand lanewise Gotoh kernel
(tpu/gotoh_lanewise.py::gotoh_forward_fused): the match is computed
in-kernel from the (L, nc) operand streams instead of a materialised
[B, L1, L2] match array.

Test data is DYADIC (multiples of 0.25/0.5/0.125 with small
magnitudes), so every product and partial sum in the in-kernel
multiply-add chain is exactly representable: the kernel is then
bitwise-reproducible regardless of FMA contraction, and the numpy
oracle (gotoh_forward_direct_np with operands=) must match BITWISE —
see the float contract note on gotoh_forward_fused.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kalign_tpu.tpu.gotoh_lanewise import (
    BT, fused_plan, fused_feasible, gotoh_forward_fused,
    gotoh_forward_lanewise, gotoh_forward_direct_np, unpack_dec_lanewise)


def _dyadic_case(seed, B, L1p, L2p, NC, counts_side="lhs"):
    """Random dyadic operands; the counts side is zero beyond NC by
    construction (the exact-slicing precondition the engine meets)."""
    rng = np.random.default_rng(seed)
    lhs = (rng.integers(-32, 33, (B, L1p, NC)) * 0.25).astype(np.float32)
    rhs = (rng.integers(-32, 33, (B, L2p, NC)) * 0.25).astype(np.float32)
    pc = (rng.integers(-16, 0, (B, 3, L2p + 1)) * 0.5).astype(np.float32)
    pr = (rng.integers(-16, 0, (B, 3, L1p + 1)) * 0.5).astype(np.float32)
    la = rng.integers(max(2, L1p // 2), L1p + 1, B).astype(np.int32)
    lb = rng.integers(max(2, L2p // 2), L2p + 1, B).astype(np.int32)
    slope = (lb / np.maximum(la, 1)).astype(np.float32)
    eps = (rng.integers(0, 5, B) * 0.125).astype(np.float32)
    return lhs, rhs, pc, pr, la, lb, slope, eps


@pytest.mark.parametrize("plan", [(4, 16), (8, 32), (2, 8), (1, 32),
                                  (8, 16)])
def test_fused_bitwise_vs_oracle(plan):
    lhs, rhs, pc, pr, la, lb, slope, eps = _dyadic_case(
        7, BT, 24, 32, 5)
    dec, score, st = gotoh_forward_fused(
        jnp.asarray(lhs), jnp.asarray(rhs), jnp.asarray(pc),
        jnp.asarray(pr), jnp.asarray(la), jnp.asarray(lb),
        interpret=True, slope=jnp.asarray(slope),
        bias_eps=jnp.asarray(eps), plan=plan)
    dec_o, score_o, st_o = gotoh_forward_direct_np(
        None, pc, pr, la, lb, slope=slope, bias_eps=eps,
        operands=(lhs, rhs))
    assert np.array_equal(np.asarray(score), score_o)
    assert np.array_equal(np.asarray(st), st_o)
    assert np.array_equal(unpack_dec_lanewise(np.asarray(dec), 32), dec_o)


def test_fused_wide_alphabet_bitwise():
    """nc=23 (protein width) exercises the long in-kernel chain."""
    lhs, rhs, pc, pr, la, lb, slope, eps = _dyadic_case(
        11, BT, 16, 16, 23)
    # keep chain partial sums exactly representable: shrink magnitudes
    lhs *= 0.25
    rhs *= 0.25
    dec, score, st = gotoh_forward_fused(
        jnp.asarray(lhs), jnp.asarray(rhs), jnp.asarray(pc),
        jnp.asarray(pr), jnp.asarray(la), jnp.asarray(lb),
        interpret=True, slope=jnp.asarray(slope),
        bias_eps=jnp.asarray(eps), plan=(4, 16))
    dec_o, score_o, st_o = gotoh_forward_direct_np(
        None, pc, pr, la, lb, slope=slope, bias_eps=eps,
        operands=(lhs, rhs))
    assert np.array_equal(np.asarray(score), score_o)
    assert np.array_equal(unpack_dec_lanewise(np.asarray(dec), 16), dec_o)


def test_fused_matches_matchstream_scores():
    """On arbitrary float data the fused path's scores agree with the
    match-stream lanewise kernel to float tolerance (paths may differ
    on near-ties — the tpu-fast contract)."""
    rng = np.random.default_rng(3)
    B, L1p, L2p, NC = BT, 24, 32, 5
    lhs = rng.normal(size=(B, L1p, NC)).astype(np.float32)
    rhs = rng.normal(size=(B, L2p, NC)).astype(np.float32)
    pc = (-np.abs(rng.normal(size=(B, 3, L2p + 1))) - 0.5).astype(np.float32)
    pr = (-np.abs(rng.normal(size=(B, 3, L1p + 1))) - 0.5).astype(np.float32)
    la = rng.integers(12, L1p + 1, B).astype(np.int32)
    lb = rng.integers(16, L2p + 1, B).astype(np.int32)
    slope = (lb / np.maximum(la, 1)).astype(np.float32)
    eps = np.full(B, 1e-3, np.float32)

    match = np.einsum("bic,bjc->bij", lhs, rhs).astype(np.float32)
    _, s0, _ = gotoh_forward_lanewise(
        jnp.asarray(match), jnp.asarray(pc), jnp.asarray(pr),
        jnp.asarray(la), jnp.asarray(lb), interpret=True,
        slope=jnp.asarray(slope), bias_eps=jnp.asarray(eps), plan=(4, 16))
    _, s1, _ = gotoh_forward_fused(
        jnp.asarray(lhs), jnp.asarray(rhs), jnp.asarray(pc),
        jnp.asarray(pr), jnp.asarray(la), jnp.asarray(lb),
        interpret=True, slope=jnp.asarray(slope),
        bias_eps=jnp.asarray(eps), plan=(4, 16))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                               rtol=2e-5, atol=2e-4)


def test_fused_degenerate_lb0_and_short_rows():
    lhs, rhs, pc, pr, la, lb, slope, eps = _dyadic_case(5, BT, 16, 16, 5)
    lb[::7] = 0
    la[::5] = 2
    dec, score, st = gotoh_forward_fused(
        jnp.asarray(lhs), jnp.asarray(rhs), jnp.asarray(pc),
        jnp.asarray(pr), jnp.asarray(la), jnp.asarray(lb),
        interpret=True, slope=jnp.asarray(slope),
        bias_eps=jnp.asarray(eps), plan=(4, 16))
    _, score_o, st_o = gotoh_forward_direct_np(
        None, pc, pr, la, lb, slope=slope, bias_eps=eps,
        operands=(lhs, rhs))
    assert np.array_equal(np.asarray(score), score_o)
    assert np.array_equal(np.asarray(st), st_o)


def test_fused_no_dec():
    """with_dec=False (the bench accounting path) returns the same
    scores as the decisions-on run."""
    lhs, rhs, pc, pr, la, lb, slope, eps = _dyadic_case(9, BT, 16, 16, 5)
    _, s1, st1 = gotoh_forward_fused(
        jnp.asarray(lhs), jnp.asarray(rhs), jnp.asarray(pc),
        jnp.asarray(pr), jnp.asarray(la), jnp.asarray(lb),
        interpret=True, with_dec=False, slope=jnp.asarray(slope),
        bias_eps=jnp.asarray(eps), plan=(4, 16))
    _, s2, st2 = gotoh_forward_fused(
        jnp.asarray(lhs), jnp.asarray(rhs), jnp.asarray(pc),
        jnp.asarray(pr), jnp.asarray(la), jnp.asarray(lb),
        interpret=True, with_dec=True, slope=jnp.asarray(slope),
        bias_eps=jnp.asarray(eps), plan=(4, 16))
    assert np.array_equal(np.asarray(s1), np.asarray(s2))
    assert np.array_equal(np.asarray(st1), np.asarray(st2))


def test_fused_plan_feasibility():
    # DNA widths qualify at production shapes
    assert fused_feasible(BT, 256, 256, 5)
    assert fused_feasible(BT, 384, 384, 5)
    r, l2t, ok = fused_plan(BT, 384, 384, 5)
    assert ok and r >= 4
    # non-full-tile batches never qualify
    assert not fused_feasible(BT - 8, 256, 256, 5)


def test_engine_fused_forward_nc_routing():
    """_fused_forward_lanewise with nc=5: same scores as the nc=0
    (materialised-match) path; decisions may differ only on near-ties."""
    from kalign_tpu.tpu.engine import _fused_forward_lanewise
    rng = np.random.default_rng(21)
    B, L1p, L2p, NC = BT, 16, 16, 5
    lhs = np.zeros((B, L1p, 23), np.float32)
    rhs = np.zeros((B, L2p, 23), np.float32)
    lhs[:, :, :NC] = rng.integers(0, 3, (B, L1p, NC)) * 1.0
    rhs[:, :, :NC] = rng.integers(-20, 21, (B, L2p, NC)) * 0.25
    penv = np.array([-5.5, -2.0, -1.0], np.float32)
    la = rng.integers(8, L1p + 1, B).astype(np.int32)
    lb = rng.integers(8, L2p + 1, B).astype(np.int32)
    colsv = np.arange(L2p + 1)[None, :]
    pc = (np.where((colsv >= 1) & (colsv <= lb[:, None]), 1.0, 0.0)
          [:, None, :] * penv[None, :, None]).astype(np.float32)
    rowsv = np.arange(L1p + 1)[None, :]
    pr = (np.where((rowsv >= 1) & (rowsv <= la[:, None]), 1.0, 0.0)
          [:, None, :] * penv[None, :, None]).astype(np.float32)
    eps = np.full(B, 1e-3, np.float32)

    args = (jnp.asarray(lhs), jnp.asarray(rhs), jnp.asarray(pc),
            jnp.asarray(pr), jnp.asarray(la), jnp.asarray(lb),
            jnp.asarray(eps), None)
    _, s0, _ = _fused_forward_lanewise(*args, interpret=True, nc=0)
    _, s1, _ = _fused_forward_lanewise(*args, interpret=True, nc=5)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                               rtol=2e-5, atol=2e-4)


def test_live_nc_detection():
    from kalign_tpu.core import params as P
    from kalign_tpu.tpu.engine import TpuEngine
    eng = TpuEngine(use_pallas=False)
    dna = P.aln_param_init(P.BIOTYPE_DNA, 0)
    prot = P.aln_param_init(P.BIOTYPE_PROTEIN, 0)
    assert eng._live_nc(dna.subm, 4) == 5
    assert eng._live_nc(prot.subm, 22) == 0      # default: narrow only
    assert eng._live_nc(dna.subm, 7) == 0        # stray code -> off
    eng.fused = "all"
    assert eng._live_nc(prot.subm, 22) == 23
    eng.fused = "0"
    assert eng._live_nc(dna.subm, 4) == 0
