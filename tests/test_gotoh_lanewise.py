"""Differential tests for the problem-per-lane Gotoh kernel
(tpu/gotoh_lanewise.py) — interpret mode on CPU.

Three layers, mirroring the reference's differential-vs-oracle pattern
(/root/reference/lib/src/bpm_test.c):
  1. kernel vs gotoh_forward_direct_np: BITWISE decisions, scores and
     end states (the oracle replicates the kernel's float op order);
  2. packed-nibble traceback vs the int8-matrix walker on identical
     decisions;
  3. score cross-check vs the scan-transform engine (tpu/gotoh.py):
     both compute the same optimum up to float reassociation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kalign_tpu.tpu.gotoh_lanewise import (
    BT, gotoh_forward_lanewise, gotoh_forward_direct_np,
    unpack_dec_lanewise, lanewise_feasible)
from kalign_tpu.tpu import gotoh
from kalign_tpu.tpu.traceback import traceback_batch, traceback_lanewise


def _random_problem(seed, B, L1p, L2p, lb_min=0):
    rng = np.random.default_rng(seed)
    match = (rng.normal(size=(B, L1p, L2p)) * 3).astype(np.float32)
    # penalties are DYADIC (k/32): the terminal-gap boundary rows go
    # through cumsums computed by XLA in the producer and by numpy in
    # the oracle — dyadic values sum exactly under any association, so
    # the bitwise comparison tests the KERNEL's op order, not XLA's
    # cumsum reassociation (observed 1-ulp lb==0 drift with random f32)
    pc = (-rng.integers(16, 96, size=(B, 3, L2p + 1)) / 32).astype(
        np.float32)
    pr = (-rng.integers(16, 96, size=(B, 3, L1p + 1)) / 32).astype(
        np.float32)
    la = rng.integers(1, L1p + 1, size=B).astype(np.int32)
    lb = rng.integers(lb_min, L2p + 1, size=B).astype(np.int32)
    return match, pc, pr, la, lb


@pytest.mark.parametrize("with_bias", [False, True])
def test_lanewise_vs_numpy_oracle_bitwise(with_bias):
    B, L1p, L2p = BT, 20, 16
    match, pc, pr, la, lb = _random_problem(3, B, L1p, L2p)
    slope = (lb / np.maximum(la, 1)).astype(np.float32)
    eps = np.full(B, 0.01, np.float32)
    kw = dict(slope=jnp.asarray(slope), bias_eps=jnp.asarray(eps)) \
        if with_bias else {}
    dec_p, score, st = gotoh_forward_lanewise(
        jnp.asarray(match), jnp.asarray(pc), jnp.asarray(pr),
        jnp.asarray(la), jnp.asarray(lb), interpret=True,
        with_bias=with_bias, **kw)
    dec_o, score_o, st_o = gotoh_forward_direct_np(
        match, pc, pr, la, lb,
        slope if with_bias else None, eps if with_bias else None)
    score = np.asarray(score)
    assert np.array_equal(score.view(np.int32), score_o.view(np.int32))
    assert np.array_equal(np.asarray(st), st_o)
    dec_k = unpack_dec_lanewise(np.asarray(dec_p), L2p)
    for b in range(B):
        if lb[b] == 0:
            continue
        assert np.array_equal(dec_k[b, :la[b], :lb[b]],
                              dec_o[b, :la[b], :lb[b]]), b


def test_lanewise_traceback_matches_int8_walker():
    B, L1p, L2p = BT, 24, 20
    match, pc, pr, la, lb = _random_problem(7, B, L1p, L2p, lb_min=1)
    dec_p, score, st = gotoh_forward_lanewise(
        jnp.asarray(match), jnp.asarray(pc), jnp.asarray(pr),
        jnp.asarray(la), jnp.asarray(lb), interpret=True, with_bias=False)
    ms = L1p + L2p + 2
    s1, n1 = traceback_lanewise(dec_p, jnp.asarray(la), jnp.asarray(lb),
                                st, ms)
    dec8 = jnp.asarray(
        unpack_dec_lanewise(np.asarray(dec_p), L2p).astype(np.int8))
    s2, n2 = traceback_batch(dec8, jnp.asarray(la), jnp.asarray(lb), st, ms)
    assert np.array_equal(np.asarray(s1), np.asarray(s2))
    assert np.array_equal(np.asarray(n1), np.asarray(n2))
    # structural validity: each walk consumes exactly la rows / lb cols
    s1 = np.asarray(s1)
    rows = ((s1 == 0) | (s1 == 2)).sum(axis=1)
    cols = ((s1 == 0) | (s1 == 1)).sum(axis=1)
    assert np.array_equal(rows, la)
    assert np.array_equal(cols, lb)


def test_lanewise_scores_match_transform_engine():
    """The direct recurrence and the scan transform round differently
    but optimise the same objective: scores agree to float noise."""
    B, L1p, L2p = BT, 32, 24
    match, pc, pr, la, lb = _random_problem(11, B, L1p, L2p, lb_min=1)
    _, score, _ = gotoh_forward_lanewise(
        jnp.asarray(match), jnp.asarray(pc), jnp.asarray(pr),
        jnp.asarray(la), jnp.asarray(lb), interpret=True, with_bias=False,
        with_dec=False)
    dec, score_t, st_t = jax.vmap(
        lambda m, c, r, a, b: gotoh.gotoh_forward(
            m, c[0], c[1], c[2], r[0], r[1], r[2], a, b)
    )(jnp.asarray(match), jnp.asarray(pc), jnp.asarray(pr),
      jnp.asarray(la), jnp.asarray(lb))
    np.testing.assert_allclose(np.asarray(score), np.asarray(score_t),
                               rtol=2e-5, atol=2e-4)


def test_lanewise_degenerate_lb0():
    B, L1p, L2p = BT, 12, 8
    match, pc, pr, la, lb = _random_problem(13, B, L1p, L2p)
    lb[:] = 0
    _, score, st = gotoh_forward_lanewise(
        jnp.asarray(match), jnp.asarray(pc), jnp.asarray(pr),
        jnp.asarray(la), jnp.asarray(lb), interpret=True, with_bias=False)
    _, score_o, st_o = gotoh_forward_direct_np(match, pc, pr, la, lb)
    assert np.array_equal(np.asarray(score).view(np.int32),
                          score_o.view(np.int32))
    assert np.all(np.asarray(st) == 2)


def test_lanewise_feasibility_rule():
    assert lanewise_feasible(1024, 256, 128)
    assert lanewise_feasible(4096, 128, 256)
    # round 5: column tiling makes mid-size merges qualify (the
    # 384x384 steady-state bench shape — VERDICT r4 item 1a)
    assert lanewise_feasible(1024, 384, 384)
    assert lanewise_feasible(1024, 512, 512)
    assert not lanewise_feasible(512, 128, 128)      # sub-tile batch
    assert not lanewise_feasible(1536, 128, 128)     # not a tile multiple
    assert not lanewise_feasible(1024, 128, 1024)    # state-scratch blowup


@pytest.mark.parametrize("plan", [(1, 32), (2, 16), (4, 8), (4, 32),
                                  (8, 16)])
def test_lanewise_row_blocks_and_column_tiles_bitwise(plan):
    """Every (R rows-per-step, L2t column-tile) plan computes the same
    cells in the same float op order — decisions, scores and end
    states must stay BITWISE equal to the oracle (the plan only
    changes the register/VMEM schedule, never the math)."""
    B, L1p, L2p = BT, 24, 32
    match, pc, pr, la, lb = _random_problem(11, B, L1p, L2p)
    slope = (lb / np.maximum(la, 1)).astype(np.float32)
    eps = np.full(B, 0.01, np.float32)
    dec_p, score, st = gotoh_forward_lanewise(
        jnp.asarray(match), jnp.asarray(pc), jnp.asarray(pr),
        jnp.asarray(la), jnp.asarray(lb), interpret=True,
        slope=jnp.asarray(slope), bias_eps=jnp.asarray(eps), plan=plan)
    dec_o, score_o, st_o = gotoh_forward_direct_np(
        match, pc, pr, la, lb, slope, eps)
    assert np.array_equal(np.asarray(score).view(np.int32),
                          score_o.view(np.int32))
    assert np.array_equal(np.asarray(st), st_o)
    dec_k = unpack_dec_lanewise(np.asarray(dec_p), L2p)
    for b in range(B):
        if lb[b] == 0:
            continue
        assert np.array_equal(dec_k[b, :la[b], :lb[b]],
                              dec_o[b, :la[b], :lb[b]]), b


def test_lanewise_tie_heavy_bitwise():
    """Integer-valued matches and uniform penalties make exact ties
    common; decisions must still match the oracle bitwise (the MAX3
    later-operand-on-ties and open-on-tie conventions)."""
    rng = np.random.default_rng(23)
    B, L1p, L2p = BT, 12, 12
    match = rng.integers(-3, 4, size=(B, L1p, L2p)).astype(np.float32)
    pc = np.tile(np.array([-2.0, -1.0, -0.5], np.float32)[None, :, None],
                 (B, 1, L2p + 1))
    pr = np.tile(np.array([-2.0, -1.0, -0.5], np.float32)[None, :, None],
                 (B, 1, L1p + 1))
    la = rng.integers(1, L1p + 1, size=B).astype(np.int32)
    lb = rng.integers(1, L2p + 1, size=B).astype(np.int32)
    dec_p, score, st = gotoh_forward_lanewise(
        jnp.asarray(match), jnp.asarray(pc), jnp.asarray(pr),
        jnp.asarray(la), jnp.asarray(lb), interpret=True, with_bias=False)
    dec_o, score_o, st_o = gotoh_forward_direct_np(match, pc, pr, la, lb)
    assert np.array_equal(np.asarray(score).view(np.int32),
                          score_o.view(np.int32))
    assert np.array_equal(np.asarray(st), st_o)
    dec_k = unpack_dec_lanewise(np.asarray(dec_p), L2p)
    for b in range(B):
        assert np.array_equal(dec_k[b, :la[b], :lb[b]],
                              dec_o[b, :la[b], :lb[b]]), b
    # degenerate extremes: single-cell problems
    la1 = np.ones(B, np.int32)
    lb1 = np.ones(B, np.int32)
    _, s1, st1 = gotoh_forward_lanewise(
        jnp.asarray(match), jnp.asarray(pc), jnp.asarray(pr),
        jnp.asarray(la1), jnp.asarray(lb1), interpret=True, with_bias=False)
    _, s1o, st1o = gotoh_forward_direct_np(match, pc, pr, la1, lb1)
    assert np.array_equal(np.asarray(s1).view(np.int32), s1o.view(np.int32))
    assert np.array_equal(np.asarray(st1), st1o)
