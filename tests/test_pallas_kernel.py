"""Differential tests: Pallas Gotoh kernel vs the XLA scan implementation.

Runs the Pallas kernel in interpret mode (so it executes on the CPU
backend the test suite pins) over random batched problems with ragged
lengths and asserts score + traced path equality against tpu/gotoh.py,
mirroring the reference's kernel-vs-oracle pattern (bpm_test.c).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from kalign_tpu.tpu import gotoh
from kalign_tpu.tpu.gotoh_pallas import gotoh_forward_pallas
from kalign_tpu.tpu.traceback import traceback_batch


def _random_problem(rng, B, L1p, L2p, ragged=True):
    match = rng.normal(scale=3.0, size=(B, L1p, L2p)).astype(np.float32)
    # negative penalties, per-column variation like real profiles
    pc = -np.abs(rng.normal(loc=5.0, size=(B, 3, L2p + 1))).astype(np.float32)
    pr = -np.abs(rng.normal(loc=5.0, size=(B, 3, L1p + 1))).astype(np.float32)
    pc[:, 1] *= 0.2  # ge smaller than go
    pr[:, 1] *= 0.2
    if ragged:
        la = rng.integers(1, L1p + 1, size=B).astype(np.int32)
        lb = rng.integers(1, L2p + 1, size=B).astype(np.int32)
    else:
        la = np.full(B, L1p, np.int32)
        lb = np.full(B, L2p, np.int32)
    return match, pc, pr, la, lb


def _xla_reference(match, pc, pr, la, lb):
    B = match.shape[0]
    scores, paths = [], []
    for k in range(B):
        dec, score, st = gotoh.gotoh_forward(
            jnp.asarray(match[k]), jnp.asarray(pc[k, 0]),
            jnp.asarray(pc[k, 1]), jnp.asarray(pc[k, 2]),
            jnp.asarray(pr[k, 0]), jnp.asarray(pr[k, 1]),
            jnp.asarray(pr[k, 2]), int(la[k]), int(lb[k]))
        scores.append(float(score))
        paths.append(gotoh.traceback(np.asarray(dec), int(la[k]),
                                     int(lb[k]), int(st)))
    return scores, paths


@pytest.mark.parametrize("shape", [(8, 128, 128), (8, 128, 256),
                                   (16, 256, 128)])
def test_pallas_matches_xla(shape):
    B, L1p, L2p = shape
    rng = np.random.default_rng(hash(shape) % 2**31)
    match, pc, pr, la, lb = _random_problem(rng, B, L1p, L2p)
    dec, score, st = gotoh_forward_pallas(
        jnp.asarray(match), jnp.asarray(pc), jnp.asarray(pr),
        jnp.asarray(la), jnp.asarray(lb), bt=8, interpret=True)
    steps, nsteps = traceback_batch(dec, jnp.asarray(la), jnp.asarray(lb),
                                    st, L1p + L2p + 2)
    steps = np.asarray(steps)
    nsteps = np.asarray(nsteps)
    score = np.asarray(score)

    ref_scores, ref_paths = _xla_reference(match, pc, pr, la, lb)
    for k in range(B):
        assert score[k] == pytest.approx(ref_scores[k], rel=1e-5), k
        assert steps[k, :nsteps[k]].tolist() == ref_paths[k], k


def test_pallas_degenerate_lengths():
    """lb == 0 and la == 0 problems (empty profiles) must not crash and
    must yield pure-gap paths with the terminal-gap score."""
    B, L1p, L2p = 8, 128, 128
    rng = np.random.default_rng(5)
    match, pc, pr, la, lb = _random_problem(rng, B, L1p, L2p)
    la[0] = 0
    lb[1] = 0
    lb[2] = 0
    la[2] = 0
    dec, score, st = gotoh_forward_pallas(
        jnp.asarray(match), jnp.asarray(pc), jnp.asarray(pr),
        jnp.asarray(la), jnp.asarray(lb), bt=8, interpret=True)
    steps, nsteps = traceback_batch(dec, jnp.asarray(la), jnp.asarray(lb),
                                    st, L1p + L2p + 2)
    steps = np.asarray(steps)
    nsteps = np.asarray(nsteps)
    score = np.asarray(score)
    # la == 0: all-GA path of length lb, score = cumsum(tgeB[1..lb])
    assert nsteps[0] == lb[0]
    assert (steps[0, :nsteps[0]] == 1).all()
    assert score[0] == pytest.approx(float(np.sum(pc[0, 2, 1:lb[0] + 1])),
                                     rel=1e-5)
    # lb == 0: all-GB path of length la, score = cumsum(tgeA[1..la])
    assert nsteps[1] == la[1]
    assert (steps[1, :nsteps[1]] == 2).all()
    assert score[1] == pytest.approx(float(np.sum(pr[1, 2, 1:la[1] + 1])),
                                     rel=1e-5)
    # both empty: empty path
    assert nsteps[2] == 0


def test_traceback_large_batch_validity():
    """Regression: a vmapped int8 scatter miscompiled on TPU at batch
    sizes >= ~1024, silently corrupting traceback walks (valid at
    B<=512, 479/2048 invalid above).  The walk buffer is int32 now;
    every path must consume exactly (la, lb) residues."""
    B, L1p, L2p = 1024, 128, 128
    rng = np.random.default_rng(31)
    match, pc, pr, la, lb = _random_problem(rng, B, L1p, L2p)
    dec, score, st = gotoh_forward_pallas(
        jnp.asarray(match), jnp.asarray(pc), jnp.asarray(pr),
        jnp.asarray(la), jnp.asarray(lb), bt=8, interpret=True)
    steps, nsteps = traceback_batch(dec, jnp.asarray(la), jnp.asarray(lb),
                                    st, L1p + L2p + 2)
    steps = np.asarray(steps)
    nsteps = np.asarray(nsteps)
    for k in range(B):
        s = steps[k, :nsteps[k]]
        assert np.sum(s != 1) == la[k], k
        assert np.sum(s != 2) == lb[k], k


def test_pallas_scores_only_pre_transposed():
    """The bench.py configuration: no decisions, no centering bias,
    stream-layout input.  The scores-only branch shares the colpen
    packing with the full path but takes the cheaper roll — it must
    produce identical scores."""
    B, L1p, L2p = 8, 128, 128
    rng = np.random.default_rng(977)
    match, pc, pr, la, lb = _random_problem(rng, B, L1p, L2p)
    mt = np.ascontiguousarray(np.transpose(match, (1, 0, 2)))  # [L1, B, W]
    _, score, _ = gotoh_forward_pallas(
        jnp.asarray(mt), jnp.asarray(pc), jnp.asarray(pr),
        jnp.asarray(la), jnp.asarray(lb), bt=8, with_dec=False,
        with_bias=False, pre_transposed=True, interpret=True)
    score = np.asarray(score)
    ref_scores, _ = _xla_reference(match, pc, pr, la, lb)
    for k in range(B):
        assert score[k] == pytest.approx(ref_scores[k], rel=1e-5), k
