"""Mesh-sharded merge execution (8 virtual CPU devices via conftest)."""

import os

import numpy as np
import pytest

import jax

from kalign_tpu.core import io as kio
from kalign_tpu import engine as E

from conftest import DATA


@pytest.mark.skipif(jax.device_count() < 2,
                    reason="needs a multi-device mesh")
def test_mesh_engine_matches_single_device():
    """engine='tpu-mesh' (merge batch sharded over all devices) must
    produce the same alignment as the single-device TPU engine."""
    m1 = kio.read_inputs([os.path.join(DATA, "BB30014.tfa")])
    m1 = E.align_msa(m1, consistency_anchors=5, engine="tpu-fast")
    m2 = kio.read_inputs([os.path.join(DATA, "BB30014.tfa")])
    m2 = E.align_msa(m2, consistency_anchors=5, engine="tpu-mesh")
    assert m1.aligned_rows() == m2.aligned_rows()


@pytest.mark.skipif(jax.device_count() < 2,
                    reason="needs a multi-device mesh")
def test_sharded_bucket_step_direct():
    """sharded_bucket_step output equals the unsharded fused step."""
    from kalign_tpu.parallel.mesh import make_mesh, sharded_bucket_step
    from kalign_tpu.tpu.engine import TpuEngine

    rng = np.random.default_rng(23)
    B, L1p, L2p = 16, 128, 128
    lhs = rng.normal(size=(B, L1p, 23)).astype(np.float32)
    rhs = rng.normal(size=(B, L2p, 23)).astype(np.float32)
    pc = -np.abs(rng.normal(loc=5.0, size=(B, 3, L2p + 1))).astype(np.float32)
    pr = -np.abs(rng.normal(loc=5.0, size=(B, 3, L1p + 1))).astype(np.float32)
    pc[:, 1] *= 0.2
    pr[:, 1] *= 0.2
    la = rng.integers(8, L1p + 1, size=B).astype(np.int32)
    lb = rng.integers(8, L2p + 1, size=B).astype(np.int32)
    eps = np.full(B, 1e-3, np.float32)

    mesh = make_mesh()
    steps_m, scores_m = sharded_bucket_step(mesh, lhs, rhs, pc, pr,
                                            la, lb, eps)
    eng = TpuEngine(use_pallas=False)
    steps_s, scores_s = eng._run_bucket(lhs, rhs, pc, pr, la, lb, eps, None)
    assert np.allclose(scores_m, scores_s, rtol=1e-5)
    for a, b in zip(steps_m, steps_s):
        assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(jax.device_count() < 2,
                    reason="needs a multi-device mesh")
def test_sharded_long_gotoh_matches_single_device():
    """Column-sharded pipelined-wavefront DP (the sequence-parallel
    axis for very long sequences): scores and traced paths must equal
    the single-device implementation."""
    import jax.numpy as jnp
    from kalign_tpu.parallel.mesh import make_mesh, sharded_long_gotoh
    from kalign_tpu.tpu import gotoh
    from kalign_tpu.tpu.traceback import traceback_batch

    mesh = make_mesh()
    rng = np.random.default_rng(33)
    for _ in range(3):
        L1 = int(rng.integers(40, 160))
        W = 128
        la = int(rng.integers(30, L1 + 1))
        lb = int(rng.integers(60, W + 1))
        match = rng.normal(scale=3.0, size=(L1, W)).astype(np.float32)
        pc = -np.abs(rng.normal(loc=5.0, size=(3, W + 1))).astype(np.float32)
        pr = -np.abs(rng.normal(loc=5.0, size=(3, L1 + 1))).astype(np.float32)
        pc[1] *= 0.2
        pr[1] *= 0.2
        dec, score, st = sharded_long_gotoh(mesh, match, pc, pr, la, lb)
        d2, s2, st2 = gotoh.gotoh_forward(
            jnp.asarray(match), jnp.asarray(pc[0]), jnp.asarray(pc[1]),
            jnp.asarray(pc[2]), jnp.asarray(pr[0]), jnp.asarray(pr[1]),
            jnp.asarray(pr[2]), la, lb)
        ref_path = gotoh.traceback(np.asarray(d2), la, lb, int(st2))
        steps, n = traceback_batch(jnp.asarray(dec[None]),
                                   jnp.asarray([la]), jnp.asarray([lb]),
                                   jnp.asarray([st]), L1 + W + 2)
        path = np.asarray(steps)[0, :int(np.asarray(n)[0])].tolist()
        assert score == pytest.approx(float(s2), rel=1e-5)
        assert path == ref_path


@pytest.mark.skipif(jax.device_count() < 2,
                    reason="needs a multi-device mesh")
def test_mesh_engine_long_seq_route(monkeypatch):
    """VMEM-infeasible widths on a mesh route single giant merges
    through the column-sharded wavefront DP; alignment must equal the
    single-device engine's."""
    import kalign_tpu.tpu.gotoh_pallas as gp

    m1 = kio.read_inputs([os.path.join(DATA, "BB12006.tfa")])
    m1 = E.align_msa(m1, consistency_anchors=0, engine="tpu-fast")
    ref_rows = m1.aligned_rows()

    # force every plan infeasible so the mesh engine must take the
    # sequence-parallel route for small buckets
    monkeypatch.setattr(gp, "pick_plan", lambda B, W, **kw: (8, 1, False))
    m2 = kio.read_inputs([os.path.join(DATA, "BB12006.tfa")])
    m2 = E.align_msa(m2, consistency_anchors=0, engine="tpu-mesh")
    assert m2.aligned_rows() == ref_rows


@pytest.mark.skipif(jax.device_count() < 2,
                    reason="needs a multi-device mesh")
def test_sharded_long_gotoh_leading_gap_run_boundary():
    """Regression: an optimal path whose leading column-gap run is
    exactly W/n_dev columns crosses device 1's first column at row 1 —
    that cell's only finite diagonal predecessor is device 0's ROW-0
    boundary state (the terminal-gap cumsum), which the wavefront must
    ship via an inactive step-0 ppermute.  Before the fix the sharded
    score silently lost that predecessor."""
    import jax.numpy as jnp
    from kalign_tpu.parallel.mesh import make_mesh, sharded_long_gotoh
    from kalign_tpu.tpu import gotoh
    from kalign_tpu.tpu.traceback import traceback_batch

    mesh = make_mesh()
    n_dev = mesh.devices.size
    W = 16 * n_dev
    Wd = W // n_dev
    la = 24
    lb = W
    # diagonal reward band starting exactly at device 1's first column
    match = np.full((la, W), -10.0, np.float32)
    for i in range(la):
        match[i, Wd + i] = 50.0
    pc = np.zeros((3, W + 1), np.float32)
    pc[0, :] = -8.0   # gap open
    pc[1, :] = -4.0   # gap extend
    pc[2, :] = -0.5   # terminal gap extend (cheap leading run)
    pr = np.zeros((3, la + 1), np.float32)
    pr[0, :] = -8.0
    pr[1, :] = -4.0
    pr[2, :] = -0.5

    dec, score, st = sharded_long_gotoh(mesh, match, pc, pr, la, lb)
    d2, s2, st2 = gotoh.gotoh_forward(
        jnp.asarray(match), jnp.asarray(pc[0]), jnp.asarray(pc[1]),
        jnp.asarray(pc[2]), jnp.asarray(pr[0]), jnp.asarray(pr[1]),
        jnp.asarray(pr[2]), la, lb)
    ref_path = gotoh.traceback(np.asarray(d2), la, lb, int(st2))
    steps, n = traceback_batch(jnp.asarray(dec[None]),
                               jnp.asarray([la]), jnp.asarray([lb]),
                               jnp.asarray([st]), la + W + 2)
    path = np.asarray(steps)[0, :int(np.asarray(n)[0])].tolist()
    assert score == pytest.approx(float(s2), rel=1e-6)
    assert path == ref_path
    # the constructed optimum really has the leading run of Wd gaps
    assert path[:Wd] == [1] * Wd and path[Wd] == 0
