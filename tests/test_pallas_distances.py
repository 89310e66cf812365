"""pallas_anchor_distances: the single-TPU distance fast path.

The index-chunk logic (resident token table, per-pair orientation,
padding, lax.map sub-chunking) is exercised on CPU by substituting the
XLA Myers kernel (bit-exact with the Pallas kernel, differentially
tested on chip in test_bpm_pallas.py) for the Pallas call.  On a real
TPU backend the genuine kernel path runs end-to-end.
"""

import numpy as np
import pytest

import jax


def _host_expected(codes, anchors):
    from kalign_tpu.engine import HostEngine
    eng = HostEngine()
    dm = eng.anchor_distances(codes, anchors)[:, :len(anchors)]
    # strip the length-preference bias: pallas_anchor_distances returns
    # raw integer distances (the caller adds the bias)
    lens = np.asarray([len(c) for c in codes], np.int64)
    a_lens = lens[np.asarray(anchors)]
    s = (lens[:, None] + a_lens[None, :]) // 2
    bias = np.minimum(10000.0, s.astype(np.float64)) / 10000.0
    raw = np.asarray(dm, np.float64) - bias
    return np.rint(raw).astype(np.int64)


def _codes(rng, n, lo=30, hi=400):
    return [np.asarray(rng.integers(0, 13, size=int(rng.integers(lo, hi))),
                       np.uint8) for _ in range(n)]


def test_index_chunk_logic_matches_host(monkeypatch):
    """Multi-chunk, padded, both orientations; XLA kernel substituted."""
    from kalign_tpu.parallel import mesh as M
    from kalign_tpu.tpu import bpm, bpm_pallas

    def shim(texts, n, peq, m, max_steps, bt=1024, interpret=False,
             nblk=bpm.NBLK):
        # pad the nblk-sliced Peq back to NBLK for the XLA oracle
        if peq.shape[2] < bpm.NBLK:
            import jax.numpy as jnp
            peq = jnp.pad(peq, ((0, 0), (0, 0),
                                (0, bpm.NBLK - peq.shape[2]), (0, 0)))
        return bpm.bpm_batch(texts, n, peq, m, max_steps)

    monkeypatch.setattr(bpm_pallas, "bpm_batch_pallas", shim)
    M._dist_chunk.clear_cache()

    rng = np.random.default_rng(23)
    codes = _codes(rng, 17)
    anchors = [0, 3, 9, 16]
    tokens = np.zeros((len(codes), max(len(c) for c in codes)), np.uint8)
    for i, c in enumerate(codes):
        tokens[i, :len(c)] = c
    lens = np.asarray([len(c) for c in codes], np.int32)

    # chunk=24 -> sub=24, 17*4=68 pairs -> 3 chunks with padding
    got = M.pallas_anchor_distances(tokens, lens, anchors, bt=8, chunk=24)
    M._dist_chunk.clear_cache()
    want = _host_expected(codes, anchors)
    assert np.array_equal(got.astype(np.int64), want), \
        np.argwhere(got != want)[:5]


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas kernel path needs a TPU backend")
def test_pallas_path_on_tpu():
    from kalign_tpu.parallel import mesh as M

    rng = np.random.default_rng(29)
    codes = _codes(rng, 40)
    anchors = [0, 7, 21, 39]
    tokens = np.zeros((len(codes), max(len(c) for c in codes)), np.uint8)
    for i, c in enumerate(codes):
        tokens[i, :len(c)] = c
    lens = np.asarray([len(c) for c in codes], np.int32)
    got = M.pallas_anchor_distances(tokens, lens, anchors, bt=8, chunk=64)
    want = _host_expected(codes, anchors)
    assert np.array_equal(got.astype(np.int64), want)


if __name__ == "__main__":
    test_pallas_path_on_tpu()
    print("pallas_anchor_distances on TPU: OK")
