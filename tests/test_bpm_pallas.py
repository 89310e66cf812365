"""Pallas BPM kernel differential (requires a real TPU backend; the CPU
test suite exercises the XLA implementation, which mesh falls back to
off-TPU, and conftest pins the suite to CPU).  Run on hardware with:
    python tests/test_bpm_pallas.py
"""

import numpy as np
import pytest

import jax


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pallas BPM kernel needs a TPU backend "
                           "(interpret mode is impractically slow)")
def test_bpm_pallas_bit_exact_vs_xla():
    import jax.numpy as jnp
    from kalign_tpu.tpu import bpm
    from kalign_tpu.tpu.bpm_pallas import bpm_batch_pallas

    rng = np.random.default_rng(3)
    B, T = 2048, 300
    texts = rng.integers(0, 13, size=(B, T)).astype(np.uint8)
    n = rng.integers(50, T + 1, size=B).astype(np.int32)
    pats = rng.integers(0, 13, size=(B, bpm.MAX_PATTERN)).astype(np.uint8)
    m = rng.integers(20, 290, size=B).astype(np.int32)
    peq = bpm.build_peq(jnp.asarray(pats), jnp.asarray(m))
    max_steps = int(T + bpm.WORD)
    ref = np.asarray(bpm.bpm_batch(jnp.asarray(texts), jnp.asarray(n),
                                   peq, jnp.asarray(m), max_steps))
    out = np.asarray(bpm_batch_pallas(jnp.asarray(texts), jnp.asarray(n),
                                      peq, jnp.asarray(m), max_steps,
                                      bt=1024))
    assert np.array_equal(out, ref)
    # static nblk sized to the longest pattern (m < 290 -> 5 blocks):
    # identical distances at a fraction of the per-character block work
    out5 = np.asarray(bpm_batch_pallas(jnp.asarray(texts), jnp.asarray(n),
                                       peq, jnp.asarray(m), max_steps,
                                       bt=1024, nblk=5))
    assert np.array_equal(out5, ref)


if __name__ == "__main__":
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    test_bpm_pallas_bit_exact_vs_xla()
    print("bpm_pallas bit-exact vs XLA: OK")
