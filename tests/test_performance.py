"""Performance smoke bounds (reference: tests/python/test_performance.py
— e.g. 10x400bp DNA must align in well under 10 s on one CPU core)."""

import time

import numpy as np

from kalign_tpu import api


def _dna(n, length, seed):
    rng = np.random.default_rng(seed)
    base = "".join(rng.choice(list("ACGT"), size=length))
    seqs = []
    for _ in range(n):
        mut = list(base)
        for _ in range(length // 20):
            p = rng.integers(0, len(mut))
            mut[p] = rng.choice(list("ACGT"))
        seqs.append("".join(mut))
    return seqs


def test_dna_smoke_time():
    seqs = _dna(10, 400, 3)
    t0 = time.time()
    rows = api.align(seqs)
    assert time.time() - t0 < 10.0
    assert len(set(map(len, rows))) == 1


def test_protein_100_smoke_time():
    from kalign_tpu.dssim import generate_test_sequences
    seqs, names = generate_test_sequences(n_seq=100, length=250, seed=4)
    t0 = time.time()
    rows = api.align(seqs, names=names)
    assert time.time() - t0 < 30.0
    assert len(set(map(len, rows))) == 1


def test_cache_key_device_assignment_strip():
    """KALIGN_TPU_CACHE_KEY_STRIP_DEVICES: identical programs granted
    different device ordinals (pooled/remotely-claimed TPU setups) must
    hash to one persistent-cache entry once the strip is installed —
    jax only does this for GPU by default (cache_key.py)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax._src import cache_key as ck
    from jax._src import compiler
    from kalign_tpu.utils import _strip_device_assignment_from_cache_key

    f = jax.jit(lambda x: (x @ x).sum())
    mod = f.lower(jnp.ones((16, 16))).compiler_ir()
    backend = jax.devices()[0].client
    devs = np.array(jax.devices())

    def key(ids):
        opts = compiler.get_compile_options(
            num_replicas=1, num_partitions=1, device_assignment=[ids])
        return ck.get(mod, devs, opts, backend)

    assert key([0]) != key([1])          # jax default on non-GPU
    _strip_device_assignment_from_cache_key()
    try:
        assert key([0]) == key([1])
        assert key([0]) == key([7])
    finally:
        # leave the patch installed; it is idempotent and the strip only
        # widens cache hits
        pass
