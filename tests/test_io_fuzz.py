"""Reader robustness sweep: deterministic mutations of valid inputs
(truncations, byte flips, junk injections) must either parse or raise
a clean exception — never crash the interpreter or hang.  The
reference defends with msa_check's 3-layer validation
(lib/src/msa_check.c); this is the property-style equivalent.
"""

import numpy as np
import pytest

from kalign_tpu.core.io import read_alignment_text

from conftest import DATA
import os

SOURCES = ["BB12006.tfa", "BB11001.msf", "clustal.good.1", "afa.good.1",
           "a2m.good.1"]


def _mutations(text: str, rng):
    data = text.encode()
    n = len(data)
    # truncations at structurally interesting points
    for frac in (0.1, 0.5, 0.9, 0.99):
        yield data[:int(n * frac)].decode(errors="replace")
    # byte flips
    for _ in range(12):
        b = bytearray(data)
        for _ in range(rng.integers(1, 6)):
            b[rng.integers(0, n)] = rng.integers(32, 127)
        yield b.decode(errors="replace")
    # junk injections
    for junk in ("\x00\x01\x02", ">\n>\n>", "CLUSTAL", "//", "!!NA"):
        pos = int(rng.integers(0, n))
        yield (data[:pos] + junk.encode() + data[pos:]).decode(
            errors="replace")
    # line shuffles (headers separated from bodies)
    lines = text.splitlines()
    for seed in range(3):
        r2 = np.random.default_rng(seed)
        idx = r2.permutation(len(lines))
        yield "\n".join(lines[i] for i in idx)


@pytest.mark.parametrize("src", SOURCES)
def test_mutated_inputs_never_crash(src):
    text = open(os.path.join(DATA, src), encoding="utf-8",
                errors="replace").read()
    rng = np.random.default_rng(hash(src) % 2**31)
    parsed = failed = 0
    for mut in _mutations(text, rng):
        try:
            m = read_alignment_text(mut)
            # whatever parsed must be structurally sound
            assert m.numseq >= 0
            for sq in m.sequences:
                assert sq.seq is not None
            parsed += 1
        except Exception:
            # clean failures are fine; SystemExit/KeyboardInterrupt or a
            # hang are not (pytest would surface either)
            failed += 1
    assert parsed + failed > 0
