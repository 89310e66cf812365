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


def _ref_clean_lines(text):
    out = []
    for raw in text.split("\n"):
        cut = len(raw)
        for i, ch in enumerate(raw):
            if ord(ch) < 32 or ord(ch) == 127:
                cut = i
                break
        out.append(raw[:cut])
    if text.endswith("\n") and out and out[-1] == "":
        out.pop()
    return out


def _ref_read_fasta(lines):
    """Per-char reference of the FASTA scan semantics the vectorized
    reader must reproduce exactly (the pre-vectorization loop)."""
    from kalign_tpu.core.msa import Msa, MsaSeq, _ispunct
    msa = Msa()
    sq = None
    residues = []

    def flush():
        if sq is not None:
            sq.seq = "".join(residues)
            sq.len = len(sq.seq)

    for line in lines:
        if line.startswith(">"):
            flush()
            sq = MsaSeq(name=line[1:])
            sq.gaps = [0]
            residues = []
            msa.sequences.append(sq)
        elif sq is not None:
            for ch in line:
                msa.letter_freq[min(ord(ch), 127)] += 1
                if ch.isalpha() and ord(ch) < 128:
                    residues.append(ch)
                    sq.gaps.append(0)
                elif _ispunct(ch):
                    sq.gaps[-1] += 1
        else:
            for ch in line:
                msa.letter_freq[min(ord(ch), 127)] += 1
                if ch.isalpha():
                    raise ValueError("seq before name")
    flush()
    return msa


def test_vectorized_reader_matches_per_char_reference():
    """Differential: the vectorized _clean_lines + read_fasta_lines
    must equal the per-char reference on adversarial inputs (control
    chars mid-line, non-ASCII, punctuation runs, empty blocks)."""
    from kalign_tpu.core import io as kio

    rng = np.random.default_rng(13)
    alphabet = list("ACGTacgtN->.~*# \t\réß\x01\x7f0123")
    for trial in range(40):
        n = int(rng.integers(0, 400))
        text = "".join(
            ">" if (rng.random() < 0.02) else
            "\n" if (rng.random() < 0.12) else
            str(rng.choice(alphabet)) for _ in range(n))
        lines_v = kio._clean_lines(text)
        lines_r = _ref_clean_lines(text)
        assert lines_v == lines_r, (trial, text[:80])
        # guarantee at least one header so both parsers accept
        lines = [">s0"] + lines_v
        try:
            want = _ref_read_fasta(list(lines))
            err = None
        except ValueError:
            err = True
        if err:
            with pytest.raises(ValueError):
                kio.read_fasta_lines(list(lines))
            continue
        got = kio.read_fasta_lines(list(lines))
        assert len(got.sequences) == len(want.sequences)
        for a, b in zip(got.sequences, want.sequences):
            assert a.name == b.name
            assert a.seq == b.seq
            assert list(a.gaps) == list(b.gaps), (trial, a.name)
        assert np.array_equal(got.letter_freq, want.letter_freq), trial
