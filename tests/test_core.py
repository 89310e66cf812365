"""Unit tests for alphabets, I/O, checksums, RNG, and the BPM kernel."""

import os
import random

import numpy as np
import pytest

from kalign_tpu.core import alphabet as alpha
from kalign_tpu.core import io as kio
from kalign_tpu.core import params as P
from kalign_tpu.core.msa import Msa, gcg_checksum
from kalign_tpu.utils.rng import XoshiroRng
from kalign_tpu.native import lib, flatten_seqs

from conftest import DATA


def test_alphabet_sizes():
    assert alpha.get_alphabet(alpha.ALPHA_AMBIGUOUS_PROTEIN)[1] == 23
    assert alpha.get_alphabet(alpha.ALPHA_DEFAULT_PROTEIN)[1] == 21
    assert alpha.get_alphabet(alpha.ALPHA_REDUCED_PROTEIN)[1] == 13
    assert alpha.get_alphabet(alpha.ALPHA_DEFAULT_DNA)[1] == 5


def test_reduced_protein_merges():
    t, _ = alpha.get_alphabet(alpha.ALPHA_REDUCED_PROTEIN)
    for grp in ["LM", "IV", "KR", "EQZ", "AST", "NDB", "FY", "CU"]:
        codes = {t[ord(c)] for c in grp}
        assert len(codes) == 1, grp
    # lowercase mirrors uppercase
    assert t[ord("a")] == t[ord("A")]


def test_dna_iupac_merge():
    t, _ = alpha.get_alphabet(alpha.ALPHA_DEFAULT_DNA)
    assert t[ord("U")] == t[ord("T")]
    n = t[ord("N")]
    for c in "RYSWKMBDHV":
        assert t[ord(c)] == n


def test_matrix_values():
    # spot checks against aln_param.c
    assert P.PFASUM43[0, 0] == 4 and P.PFASUM43[4, 4] == 13
    assert P.PFASUM60[17, 17] == 14
    assert P.GON250[17, 17] == 142
    assert P.DNA_MATRIX[0, 0] == 5 and P.DNA_MATRIX[0, 1] == -4
    assert abs(P.RNA_MATRIX[0, 0] - (283 + 91)) < 1e-6


def test_detect_alphabet():
    m = Msa.from_sequences(["ACGTACGTACGT", "ACGTTGCAACGT"])
    assert m.biotype == 1  # DNA
    m = Msa.from_sequences(["MKVLITFLW", "MKVLITWWF"])
    assert m.biotype == 0  # protein


def test_fasta_roundtrip():
    msa = kio.read_alignment(os.path.join(DATA, "BB11001.tfa"))
    assert msa.numseq == 4
    assert all(sq.len > 0 for sq in msa.sequences)


def test_format_detect():
    assert kio.detect_format([">x", "ACGT"]) == kio.FORMAT_FA
    assert kio.detect_format(["!!AA_MULTIPLE_ALIGNMENT 1.0"]) == kio.FORMAT_MSF
    assert kio.detect_format(["CLUSTAL W (1.83)"]) == kio.FORMAT_CLU
    assert kio.detect_format(["random text"]) == kio.FORMAT_DETECT_FAIL


def test_gcg_checksum():
    # value computed by the reference GCGchecksum for "ACDE"
    assert gcg_checksum("ACDE") == (1 * 65 + 2 * 67 + 3 * 68 + 4 * 69) % 10000


def test_rng_reproducible():
    a = XoshiroRng(42)
    b = XoshiroRng(42)
    va = [a.next_u64() for _ in range(10)]
    vb = [b.next_u64() for _ in range(10)]
    assert va == vb
    g = XoshiroRng(7)
    vals = [g.gaussian(1.0, 0.1) for _ in range(100)]
    assert all(isinstance(v, float) for v in vals)
    assert abs(np.mean(vals) - 1.0) < 0.1


def test_bpm_against_scalar_oracle():
    """Differential test modeled on the reference bpm_utest
    (lib/src/bpm_test.c): mutate a sequence k times, edit distance from
    the blocked bit-parallel kernel must equal the banded scalar DP."""
    L = lib()
    rng = random.Random(1234)
    for _ in range(300):
        m = rng.randint(8, 255)
        n = rng.randint(m, m + 100)
        t = np.array([rng.randrange(13) for _ in range(n)], dtype=np.uint8)
        p = t[:m].copy()
        for _ in range(rng.randint(0, 10)):
            p[rng.randrange(m)] = rng.randrange(13)
        r_fast = L.kt_bpm_block(t, p, n, m)
        r_oracle = L.kt_edit_oracle(t, p, n, m)
        assert r_fast == r_oracle


def test_glibc_msort_tie_behavior():
    from kalign_tpu.utils.sorting import glibc_msort
    items = [(3, "a"), (1, "b"), (3, "c"), (2, "d"), (3, "e")]
    # comparator that never returns 0 on equal keys (like sort_by_len)
    out = glibc_msort(items, lambda x, y: -1 if x[0] > y[0] else 1)
    assert [k for k, _ in out] == [3, 3, 3, 2, 1]


def test_shuffle_seq_reference_semantics():
    """msa_shuffle_seq replica (msa_sort.c:46-58): deterministic under
    the xoshiro RNG and a permutation of the input."""
    from kalign_tpu.core.msa import Msa
    from kalign_tpu.utils.rng import XoshiroRng

    names = [f"s{i}" for i in range(8)]
    msa = Msa.from_sequences(["ACDEF"] * 8, names)
    msa.shuffle_seq(XoshiroRng(7))
    order1 = [sq.name for sq in msa.sequences]
    assert sorted(order1) == sorted(names)

    msa2 = Msa.from_sequences(["ACDEF"] * 8, names)
    msa2.shuffle_seq(XoshiroRng(7))
    assert [sq.name for sq in msa2.sequences] == order1
