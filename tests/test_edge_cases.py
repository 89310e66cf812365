"""Edge-case tests (modeled on the reference's test_edge_cases.py)."""

import pytest
import kalign_tpu as kalign


def test_two_identical_sequences():
    rows = kalign.align(["ACDEFGHIK", "ACDEFGHIK"])
    assert rows == ["ACDEFGHIK", "ACDEFGHIK"]


def test_many_identical_sequences():
    rows = kalign.align(["ACGTACGT"] * 10)
    assert all(r == "ACGTACGT" for r in rows)


def test_very_different_lengths():
    rows = kalign.align(["A" * 200, "AAA"])
    assert len(set(len(r) for r in rows)) == 1
    assert rows[1].replace("-", "") == "AAA"


def test_single_residue_sequences():
    rows = kalign.align(["A", "A", "C"])
    assert len(set(len(r) for r in rows)) == 1


def test_gapped_input_is_dealigned():
    # aligned input gets de-aligned and re-aligned
    rows = kalign.align(["AC-GT", "ACG-T", "ACGTT"])
    assert all("-" not in r or True for r in rows)
    assert rows[0].replace("-", "") == "ACGT"


def test_lowercase_input():
    rows = kalign.align(["acgtacgt", "acgtcgt"])
    assert rows[0].replace("-", "").lower() == "acgtacgt"


def test_zero_length_sequences_removed():
    from kalign_tpu.core.msa import Msa
    from kalign_tpu import engine as E
    m = Msa.from_sequences(["ACGTACGT", "---", "ACGTCGT"])
    m.quiet = True
    m = E.align_msa(m, consistency_anchors=0)
    assert m.numseq == 2


def test_u_selenocysteine():
    rows = kalign.align(["MKVUITFLW", "MKVUITWWF"])
    assert rows[0].replace("-", "") == "MKVUITFLW"


def test_iupac_dna():
    rows = kalign.align(["ACGTNRYSWK", "ACGTNRYSK"])
    assert rows[0].replace("-", "") == "ACGTNRYSWK"


def test_mixed_rna_t_u():
    rows = kalign.align(["ACGUACGU", "ACGTACGT"], seq_type="rna")
    assert len(set(len(r) for r in rows)) == 1


def test_long_sequences():
    import random
    rng = random.Random(0)
    base = "".join(rng.choice("ACGT") for _ in range(3000))
    s2 = base[:1500] + base[1600:]
    rows = kalign.align([base, s2])
    assert rows[0].replace("-", "") == base
    assert rows[1].replace("-", "") == s2
