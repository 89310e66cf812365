"""Ecosystem-adapter tests (reference: tests/python/test_ecosystem_
biopython.py / test_ecosystem_skbio.py).  Real libraries are used when
installed; otherwise minimal stand-in modules exercise the adapter
logic (record construction, PP confidence annotations, alphabet
dispatch) so the code paths stay covered in dependency-free CI."""

import sys
import types

import pytest

from kalign_tpu.api import align


def _fake_biopython(monkeypatch):
    class Seq(str):
        def __new__(cls, s):
            return str.__new__(cls, s)

    class SeqRecord:
        def __init__(self, seq, id="", description=""):
            self.seq, self.id, self.description = seq, id, description
            self.letter_annotations = {}

    class MultipleSeqAlignment(list):
        def __init__(self, records):
            super().__init__(records)
            self.column_annotations = {}

    bio = types.ModuleType("Bio")
    bio_align = types.ModuleType("Bio.Align")
    bio_align.MultipleSeqAlignment = MultipleSeqAlignment
    bio_seq = types.ModuleType("Bio.Seq")
    bio_seq.Seq = Seq
    bio_rec = types.ModuleType("Bio.SeqRecord")
    bio_rec.SeqRecord = SeqRecord
    bio.Align, bio.Seq, bio.SeqRecord = bio_align, bio_seq, bio_rec
    for name, mod in (("Bio", bio), ("Bio.Align", bio_align),
                      ("Bio.Seq", bio_seq), ("Bio.SeqRecord", bio_rec)):
        monkeypatch.setitem(sys.modules, name, mod)


def _fake_skbio(monkeypatch):
    class _Seq:
        def __init__(self, s, metadata=None):
            self.s, self.metadata = s, metadata or {}

    class DNA(_Seq):
        pass

    class RNA(_Seq):
        pass

    class Protein(_Seq):
        pass

    class TabularMSA(list):
        pass

    sk = types.ModuleType("skbio")
    sk.DNA, sk.RNA, sk.Protein, sk.TabularMSA = DNA, RNA, Protein, TabularMSA
    monkeypatch.setitem(sys.modules, "skbio", sk)
    return DNA, Protein


SEQS = ["MKVLITGGAGFIGS", "MKVLITGGSGFIGS", "MKVITGGAGFIGS"]
DNASEQS = ["ACGTACGTACGT", "ACGTACGAACGT", "ACGTACGTACG"]


def test_biopython_adapter(monkeypatch):
    if "Bio" not in sys.modules:
        try:
            import Bio  # noqa: F401
        except ImportError:
            _fake_biopython(monkeypatch)
    aln = align(SEQS, names=["a", "b", "c"], fmt="biopython")
    ids = [r.id for r in aln]
    assert ids == ["a", "b", "c"]
    rows = [str(r.seq) for r in aln]
    assert len(set(len(r) for r in rows)) == 1
    assert rows[0].replace("-", "") == SEQS[0]


def test_biopython_adapter_with_confidence(monkeypatch):
    if "Bio" not in sys.modules:
        try:
            import Bio  # noqa: F401
        except ImportError:
            _fake_biopython(monkeypatch)
    aln = align(SEQS, names=["a", "b", "c"], mode="precise",
                fmt="biopython")
    pp = aln[0].letter_annotations.get("posterior_probability")
    assert pp is not None and len(pp) == len(str(aln[0].seq))
    assert set(pp) <= set("0123456789*.")
    assert "posterior_probability" in aln.column_annotations


def test_skbio_adapter_alphabet_dispatch(monkeypatch):
    try:
        import skbio  # noqa: F401
        DNA = Protein = None
    except ImportError:
        DNA, Protein = _fake_skbio(monkeypatch)
    msa_p = align(SEQS, names=["a", "b", "c"], fmt="skbio")
    msa_d = align(DNASEQS, names=["a", "b", "c"], fmt="skbio")
    if DNA is not None:
        assert all(isinstance(s, Protein) for s in msa_p)
        assert all(isinstance(s, DNA) for s in msa_d)
    assert len(msa_p) == 3 and len(msa_d) == 3


def test_unknown_fmt_raises():
    with pytest.raises(ValueError):
        align(SEQS, fmt="nonsense")
