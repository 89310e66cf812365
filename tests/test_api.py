"""API-level tests modeled on the reference python test suite
(tests/python/): validation, modes, sequence types, determinism,
io helpers, utils, dssim."""

import io as _io
import os

import numpy as np
import pytest

import kalign_tpu as kalign
from kalign_tpu.api import generate_test_sequences
from conftest import DATA


PROT = ["MKVLITFLWCGHIKKE", "MKVLITWWFCGHIKE", "MKVLGTFLWCGHKKE",
        "MKVLITFLWCGHIKAE"]
DNA = ["ACGTACGTAGCTAGCTAG", "ACGTACGTAGCTAGCAG", "ACGTACGAGCTAGCTAG"]


def test_align_basic():
    rows = kalign.align(PROT)
    assert len(rows) == 4
    assert len(set(len(r) for r in rows)) == 1
    for r, s in zip(rows, PROT):
        assert r.replace("-", "") == s


def test_align_dna_autodetect():
    rows = kalign.align(DNA)
    assert len(rows) == 3
    for r, s in zip(rows, DNA):
        assert r.replace("-", "") == s


def test_validation_errors():
    with pytest.raises(ValueError):
        kalign.align(["ONLYONE"])
    with pytest.raises(ValueError):
        kalign.align(["AC", ""])
    with pytest.raises(ValueError):
        kalign.align(["AC1G", "ACGT"])
    with pytest.raises(ValueError):
        kalign.align(["AC\x01G", "ACGT"])
    with pytest.raises(TypeError):
        kalign.align([b"ACGT", "ACGT"])
    with pytest.raises(ValueError):
        kalign.align(PROT, seq_type="bogus")
    with pytest.raises(ValueError):
        kalign.align(PROT, mode="bogus")


def test_type_mismatch_errors():
    with pytest.raises(ValueError):
        kalign.align(DNA, seq_type="protein")
    with pytest.raises(ValueError):
        kalign.align(PROT, seq_type="dna")


def test_modes():
    default = kalign.align(PROT)
    fast = kalign.align(PROT, mode="fast")
    precise = kalign.align(PROT, mode="precise")
    for rows in (default, fast, precise):
        assert len(set(len(r) for r in rows)) == 1


def test_determinism():
    """Reference determinism contract (test_performance.py:20-39):
    repeated runs and different thread counts give identical output."""
    seqs, names = generate_test_sequences(12, 10, True, 200, 5)
    a = kalign.align(seqs, names=names, n_threads=1)
    b = kalign.align(seqs, names=names, n_threads=4)
    c = kalign.align(seqs, names=names, n_threads=1)
    assert a == b == c


def test_gap_penalty_overrides():
    a = kalign.align(PROT)
    b = kalign.align(PROT, gap_open=20.0, gap_extend=5.0,
                     terminal_gap_extend=3.0)
    assert all(r.replace("-", "") == s for r, s in zip(b, PROT))
    # stronger penalties should produce no-more-gappy alignment
    assert len(b[0]) <= len(a[0]) + 4


def test_dssim_shapes():
    seqs, names = generate_test_sequences(8, 10, False, 100, 1)
    assert len(seqs) == 8
    assert names == [str(i + 1) for i in range(8)]
    assert all(set(s) <= set("ACDEFGHIKLMNPQRSTVWY") for s in seqs)
    dna, _ = generate_test_sequences(4, 10, True, 80, 2)
    assert all(set(s) <= set("ACGT") for s in dna)


def test_align_from_file_and_write(tmp_path):
    out = tmp_path / "out.afa"
    kalign.align_file_to_file(os.path.join(DATA, "small.fa"), str(out))
    text = out.read_text()
    assert text.startswith(">")
    msa = kalign.read_alignment(str(out))
    assert msa.numseq == 17


def test_io_writers(tmp_path):
    rows = kalign.align(PROT)
    import kalign_tpu.io as kio
    buf = _io.StringIO()
    kio.write_fasta(rows, buf, ids=["a", "b", "c", "d"])
    assert buf.getvalue().count(">") == 4
    buf = _io.StringIO()
    kio.write_phylip(rows, buf)
    assert buf.getvalue().startswith(f" 4 {len(rows[0])}")
    buf = _io.StringIO()
    kio.write_stockholm(rows, buf,
                        column_confidence=[0.5] * len(rows[0]),
                        residue_confidence=[[0.9] * len(rows[0])] * 4)
    sto = buf.getvalue()
    assert sto.startswith("# STOCKHOLM 1.0")
    assert "#=GR" in sto and "#=GC PP_cons" in sto
    buf = _io.StringIO()
    kio.write_clustal(rows, buf)
    assert "CLUSTAL" in buf.getvalue()


def test_utils():
    from kalign_tpu.utils import (alignment_stats, consensus_sequence,
                                  pairwise_identity_matrix,
                                  remove_gap_columns, to_array)
    rows = kalign.align(PROT)
    st = alignment_stats(rows)
    assert st["n_sequences"] == 4
    assert 0 <= st["gap_fraction"] <= 1
    cons = consensus_sequence(rows)
    assert len(cons) == len(rows[0])
    m = pairwise_identity_matrix(rows)
    assert m.shape == (4, 4)
    assert np.allclose(np.diag(m), 1.0)
    assert to_array(rows).shape == (4, len(rows[0]))
    assert remove_gap_columns(["A-G", "A-G"]) == ["AG", "AG"]


def test_stdin_like_multiple_inputs(tmp_path):
    from kalign_tpu.core import io as cio
    p1 = tmp_path / "a.fa"
    p2 = tmp_path / "b.fa"
    p1.write_text(">x\nMKVLITFLW\n>y\nMKVLITWWF\n")
    p2.write_text(">z\nMKVLGTFLW\n")
    msa = cio.read_inputs([str(p1), str(p2)])
    assert msa.numseq == 3


def test_auto_engine_resolves():
    """engine="auto": host on CPU-only backends / small inputs; the
    policy function is device-aware."""
    from kalign_tpu.core.msa import Msa
    from kalign_tpu.engine import align_msa, resolve_auto_engine

    m = Msa.from_sequences(["ACDEFGHIK", "ACDEFGIK", "CDEFGHIK"],
                           ["a", "b", "c"])
    assert resolve_auto_engine(m) == "host"   # CPU backend in tests
    m.quiet = True
    out = align_msa(m, engine="auto")
    rows = out.aligned_rows()
    assert len(set(len(r) for r in rows)) == 1


def test_garbage_inputs_fail_cleanly():
    """Robustness fuzz: hostile inputs must raise clean ValueErrors,
    never crash (reference test_error_handling.py intent)."""
    import pytest
    from kalign_tpu.api import align

    for bad in ([], [""], ["ACGT", ""], ["123"], ["AC\x00GT", "ACGT"],
                ["\n\n"], ["-"]):
        with pytest.raises((ValueError, TypeError)):
            align(bad)


def test_garbage_files_fail_cleanly(tmp_path):
    import pytest
    from kalign_tpu.core import io as kio

    for i, content in enumerate((
            "", "\x00\x01\x02", ">only_header_no_seq\n",
            "random text\nwithout format\n",
            "CLUSTAL W\n\n")):
        p = tmp_path / f"bad{i}.fa"
        p.write_text(content)
        with pytest.raises((ValueError, RuntimeError)):
            m = kio.read_inputs([str(p)])
            m.essential_input_check()
