"""I/O round-trip tests against the reference's known-good files
(modeled on tests/kalign_io_test.c)."""

import os
import glob
import pytest

from kalign_tpu.core import io as kio
from conftest import DATA


@pytest.mark.parametrize("path", sorted(
    glob.glob(os.path.join(DATA, "*.good.*"))))
def test_read_good_files(path):
    msa = kio.read_alignment(path)
    assert msa.numseq >= 2
    assert all(sq.len > 0 for sq in msa.sequences)


def test_afa_reread_identical():
    """FASTA write(read(x)) is idempotent for aligned input."""
    src = sorted(glob.glob(os.path.join(DATA, "afa.good.*")))[0]
    msa = kio.read_alignment(src)
    assert msa.aligned == 2
    msa.finalise()
    text = kio.write_fasta(msa)
    msa2 = kio.read_alignment_text(text)
    msa2.finalise()
    assert [s.seq for s in msa.sequences] == [s.seq for s in msa2.sequences]
    assert [s.name for s in msa.sequences] == [s.name for s in msa2.sequences]


def test_format_conversion_cycle():
    src = os.path.join(DATA, "BB11001.msf")
    msa = kio.read_alignment(src)
    msa.finalise()
    clu = kio.write_clu(msa)
    msa_clu = kio.read_alignment_text(clu)
    msa_clu.finalise()
    # names in CLU are whitespace-truncated; sequences must round-trip
    assert [s.seq for s in msa.sequences] == [s.seq for s in msa_clu.sequences]
    msf = kio.write_msf(msa, None)
    msa_msf = kio.read_alignment_text(msf)
    msa_msf.finalise()
    assert [s.seq for s in msa.sequences] == [s.seq for s in msa_msf.sequences]


def test_truncated_msf_does_not_crash():
    src = "/root/reference/tests/data/BB11001_EOF.msf"
    if not os.path.exists(src):
        pytest.skip("no truncated file")
    try:
        msa = kio.read_alignment(src)
    except ValueError:
        return  # acceptable: clean error
    assert msa.numseq >= 0


def test_stockholm_reader_roundtrip(tmp_path):
    """Stockholm read capability (beyond the reference, which only
    writes it): writer -> reader round trip incl. PP annotation lines
    and multi-block continuation."""
    from kalign_tpu.core import io as kio

    sto = (
        "# STOCKHOLM 1.0\n"
        "#=GF ID test\n"
        "seq1   ACDE-FG\n"
        "seq2   ACDEQFG\n"
        "#=GR seq1 PP 99999.9\n"
        "\n"
        "seq1   HIK\n"
        "seq2   H-K\n"
        "#=GC PP_cons 999\n"
        "//\n")
    p = tmp_path / "t.sto"
    p.write_text(sto)
    m = kio.read_alignment(str(p))
    assert [sq.name for sq in m.sequences] == ["seq1", "seq2"]
    if m.aligned == 2:
        m.finalise()
    rows = m.aligned_rows()
    assert rows == ["ACDE-FGHIK", "ACDEQFGH-K"]


def test_stockholm_via_format_alignment(tmp_path):
    from kalign_tpu.api import align, write_alignment
    from kalign_tpu.core import io as kio

    rows = align(["ACDEFGHIK", "ACDEFGIK", "CDEFGHIK"],
                 names=["a", "b", "c"])
    out = tmp_path / "x.sto"
    write_alignment(rows, str(out), fmt="stockholm", names=["a", "b", "c"])
    m = kio.read_alignment(str(out))
    if m.aligned == 2:
        m.finalise()
    assert m.aligned_rows() == rows
