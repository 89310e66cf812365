"""CLI-level tests (mirrors the intent of the reference's
tests/python/test_cli.py and the kalign_itest_* integration targets):
drive kalign_tpu.cli.main / reformat.main in-process and check outputs,
exit codes, and flag handling."""

import os

import pytest

from kalign_tpu import cli
from kalign_tpu import reformat

from conftest import DATA, GOLDEN


def _run(argv, capsys=None):
    rc = cli.main(argv)
    return rc


def test_cli_default_alignment_matches_golden(tmp_path):
    out = tmp_path / "out.afa"
    rc = _run(["-i", os.path.join(DATA, "small.fa"), "-o", str(out), "-q"])
    assert rc == 0
    assert out.read_text() == open(
        os.path.join(GOLDEN, "small.default.afa")).read()


def test_cli_fast_mode(tmp_path):
    out = tmp_path / "out.afa"
    rc = _run(["-i", os.path.join(DATA, "small.fa"), "-o", str(out),
               "--fast", "-q"])
    assert rc == 0
    assert out.read_text() == open(
        os.path.join(GOLDEN, "small.fast.afa")).read()


def test_cli_positional_input_and_formats(tmp_path):
    out_clu = tmp_path / "out.clu"
    rc = _run([os.path.join(DATA, "BB11001.tfa"), "-o", str(out_clu),
               "-f", "clu", "-q"])
    assert rc == 0
    assert out_clu.read_text() == open(
        os.path.join(GOLDEN, "BB11001.default.clu")).read()


def test_cli_msf_output_readable_back(tmp_path):
    from kalign_tpu.core import io as kio
    out = tmp_path / "out.msf"
    rc = _run(["-i", os.path.join(DATA, "small.fa"), "-o", str(out),
               "-f", "msf", "-q"])
    assert rc == 0
    back = kio.read_alignment(str(out))
    ref = kio.read_alignment(os.path.join(GOLDEN, "small.default.afa"))
    if back.aligned == 2:
        back.finalise()
    if ref.aligned == 2:
        ref.finalise()
    assert back.aligned_rows() == ref.aligned_rows()


def test_cli_stdin(tmp_path, monkeypatch):
    import io as _io
    import sys
    data = open(os.path.join(DATA, "small.fa")).read()
    monkeypatch.setattr(sys, "stdin", _io.StringIO(data))
    out = tmp_path / "out.afa"
    rc = _run(["-i", "-", "-o", str(out), "-q"])
    assert rc == 0
    assert out.read_text() == open(
        os.path.join(GOLDEN, "small.default.afa")).read()


def test_cli_multiple_inputs_merge(tmp_path):
    # split small.fa into two files; merged alignment must equal whole
    src = open(os.path.join(DATA, "small.fa")).read()
    recs = ["&gt;" + r if False else ">" + r
            for r in src.split(">") if r.strip()]
    half = len(recs) // 2
    f1 = tmp_path / "a.fa"
    f2 = tmp_path / "b.fa"
    f1.write_text("".join(recs[:half]))
    f2.write_text("".join(recs[half:]))
    out = tmp_path / "out.afa"
    rc = _run(["-i", str(f1), "-i", str(f2), "-o", str(out), "-q"])
    assert rc == 0
    assert out.read_text() == open(
        os.path.join(GOLDEN, "small.default.afa")).read()


def test_cli_version(capsys):
    rc = _run(["--version"])
    assert rc == 0
    assert "kalign" in capsys.readouterr().out


def test_cli_showw(capsys):
    rc = _run(["--showw"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Disclaimer of Warranty" in out
    assert "WITHOUT WARRANTIES OR CONDITIONS" in out


def test_cli_set_flag_parses(tmp_path):
    # --set is parsed for reference compatibility (run_kalign.c:158)
    # and has no effect on output
    out = tmp_path / "out.afa"
    rc = _run(["-i", os.path.join(DATA, "small.fa"), "-o", str(out),
               "--set", "3", "-q"])
    assert rc == 0
    assert out.read_text() == open(
        os.path.join(GOLDEN, "small.default.afa")).read()


def test_cli_no_input_prints_help(capsys):
    rc = _run([])
    assert rc == 0
    assert "No input files" in capsys.readouterr().err


def test_cli_missing_file_errors(tmp_path):
    with pytest.raises((SystemExit, FileNotFoundError, OSError)):
        _run(["-i", str(tmp_path / "nope.fa"), "-o",
              str(tmp_path / "o.afa"), "-q"])


def test_cli_bad_type_errors():
    with pytest.raises(SystemExit):
        _run(["-i", os.path.join(DATA, "small.fa"), "--type", "martian"])


def test_cli_refine_and_realign(tmp_path):
    out = tmp_path / "out.afa"
    rc = _run(["-i", os.path.join(DATA, "small.fa"), "-o", str(out),
               "--refine", "all", "-q"])
    assert rc == 0
    assert out.read_text() == open(
        os.path.join(GOLDEN, "small.refall.afa")).read()


def test_reformat_rename_and_back(tmp_path):
    out = tmp_path / "renamed.afa"
    rc = reformat.main(["-i", os.path.join(GOLDEN, "small.default.afa"),
                        "-o", str(out), "--rename"])
    assert rc == 0
    txt = out.read_text()
    assert ">SEQ1" in txt and ">SEQ" + str(txt.count(">")) in txt


def test_reformat_unalign(tmp_path):
    from kalign_tpu.core import io as kio
    out = tmp_path / "un.fa"
    rc = reformat.main(["-i", os.path.join(GOLDEN, "small.default.afa"),
                        "-o", str(out), "--unalign"])
    assert rc == 0
    assert "-" not in "".join(
        l for l in out.read_text().splitlines() if not l.startswith(">"))
    orig = kio.read_alignment(os.path.join(GOLDEN, "small.default.afa"))
    if orig.aligned == 2:
        orig.finalise()
    ung = {s.name: s.seq.replace("-", "") for s in orig.sequences}
    back = kio.read_alignment(str(out))
    got = {s.name: s.seq for s in back.sequences}
    assert got == ung


def test_reformat_format_conversion(tmp_path):
    from kalign_tpu.core import io as kio
    out = tmp_path / "o.clu"
    rc = reformat.main(["-i", os.path.join(GOLDEN, "BB11001.default.afa"),
                        "-o", str(out), "-f", "clu"])
    assert rc == 0
    back = kio.read_alignment(str(out))
    if back.aligned == 2:
        back.finalise()
    ref = kio.read_alignment(os.path.join(GOLDEN, "BB11001.default.afa"))
    if ref.aligned == 2:
        ref.finalise()
    assert back.aligned_rows() == ref.aligned_rows()


def test_reformat_no_input_fails():
    assert reformat.main([]) == 1
