"""End-to-end parity: our pipeline must produce byte-identical FASTA to
reference kalign (golden outputs committed under tests/golden, generated
by the reference binary v3.5.1)."""

import os

import pytest

from kalign_tpu.core import io as kio
from kalign_tpu.core import params as P
from kalign_tpu import engine as E

from conftest import DATA, GOLDEN

CASES = [
    # (input, golden, kwargs)
    ("tiny.fa", "tiny.fast.afa", dict(consistency_anchors=0)),
    ("tiny.fa", "tiny.default.afa", dict(consistency_anchors=5)),
    ("small.fa", "small.fast.afa", dict(consistency_anchors=0)),
    ("small.fa", "small.default.afa", dict(consistency_anchors=5)),
    ("small.fa", "small.refall.afa", dict(consistency_anchors=5, refine=P.REFINE_ALL)),
    ("BB11001.tfa", "BB11001.default.afa", dict(consistency_anchors=5)),
    ("BB11001.tfa", "BB11001.refconf.afa",
     dict(consistency_anchors=5, refine=P.REFINE_CONFIDENT)),
    ("BB12006.tfa", "BB12006.default.afa", dict(consistency_anchors=5)),
    ("BB30014.tfa", "BB30014.default.afa", dict(consistency_anchors=5)),
    ("big_prot.fa", "big_prot.default.afa", dict(consistency_anchors=5)),
    ("big_prot.fa", "big_prot.realign.afa",
     dict(consistency_anchors=5, realign=1)),
    ("big_dna.fa", "big_dna.default.afa", dict(consistency_anchors=5)),
    ("big_dna.fa", "big_dna.rna.afa",
     dict(consistency_anchors=5, type_=P.KALIGN_TYPE_RNA)),
    ("small.fa", "small.gpo12.afa",
     dict(consistency_anchors=5, gpo=12.0, gpe=2.0, tgpe=1.5)),
    ("small.fa", "small.pfasum60.afa",
     dict(consistency_anchors=5, type_=P.KALIGN_TYPE_PROTEIN_PFASUM60)),
    ("big_dna.fa", "big_dna.fast.afa", dict(consistency_anchors=0)),
]


@pytest.mark.parametrize("inp,gold,kw", CASES, ids=[c[1] for c in CASES])
def test_column_identical(inp, gold, kw):
    msa = kio.read_inputs([os.path.join(DATA, inp)])
    msa = E.align_msa(msa, **kw)
    out = kio.write_fasta(msa)
    ref = open(os.path.join(GOLDEN, gold)).read()
    assert out == ref


# The bit-exact device engine (engine="tpu": native orchestration, all
# Hirschberg DP via the tpu/exact.py segmented wavefront) must hit the
# same byte-parity bar.  The four large cases take 70-150 s each on the
# CPU test backend and run under -m slow (all 16 verified identical).
_TPU_QUICK = CASES[:9] + CASES[13:15]   # + custom penalties / PFASUM60
_TPU_LARGE = CASES[9:13] + CASES[15:]


@pytest.mark.parametrize("inp,gold,kw", _TPU_QUICK,
                         ids=[c[1] for c in _TPU_QUICK])
def test_column_identical_tpu_engine(inp, gold, kw):
    msa = kio.read_inputs([os.path.join(DATA, inp)])
    msa = E.align_msa(msa, engine="tpu", **kw)
    out = kio.write_fasta(msa)
    ref = open(os.path.join(GOLDEN, gold)).read()
    assert out == ref


@pytest.mark.slow
@pytest.mark.parametrize("inp,gold,kw", _TPU_LARGE,
                         ids=[c[1] for c in _TPU_LARGE])
def test_column_identical_tpu_engine_large(inp, gold, kw):
    msa = kio.read_inputs([os.path.join(DATA, inp)])
    msa = E.align_msa(msa, engine="tpu", **kw)
    out = kio.write_fasta(msa)
    ref = open(os.path.join(GOLDEN, gold)).read()
    assert out == ref


def test_msf_input_matches_fasta_input():
    a = kio.read_inputs([os.path.join(DATA, "BB11001.tfa")])
    b = kio.read_inputs([os.path.join(DATA, "BB11001.msf")])
    ra = E.align_msa(a, consistency_anchors=5).aligned_rows()
    rb = E.align_msa(b, consistency_anchors=5).aligned_rows()
    assert ra == rb


def test_msf_writer_golden():
    """MSF writer vs the reference binary's output; the header embeds
    the output filename and the generation timestamp, so the date field
    is normalized on both sides before comparing."""
    import re

    msa = kio.read_inputs([os.path.join(DATA, "BB11001.tfa")])
    msa = E.align_msa(msa, consistency_anchors=5)
    out = kio.write_msf(msa, outfile="BB11001.default.msf")
    ref = open(os.path.join(GOLDEN, "BB11001.default.msf")).read()
    strip = lambda s: re.sub(
        r"[A-Z][a-z]+ \d+, \d{4} +\d{2}:\d{2}", "<date>", s)
    assert strip(out) == strip(ref)


def test_clu_writer_golden():
    msa = kio.read_inputs([os.path.join(DATA, "BB11001.tfa")])
    msa = E.align_msa(msa, consistency_anchors=5)
    out = kio.write_clu(msa)
    ref = open(os.path.join(GOLDEN, "BB11001.default.clu")).read()
    assert out == ref


def test_alignment_invariants():
    """Reference api-test invariants (tests/kalign_api_test.c:60-92):
    equal row lengths, residues preserved."""
    msa = kio.read_inputs([os.path.join(DATA, "small.fa")])
    originals = {sq.name: sq.seq for sq in msa.sequences}
    msa = E.align_msa(msa, consistency_anchors=5)
    rows = msa.aligned_rows()
    assert len(set(len(r) for r in rows)) == 1
    assert len(rows[0]) > 0
    for sq in msa.sequences:
        assert sq.seq.replace("-", "") == originals[sq.name]


@pytest.mark.slow
def test_precise_ensemble_byte_parity_tpu_engine():
    """--precise (3-run ensemble + realign) byte-parity with the
    reference binary THROUGH the bit-exact device engine: every DP of
    every ensemble run goes over the accelerator hook."""
    from kalign_tpu.ensemble import ensemble_align

    msa = kio.read_inputs([os.path.join(DATA, "small.fa")])
    msa.quiet = True
    out = ensemble_align(msa, n_runs=3, realign=1, consistency_anchors=5,
                         engine="tpu")
    ref = open(os.path.join(GOLDEN, "small.precise.afa")).read()
    assert kio.write_fasta(out) == ref


_REFBIN = os.path.join(os.path.dirname(DATA), "..", ".refbuild", "src",
                       "kalign")


@pytest.mark.skipif(not os.path.exists(_REFBIN),
                    reason="reference binary not built (.refbuild)")
@pytest.mark.parametrize("dna,n_seq,length,seed", [
    (False, 24, 180, 71), (True, 20, 240, 72), (False, 40, 120, 73),
])
def test_fresh_input_matches_reference_binary(tmp_path, dna, n_seq,
                                              length, seed):
    """Anti-overfitting guard: parity on inputs that are NOT part of
    the committed golden set — simulated families aligned by the
    locally built reference binary vs both exact engines."""
    import subprocess

    from kalign_tpu.dssim import generate_test_sequences

    seqs, names = generate_test_sequences(n_seq, 10, dna, length,
                                          seed=seed)
    inp = tmp_path / "in.fa"
    inp.write_text("".join(f">{n}\n{s}\n" for n, s in zip(names, seqs)))
    ref_out = tmp_path / "ref.afa"
    r = subprocess.run([_REFBIN, "-i", str(inp), "-o", str(ref_out),
                        "-q"], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-500:]
    ref = ref_out.read_text()

    for engine in ("host", "tpu"):
        msa = kio.read_inputs([str(inp)])
        msa.quiet = True
        out = kio.write_fasta(E.align_msa(msa, consistency_anchors=5,
                                          engine=engine))
        assert out == ref, f"engine={engine} diverged on fresh input"


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(_REFBIN),
                    reason="reference binary not built (.refbuild)")
@pytest.mark.parametrize("flags,kw", [
    (["--fast"], dict(consistency_anchors=0)),
    (["--refine", "all"], dict(consistency_anchors=5, refine=1)),
    (["--refine", "confident"], dict(consistency_anchors=5, refine=2)),
    (["--realign", "1"], dict(consistency_anchors=5, realign=1)),
    (["--type", "divergent"], dict(consistency_anchors=5, type_=5)),
], ids=["fast", "refall", "refconf", "realign", "divergent"])
def test_fresh_input_mode_surface_vs_reference(tmp_path, flags, kw):
    """Mode-surface parity on a non-committed input: the reference
    binary with CLI flags vs align_msa through both exact engines."""
    import subprocess

    from kalign_tpu.dssim import generate_test_sequences

    seqs, names = generate_test_sequences(16, 10, False, 150, seed=99)
    inp = tmp_path / "in.fa"
    inp.write_text("".join(f">{n}\n{s}\n" for n, s in zip(names, seqs)))
    ref_out = tmp_path / "ref.afa"
    r = subprocess.run([_REFBIN, "-i", str(inp), "-o", str(ref_out),
                        "-q"] + flags, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-500:]
    ref = ref_out.read_text()

    for engine in ("host", "tpu"):
        msa = kio.read_inputs([str(inp)])
        msa.quiet = True
        out = kio.write_fasta(E.align_msa(msa, engine=engine, **kw))
        assert out == ref, f"engine={engine} diverged ({flags})"
