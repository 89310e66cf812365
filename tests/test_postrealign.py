"""kalign_post_realign parity (kalign.h:73, aln_wrap.c:539-669).

Goldens generated with the reference library's kalign_post_realign via
ctypes (type=UNDEFINED, defaults otherwise; see the flags encoded in
the file names).
"""

import os

import pytest

from kalign_tpu.core import io as kio
from kalign_tpu.core import params as P
from kalign_tpu import engine as E

from conftest import GOLDEN


def test_post_realign_parity_default():
    msa = kio.read_alignment(os.path.join(GOLDEN, "small.default.afa"))
    msa = E.post_realign_msa(msa)
    out = kio.write_fasta(msa)
    gold = open(os.path.join(GOLDEN, "small.postrealign.afa")).read()
    assert out == gold


def test_post_realign_parity_refine_confident_2iters():
    msa = kio.read_alignment(os.path.join(GOLDEN, "BB11001.default.afa"))
    msa = E.post_realign_msa(msa, refine=P.REFINE_CONFIDENT,
                             realign_iterations=2)
    out = kio.write_fasta(msa)
    gold = open(os.path.join(GOLDEN, "BB11001.postrealign2.afa")).read()
    assert out == gold


def test_post_realign_requires_alignment():
    from kalign_tpu.core.msa import Msa
    msa = Msa.from_sequences(["ACDEF", "ACDE", "ACDF"])
    with pytest.raises(ValueError):
        E.post_realign_msa(msa)
    msa2 = kio.read_alignment(os.path.join(GOLDEN, "small.default.afa"))
    with pytest.raises(ValueError):
        E.post_realign_msa(msa2, realign_iterations=0)


def test_post_realign_api_wrapper(tmp_path):
    import kalign_tpu
    out = tmp_path / "out.afa"
    msa = kalign_tpu.post_realign(
        os.path.join(GOLDEN, "small.default.afa"), str(out))
    assert msa.aligned == 3
    gold = open(os.path.join(GOLDEN, "small.postrealign.afa")).read()
    assert out.read_text() == gold


def test_post_realign_preserves_residues():
    msa = kio.read_alignment(os.path.join(GOLDEN, "BB11001.default.afa"))
    before = sorted((s.name, s.seq.replace("-", "")) for s in msa.sequences)
    msa = E.post_realign_msa(msa)
    after = sorted((s.name, s.seq.replace("-", "")) for s in msa.sequences)
    assert before == after
    rows = msa.aligned_rows()
    assert len({len(r) for r in rows}) == 1
