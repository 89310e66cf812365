"""Parity for API-only features that the reference CLI cannot reach:
inline refinement, sequence-weight pseudocounts, distance scaling and
explicit VSM — driven through the locally built reference SHARED
LIBRARY (kalign_run_seeded) and compared byte-for-byte against both
exact engines.  Reference: lib/include/kalign/kalign.h:28-57."""

import ctypes
import os

import pytest

from kalign_tpu.core import io as kio
from kalign_tpu.core import params as P
from kalign_tpu import engine as E

from conftest import DATA

_REFLIB = os.path.join(os.path.dirname(DATA), "..", ".refbuild", "lib",
                       "libkalign.so")

_REF_TYPE_UNDEFINED = 8          # reference kalign.h enum (differs from ours)


def _ref_align(infile, outfile, refine=0, dist_scale=0.0, vsm_amax=-1.0,
               use_seq_weights=-1.0, consistency=5):
    lib = ctypes.CDLL(_REFLIB)
    c = ctypes
    lib.kalign_read_input.argtypes = [c.c_char_p, c.POINTER(c.c_void_p),
                                      c.c_int]
    lib.kalign_run_seeded.argtypes = [
        c.c_void_p, c.c_int, c.c_int, c.c_float, c.c_float, c.c_float,
        c.c_int, c.c_int, c.c_uint64, c.c_float, c.c_float, c.c_float,
        c.c_float, c.c_int, c.c_float]
    lib.kalign_write_msa.argtypes = [c.c_void_p, c.c_char_p, c.c_char_p]
    msa = c.c_void_p()
    assert lib.kalign_read_input(infile.encode(), c.byref(msa), 1) == 0
    rc = lib.kalign_run_seeded(
        msa, 1, _REF_TYPE_UNDEFINED, -1.0, -1.0, -1.0, refine, 0,
        0, 0.0, dist_scale, vsm_amax, use_seq_weights, consistency, 2.0)
    assert rc == 0
    assert lib.kalign_write_msa(msa, outfile.encode(), b"fasta") == 0
    lib.kalign_free_msa(msa)
    return open(outfile).read()


CASES = [
    ("inline-refine", dict(refine=P.REFINE_INLINE), dict(refine=3)),
    ("seq-weights", dict(use_seq_weights=1.0), dict(use_seq_weights=1.0)),
    ("dist-scale", dict(dist_scale=1.0), dict(dist_scale=1.0)),
    ("vsm", dict(vsm_amax=3.0), dict(vsm_amax=3.0)),
    ("weights+inline", dict(use_seq_weights=1.0, refine=P.REFINE_INLINE),
     dict(use_seq_weights=1.0, refine=3)),
]


@pytest.mark.skipif(not os.path.exists(_REFLIB),
                    reason="reference library not built (.refbuild)")
@pytest.mark.parametrize("name,ours,ref", CASES, ids=[c[0] for c in CASES])
def test_api_only_features_match_reference_lib(tmp_path, name, ours, ref):
    inp = os.path.join(DATA, "small.fa")
    want = _ref_align(inp, str(tmp_path / "ref.afa"), **ref)
    for engine in ("host", "tpu"):
        msa = kio.read_inputs([inp])
        msa.quiet = True
        got = kio.write_fasta(E.align_msa(msa, consistency_anchors=5,
                                          engine=engine, **ours))
        assert got == want, f"{name} diverged (engine={engine})"
