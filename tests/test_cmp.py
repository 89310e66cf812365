"""Comparison metric tests (values cross-checked against the reference
library's kalign_msa_compare / kalign_msa_compare_detailed)."""

import os
from kalign_tpu.core import io as kio
from kalign_tpu.core.cmp import msa_compare, msa_compare_detailed
from conftest import DATA, GOLDEN


def _rows(path):
    m = kio.read_alignment(path)
    if m.aligned == 2:
        m.finalise()
    return [sq.seq for sq in m.sequences], [sq.name for sq in m.sequences]


def test_self_compare_is_100():
    r, n = _rows(os.path.join(GOLDEN, "BB11001.default.afa"))
    assert abs(msa_compare(r, r, n, n) - 100.0) < 1e-9
    d = msa_compare_detailed(r, r, n, n, 0.2)
    assert d.recall == 1.0 and d.precision == 1.0 and d.tc == 1.0


def test_compare_values_vs_reference():
    # reference values computed with libkalign kalign_msa_compare*
    ra, na = _rows(os.path.join(GOLDEN, "small.default.afa"))
    rb, nb = _rows(os.path.join(GOLDEN, "small.fast.afa"))
    sp = msa_compare(ra, rb, na, nb)
    assert abs(sp - 81.710121) < 1e-3
    d = msa_compare_detailed(ra, rb, na, nb, 0.2)
    assert abs(d.recall - 0.909639) < 1e-5
    assert abs(d.precision - 0.828335) < 1e-5
    assert abs(d.f1 - 0.867085) < 1e-5
    assert abs(d.tc - 0.800000) < 1e-5


def test_compare_with_mask_vs_reference():
    """kalign_msa_compare_with_mask differential (msa_cmp.c:449-480):
    expected tuples computed with the reference library via ctypes."""
    import numpy as np
    import kalign_tpu
    ref = os.path.join(DATA, "BB11001.msf")
    test = os.path.join(GOLDEN, "BB11001.default.afa")
    rrows, _ = _rows(ref)
    alnlen = len(rrows[0])

    mask = np.array([1 if i % 3 == 0 else 0 for i in range(alnlen)])
    d = kalign_tpu.compare_with_mask(ref, test, mask)
    assert abs(d.recall - 0.9216867469879518) < 1e-12
    assert abs(d.precision - 0.9318181818181818) < 1e-12
    assert abs(d.f1 - 0.9267247747082287) < 1e-12
    assert abs(d.tc - 0.8333333333333334) < 1e-12
    assert (d.ref_pairs, d.test_pairs, d.common) == (332, 968, 306)

    mask = np.array([1] * (alnlen // 2) + [0] * (alnlen - alnlen // 2))
    d = kalign_tpu.compare_with_mask(ref, test, mask)
    assert abs(d.recall - 0.9367088607594937) < 1e-12
    assert abs(d.precision - 0.9318181818181818) < 1e-12
    assert abs(d.tc - 0.8837209302325582) < 1e-12
    assert (d.ref_pairs, d.test_pairs, d.common) == (474, 968, 444)


def test_compare_with_mask_length_check():
    import pytest
    import kalign_tpu
    ref = os.path.join(DATA, "BB11001.msf")
    test = os.path.join(GOLDEN, "BB11001.default.afa")
    with pytest.raises(ValueError):
        kalign_tpu.compare_with_mask(ref, test, [1, 0, 1])
