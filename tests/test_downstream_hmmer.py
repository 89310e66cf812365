"""Tests for the downstream detection suite's real-hmmer hook.

hmmer is optional (not in this image), so the subprocess plumbing +
tblout parsing are tested against MOCK hmmbuild/hmmsearch binaries that
emit real-format output; the pssm fallback is asserted when hmmer is
absent.  If real hmmer is ever on PATH, the auto backend test exercises
it directly.
"""

import os
import stat
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from benchmarks.downstream.detection import (detection_auc,        # noqa: E402
                                             hmmer_available)

TRAIN = ["MKVLITAAGG", "MKVLITTAGG", "MKVLI-TAGG"]
TEST = ["MKVLITAAGG", "MKVLITTAGA"]


def _write_mock_hmmer(bindir):
    """hmmbuild: touch the hmm file; hmmsearch: emit a tblout giving
    every q<i> with even i a high bit score (odd ones unreported =
    floor)."""
    hb = os.path.join(bindir, "hmmbuild")
    with open(hb, "w") as fh:
        fh.write("#!/bin/bash\n"
                 "# args: [--amino] out.hmm in.afa\n"
                 "touch \"${@: -2:1}\"\n")
    hs = os.path.join(bindir, "hmmsearch")
    with open(hs, "w") as fh:
        fh.write(r"""#!/bin/bash
# args: --tblout TBL --max -E 1000000 HMM DB
tbl=$2
db=${@: -1}
{
echo '#                                                               --- full sequence ---- --- best 1 domain ---- --- domain number estimation ----'
echo '# target name        accession  query name           accession    E-value  score  bias   E-value  score  bias   exp reg clu  ov env dom rep inc description of target'
echo '#------------------- ---------- -------------------- ---------- --------- ------ ----- --------- ------ ----- ---- --- --- --- --- --- --- --- ---------------------'
i=0
grep '^>' "$db" | while read line; do
  name=${line#>}
  if [ $((i % 2)) -eq 0 ]; then
    echo "$name -          prof                 -            1.2e-30  $((100 - i)).5   0.1   1.4e-30  100.1   0.1   1.0   1   0   0   1   1   1   1 -"
  fi
  i=$((i+1))
done
} > "$tbl"
""")
    for p in (hb, hs):
        os.chmod(p, os.stat(p).st_mode | stat.S_IEXEC)


def test_mock_hmmer_backend(tmp_path, monkeypatch):
    _write_mock_hmmer(str(tmp_path))
    monkeypatch.setenv("PATH", f"{tmp_path}:{os.environ['PATH']}")
    monkeypatch.delenv("KALIGN_DOWNSTREAM_NO_HMMER", raising=False)
    assert hmmer_available()
    r = detection_auc(TRAIN, TEST, rng=np.random.default_rng(0),
                      backend="auto")
    assert r["backend"] == "hmmer"
    # mock scores: q0 (pos) and q2, q4 (decoys) hit; AUC well-defined
    assert 0.0 <= r["auc"] <= 1.0
    assert r["n_pos"] == 2 and r["n_neg"] == 4


def test_pssm_fallback_when_hmmer_missing(monkeypatch):
    monkeypatch.setenv("KALIGN_DOWNSTREAM_NO_HMMER", "1")
    assert not hmmer_available()
    r = detection_auc(TRAIN, TEST, rng=np.random.default_rng(0),
                      backend="auto")
    assert r["backend"] == "pssm"
    assert 0.0 <= r["auc"] <= 1.0


def test_hmmer_floor_for_missing_hits(tmp_path, monkeypatch):
    """Sequences hmmsearch does not report must rank below every
    reported hit (floor score), not crash or default to 0 above
    negative hits."""
    _write_mock_hmmer(str(tmp_path))
    monkeypatch.setenv("PATH", f"{tmp_path}:{os.environ['PATH']}")
    monkeypatch.delenv("KALIGN_DOWNSTREAM_NO_HMMER", raising=False)
    from benchmarks.downstream.detection import _hmmer_scores
    scores = _hmmer_scores(TRAIN, ["MKVLITAAGG"] * 5)
    reported = [s for i, s in enumerate(scores) if i % 2 == 0]
    missing = [s for i, s in enumerate(scores) if i % 2 == 1]
    assert min(reported) > max(missing)
