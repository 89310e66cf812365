"""Downstream-impact benchmark suite.

Measures how alignment quality propagates into downstream analyses
(the reference ships a 7.5k-LoC equivalent: benchmarks/downstream/
{hmmer_detection,phylo_accuracy,positive_selection,calibration}.py).
Self-contained analogues that need no external tools:

  * phylo        — neighbor-joining trees from tool vs gold alignments,
                   compared by normalized Robinson-Foulds distance.
  * detection    — profile built from the tool's alignment of a
                   training split; ROC AUC separating held-out family
                   members from shuffled decoys.  Uses REAL hmmer
                   (hmmbuild/hmmsearch) when installed, a log-odds
                   PSSM stand-in otherwise (detection.py backends).
  * calibration  — ensemble per-column confidence vs actual column
                   correctness against simulated ground truth.

Run: python -m benchmarks.downstream [--engine host]
"""

from benchmarks.downstream.phylo import phylo_accuracy          # noqa: F401
from benchmarks.downstream.detection import detection_auc       # noqa: F401
from benchmarks.downstream.calibration import confidence_calibration  # noqa: F401
from benchmarks.downstream.selection import selection_detection        # noqa: F401
