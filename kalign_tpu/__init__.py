"""kalign_tpu — a TPU-native progressive multiple sequence alignment framework.

A from-scratch reimplementation of the capabilities of Kalign 3 (reference:
TimoLassmann/kalign v3.5.1), designed TPU-first:

  * pairwise distance estimation  -> batched bit-parallel Pallas kernel
  * guide-tree construction       -> on-device bisecting k-means over the
                                     distance embedding (UPGMA on host below
                                     the small-problem threshold)
  * progressive Gotoh alignment   -> row-sweep DP kernels where the in-row
                                     affine-gap dependency is a prefix-max
                                     scan (vectorizes on the VPU/MXU), driven
                                     by a meet-in-the-middle controller
  * ensemble / POAR consensus     -> data-parallel replicated runs merged
                                     via collectives

Two interchangeable engines implement the compute core:

  * ``kalign_tpu.host``  — exact host engine (NumPy + native C++ kernels)
    reproducing the reference's sequential float semantics bit-for-bit;
    used for parity testing and as the CPU fallback.
  * ``kalign_tpu.tpu``   — JAX/XLA/Pallas engine for TPU execution.

Public API mirrors the reference python-kalign package
(`/root/reference/python-kalign/__init__.py`).
"""

from kalign_tpu.version import __version__
from kalign_tpu import api
from kalign_tpu import io
from kalign_tpu import utils
from kalign_tpu.api import (
    align,
    align_from_file,
    align_file_to_file,
    compare,
    compare_detailed,
    write_alignment,
    read_alignment,
    generate_test_sequences,
    set_num_threads,
    get_num_threads,
    compare_with_mask,
    post_realign,
)

__all__ = [
    "__version__",
    "align",
    "align_from_file",
    "align_file_to_file",
    "compare",
    "compare_detailed",
    "compare_with_mask",
    "post_realign",
    "write_alignment",
    "read_alignment",
    "generate_test_sequences",
    "set_num_threads",
    "get_num_threads",
    "api",
    "io",
    "utils",
]
