"""Multi-host initialization + run-sharding helpers.

The reference is single-node shared-memory (OpenMP); scaling beyond one
host here means:

  * `init_distributed()` — `jax.distributed.initialize` wrapper; after
    it, `jax.devices()` spans the pod slice and `make_mesh()` builds a
    global mesh (ICI within hosts/slices, DCN across).
  * distance matrix — shard the sequence axis over the global mesh
    (parallel.mesh.sharded_anchor_distances); XLA all-gathers the
    [N, K] result (DCN traffic is N*K*4 bytes — trivial).
  * ensemble — runs are embarrassingly parallel: `my_ensemble_runs`
    partitions run indices across processes; each host aligns its runs
    and POAR tables merge by summing support masks (bitwise OR) on one
    host (the tables are host-side data).
"""

from typing import List, Optional

import jax


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX.  No-op when running single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def my_ensemble_runs(n_runs: int, process_id: Optional[int] = None,
                     num_processes: Optional[int] = None) -> List[int]:
    """Static partition of ensemble run indices across processes."""
    pid = jax.process_index() if process_id is None else process_id
    np_ = jax.process_count() if num_processes is None else num_processes
    return [k for k in range(n_runs) if k % np_ == pid]


def merge_poar_tables(tables):
    """OR-merge per-run POAR support masks gathered from all hosts."""
    import numpy as np
    base = tables[0]
    for other in tables[1:]:
        assert other.numseq == base.numseq
        for p in range(base.n_pairs):
            if len(other.keys[p]) == 0:
                continue
            if len(base.keys[p]) == 0:
                base.keys[p] = other.keys[p].copy()
                base.masks[p] = other.masks[p].copy()
                continue
            merged = np.union1d(base.keys[p], other.keys[p])
            mm = np.zeros(len(merged), dtype=np.uint32)
            mm[np.searchsorted(merged, base.keys[p])] |= base.masks[p]
            idx = np.searchsorted(merged, other.keys[p])
            mm[idx] |= other.masks[p]
            base.keys[p] = merged
            base.masks[p] = mm
        base.n_alignments = max(base.n_alignments, other.n_alignments)
    base._support = [None] * base.n_pairs
    return base
